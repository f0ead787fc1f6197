package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.FeatherCompact

/** Small-file compaction over feather part directories: fewer files, the
  * same rows, regenerated skipping sidecars, untouched big files, per-leaf
  * independence under hive partitioning, and a crash-safe swap (manifest
  * recovery in both halves of the two-phase commit). */
class FeatherCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(n: String) =
    s"${sys.props("java.io.tmpdir")}/graft_feather_compact/$n"

  private def featherNames(path: String): Seq[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".feather") && !f.getName.startsWith("."))
      .map(_.getName).sorted.toSeq

  private def rows(path: String): Seq[(Long, String)] = {
    import spark.implicits._
    spark.read.format("feather").load(path)
      .select(col("id"), col("s")).as[(Long, String)]
      .collect().sorted.toSeq
  }

  private def writeSmallParts(path: String, n: Int, parts: Int): Unit = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"v_$i")).toDF("id", "s")
      .repartition(parts, col("id"))
      .write.format("feather").mode("overwrite").save(path)
  }

  test("many small parts compact into few; rows and skipping survive") {
    val path = tmp("basic")
    writeSmallParts(path, 5000, 24)
    val before = rows(path)
    assert(featherNames(path).size === 24)
    val r = FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r.filesBefore === 24)
    assert(r.filesAfter === 1, s"expected 1 compacted file, got $r")
    assert(r.groupsRewritten === 1)
    assert(rows(path) === before)
    // the compacted part regenerated its skipping sidecar
    val out = featherNames(path).head
    assert(new java.io.File(s"$path/$out.stats.json").exists())
    // ...and the skipping index still prunes on it
    val scan = spark.read.format("feather")
      .option("maxSplitBytes", "1").load(path)
    assert(scan.filter(col("id") > 4900L).count() === 100)
  }

  test("a second run is a no-op and big files are never rewritten") {
    val path = tmp("noop")
    writeSmallParts(path, 2000, 8)
    FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    val namesAfterFirst = featherNames(path)
    val r2 = FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r2.groupsRewritten === 0)
    assert(featherNames(path) === namesAfterFirst, "no-op run renamed files")
    // tiny target: every file is its own group -> nothing to rewrite
    val r3 = FeatherCompact.compact(spark, path, targetBytes = 1L)
    assert(r3.groupsRewritten === 0)
    assert(featherNames(path) === namesAfterFirst)
  }

  test("hive partition leaves compact independently and keep their rows") {
    import spark.implicits._
    val path = tmp("leaves")
    for (g <- Seq("a", "b")) {
      (1 to 1000).map(i => (i.toLong, s"${g}_$i")).toDF("id", "s")
        .repartition(6, col("id"))
        .write.format("feather").mode("overwrite").save(s"$path/grp=$g")
    }
    val before = spark.read.format("feather").load(path)
      .groupBy("grp").count().as[(String, Long)].collect().sorted.toSeq
    val r = FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r.leaves === 2)
    assert(r.filesAfter === 2, s"one compacted part per leaf, got $r")
    val after = spark.read.format("feather").load(path)
      .groupBy("grp").count().as[(String, Long)].collect().sorted.toSeq
    assert(after === before)
  }

  test("mixed codecs, batch sizes, and schema-only parts survive the rewrite") {
    import spark.implicits._
    val path = tmp("mixed")
    // three sink generations with different codecs/batch shapes — the drop
    // directory a long-lived pipeline really accumulates
    (1 to 700).map(i => (i.toLong, s"a_$i")).toDF("id", "s")
      .repartition(3, col("id")).write.format("feather")
      .option("codec", "lz4").option("batchSize", "64").mode("overwrite").save(path)
    (701 to 1400).map(i => (i.toLong, s"b_$i")).toDF("id", "s")
      .repartition(2, col("id")).write.format("feather")
      .option("codec", "zstd").option("batchSize", "1000").mode("append").save(path)
    (1401 to 1500).map(i => (i.toLong, s"c_$i")).toDF("id", "s")
      .repartition(4, col("id")).write.format("feather")
      .option("codec", "none").mode("append").save(path)
    // a schema-only part (what the sink writes for an empty frame)
    spark.emptyDataset[(Long, String)].toDF("id", "s")
      .repartition(1).write.format("feather").mode("append").save(path)
    val before = rows(path)
    assert(before.size === 1500)
    val r = FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(r.filesAfter === 1, s"$r")
    assert(rows(path) === before)
  }

  test("stale hidden tmps from killed writer tasks are vacuumed") {
    val path = tmp("vacuum")
    writeSmallParts(path, 500, 4)
    val before = rows(path)
    // a killed sink attempt and an orphan compact half-write, no manifest
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/.part-00009-attempt-42.feather.tmp"),
      Array[Byte](1))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/.compact-00007-cafebabe.feather.tmp"),
      Array[Byte](2))
    FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    val leftovers = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith(".") && f.getName.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"tmps not vacuumed: ${leftovers.mkString(", ")}")
    assert(rows(path) === before)
  }

  test("recovery completes a swap that crashed after the rename") {
    val path = tmp("recover_late")
    writeSmallParts(path, 500, 4)
    val before = rows(path)
    FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    val out = featherNames(path).head
    // fake the crash window: a leftover input the finished swap would have
    // deleted, plus the manifest that records it
    val leftover = "part-zzzzz.feather"
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$path/$out"),
      java.nio.file.Paths.get(s"$path/$leftover"))
    new java.io.File(s"$path/_compact").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_compact/$out.json"),
      s"""{"output":"$out","inputs":["$leftover"]}""".getBytes("UTF-8"))
    FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    assert(!new java.io.File(s"$path/$leftover").exists(),
      "recovery did not retire the leftover input")
    assert(!new java.io.File(s"$path/_compact/$out.json").exists())
    assert(rows(path) === before)
  }

  test("recovery discards a swap that crashed before the rename") {
    val path = tmp("recover_early")
    writeSmallParts(path, 500, 4)
    val before = rows(path)
    val namesBefore = featherNames(path)
    // manifest + half-written tmp, but no committed output
    val ghost = "compact-99999-deadbeef.feather"
    new java.io.File(s"$path/_compact").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_compact/$ghost.json"),
      s"""{"output":"$ghost","inputs":["${namesBefore.head}"]}""".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/.$ghost.tmp"), Array[Byte](1, 2, 3))
    val r = FeatherCompact.compact(spark, path, targetBytes = 1L << 30)
    // inputs were intact, so the normal pass compacts all 4 as usual
    assert(r.groupsRewritten === 1)
    assert(!new java.io.File(s"$path/.$ghost.tmp").exists())
    assert(!new java.io.File(s"$path/_compact/$ghost.json").exists())
    assert(rows(path) === before)
  }
}
