package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.GraftFeather
import graft.sources.FeatherSnapshots

/** Read-side schema evolution on the feather connector: mergeSchema=true
  * unions every footer's fields and fills columns a file generation
  * predates with nulls; the default stays loud (a missing column in a
  * homogeneous table is corruption, not evolution). */
class FeatherSchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_feather_evo/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }

  /** Two file generations in one directory: gen1 (id, pay), gen2 adds
    * `lang`. Written via the part-writer so both land side by side. */
  private def writeTwoGens(path: String): Unit = {
    import spark.implicits._
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(path))
    GraftFeather.writeParts(
      (1 to 50).map(i => (i.toLong, s"p_$i")).toDF("id", "pay")
        .repartition(1), path, "gen1")
    GraftFeather.writeParts(
      (51 to 80).map(i => (i.toLong, s"p_$i", "en")).toDF("id", "pay", "lang")
        .repartition(1), path, "gen2")
  }

  test("default read of heterogeneous generations fails loudly by file") {
    val path = tmp("strict")
    writeTwoGens(path)
    val e = intercept[Exception] {
      // schema comes from whichever file sorts first (gen1); decoding the
      // gen2 projection against gen1 files (or vice versa on 'lang') dies
      spark.read.format("feather").load(path).select("lang").collect()
    }
    assert(e.getMessage != null)
  }

  test("mergeSchema unions generations and nulls the predating files") {
    val path = tmp("merge")
    writeTwoGens(path)
    val df = spark.read.format("feather")
      .option("mergeSchema", "true").load(path)
    assert(df.columns.toSeq === Seq("id", "pay", "lang"))
    assert(df.count() === 80)
    assert(df.where(col("lang").isNull).count() === 50)   // gen1 rows
    assert(df.where(col("lang") === "en").count() === 30) // gen2 rows
    assert(df.where(col("id") === 10L).select("pay").head().getString(0)
      === "p_10")
  }

  test("projecting only common columns reads both generations fine") {
    val path = tmp("common")
    writeTwoGens(path)
    val df = spark.read.format("feather")
      .option("mergeSchema", "true").load(path)
      .select("id", "pay")
    assert(df.count() === 80)
    assert(df.agg(sum("id")).head().getLong(0) === (1L to 80L).sum)
  }

  test("a type conflict across generations fails loudly naming both files") {
    val path = tmp("conflict")
    import spark.implicits._
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(path))
    GraftFeather.writeParts(
      Seq((1L, 5L)).toDF("id", "v").repartition(1), path, "gen1")
    GraftFeather.writeParts(
      Seq((2L, "five")).toDF("id", "v").repartition(1), path, "gen2")
    val e = intercept[Exception] {
      spark.read.format("feather").option("mergeSchema", "true").load(path)
        .collect()
    }
    assert(e.getMessage.contains("'v'"))
  }

  test("snapshotted evolution: new-generation append + time travel") {
    val path = tmp("snap_evo")
    import spark.implicits._
    (1 to 40).map(i => (i.toLong, s"p_$i")).toDF("id", "pay")
      .repartition(1).write.format("feather").mode("overwrite")
      .option("snapshots", "true").save(path)
    // the evolved generation lands as parts + one append manifest commit
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parts = GraftFeather.writeParts(
      (41 to 60).map(i => (i.toLong, s"p_$i", "de")).toDF("id", "pay", "lang")
        .repartition(1), path, "gen2")
    FeatherSnapshots.commit(fs, new Path(path), "append") { parent =>
      parent ++ parts.map { case (n, len, _) => (n, len) }
    }
    val df = spark.read.format("feather")
      .option("mergeSchema", "true").load(path)
    assert(df.columns.toSeq === Seq("id", "pay", "lang"))
    assert(df.count() === 60)
    assert(df.where(col("lang") === "de").count() === 20)
    // v1 still reads with its own (pre-evolution) schema
    val v1 = spark.read.format("feather")
      .option("versionAsOf", "1").load(path)
    assert(v1.columns.toSeq === Seq("id", "pay"))
    assert(v1.count() === 40)
  }

  test("compacting heterogeneous generations keeps evolved columns") {
    val path = tmp("compact_evo")
    writeTwoGens(path)
    val r = graft.io.FeatherCompact.compact(spark, path,
      targetBytes = 1L << 30)
    assert(r.filesAfter < r.filesBefore, s"no-op: $r")
    // post-compaction the leaf is homogeneous on the UNION schema —
    // a strict read sees all three columns
    val df = spark.read.format("feather").load(path)
    assert(df.columns.toSeq === Seq("id", "pay", "lang"))
    assert(df.count() === 80)
    assert(df.where(col("lang").isNull).count() === 50)
    assert(df.where(col("lang") === "en").count() === 30)
  }

  test("streaming read honors mergeSchema across generations") {
    val path = tmp("stream_evo")
    import spark.implicits._
    (1 to 20).map(i => (i.toLong, s"p_$i")).toDF("id", "pay")
      .repartition(1).write.format("feather").mode("overwrite")
      .option("snapshots", "true").save(path)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parts = GraftFeather.writeParts(
      (21 to 30).map(i => (i.toLong, s"p_$i", "fr")).toDF("id", "pay", "lang")
        .repartition(1), path, "gen2")
    FeatherSnapshots.commit(fs, new Path(path), "append") { parent =>
      parent ++ parts.map { case (n, len, _) => (n, len) }
    }
    val q = spark.readStream.format("feather")
      .option("mergeSchema", "true").load(path)
      .writeStream.format("memory").queryName("evo_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("evo_stream")
      assert(got.count() === 30)
      assert(got.where(col("lang").isNull).count() === 20)
      assert(got.where(col("lang") === "fr").count() === 10)
    } finally q.stop()
  }

  test("a column ANY generation declared nullable reads nullable merged") {
    val path = tmp("null_widen")
    import spark.implicits._
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(path))
    // gen1 declares v non-nullable; gen2 declares it nullable AND holds a
    // null. First-seen-footer nullability would stamp the merged schema
    // non-null over data containing nulls — codegen elides null checks
    // off the schema, so that is silent wrong results, not an error.
    GraftFeather.writeParts(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v").repartition(1), path, "gen1")
    GraftFeather.writeParts(
      Seq((3L, Option(30L)), (4L, Option.empty[Long])).toDF("id", "v")
        .repartition(1), path, "gen2")
    val df = spark.read.format("feather")
      .option("mergeSchema", "true").load(path)
    assert(df.schema("v").nullable,
      "a nullable generation must widen the merged schema")
    assert(df.count() === 4)
    assert(df.where(col("v").isNull).count() === 1)
    assert(df.where(col("v").isNotNull).agg(sum("v")).head().getLong(0) === 60L)
  }

}
