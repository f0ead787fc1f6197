package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.GraftAvro

/** DSv2 face of the Avro source (`format("graft-avro")` — short name
  * deliberately not "avro", so the official connector can't be shadowed
  * in deployments that ship it). */
class AvroSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String) = s"${sys.props("java.io.tmpdir")}/graft_avro_src/$n"

  private def writeSample(path: String, rows: Int = 4000): Unit = {
    import spark.implicits._
    val df = (1 to rows).map(i =>
      (i.toLong, s"name_$i", i * 0.5, if (i % 11 == 0) None else Some(s"t${i % 3}")))
      .toDF("id", "name", "v", "tag")
    GraftAvro.write(df.repartition(2), path, overwrite = true)
  }

  test("format(graft-avro).load resolves by short name and roundtrips") {
    val path = tmp("basic")
    writeSample(path)
    val df = spark.read.format("graft-avro").load(path)
    assert(df.schema.fieldNames.toSeq === Seq("id", "name", "v", "tag"))
    assert(df.count() === 4000)
    assert(df.filter(col("id") === 33L).head().getString(1) === "name_33")
  }

  test("Catalyst prunes conversion columns and count(*) decodes none") {
    val path = tmp("prune")
    writeSample(path)
    val df = spark.read.format("graft-avro").load(path).select("id", "v")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("struct<id:bigint,v:double>"),
      s"expected pruned ReadSchema:\n$plan")
    assert(df.agg(sum(col("v"))).head().getDouble(0) ===
      (1 to 4000).map(_ * 0.5).sum)
    // count(*) prunes to the EMPTY schema (Some(Nil) path) and must still
    // count every record
    assert(spark.read.format("graft-avro").load(path).count() === 4000)
  }

  test("byte-range splits engage through the connector") {
    val path = tmp("splits")
    writeSample(path, rows = 20000)
    val df = spark.read.format("graft-avro")
      .option("maxSplitBytes", (64 << 10).toString).load(path)
    assert(df.rdd.getNumPartitions > 2,
      s"expected >2 partitions, got ${df.rdd.getNumPartitions}")
    assert(df.count() === 20000)
    assert(df.agg(sum(col("id"))).head().getLong(0) ===
      (1 to 20000).map(_.toLong).sum)
  }

  test("df.write.format(graft-avro) appends and overwrites through BatchWrite") {
    import spark.implicits._
    val path = tmp("write_v2")
    val a = (1 to 250).map(i => (i.toLong, s"a_$i")).toDF("id", "s")
    val b = (251 to 300).map(i => (i.toLong, s"b_$i")).toDF("id", "s")
    a.write.format("graft-avro").mode("overwrite").save(path)
    assert(spark.read.format("graft-avro").load(path).count() === 250)
    b.write.format("graft-avro").mode("append").save(path)
    val both = spark.read.format("graft-avro").load(path)
    assert(both.count() === 300)
    assert(both.agg(sum(col("id"))).head().getLong(0) ===
      (1 to 300).map(_.toLong).sum)
    b.write.format("graft-avro").mode("overwrite")
      .option("codec", "deflate").save(path)
    assert(spark.read.format("graft-avro").load(path).count() === 50)
    // the non-DSv2 reader sees the same container files
    assert(GraftAvro.read(spark, path).count() === 50)
    // empty frame through the coordinated path: schema-only part
    a.filter(col("id") < 0).write.format("graft-avro")
      .mode("overwrite").save(path)
    val empty = spark.read.format("graft-avro").load(path)
    assert(empty.schema.fieldNames.toSeq === Seq("id", "s"))
    assert(empty.count() === 0)
  }

  test("readStream.format(graft-avro) ingests a drop directory exactly once") {
    import spark.implicits._
    val path = tmp("stream_drops")
    val ckpt = tmp("stream_ckpt")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Seq(path, ckpt).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    // batch 1 on disk before the stream starts (also feeds inferSchema)
    (1 to 100).map(i => (i.toLong, s"a_$i")).toDF("id", "s")
      .write.format("graft-avro").mode("overwrite").save(path)
    val q = spark.readStream.format("graft-avro").load(path)
      .writeStream.format("memory").queryName("avro_stream")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("avro_stream").count() === 100)
      // more files DROP in (append = new parts, rename commit) — the next
      // micro-batch picks up only the new ones
      (101 to 150).map(i => (i.toLong, s"b_$i")).toDF("id", "s")
        .write.format("graft-avro").mode("append").save(path)
      q.processAllAvailable()
      val got = spark.table("avro_stream")
      assert(got.count() === 150) // exactly once: no replay of batch 1
      assert(got.agg(sum(col("id"))).head().getLong(0) ===
        (1 to 150).map(_.toLong).sum)
      // a batch with no new files is empty, not a replay
      q.processAllAvailable()
      assert(spark.table("avro_stream").count() === 150)
    } finally q.stop()
  }

  test("a stream started on an empty directory picks up the first drops") {
    import spark.implicits._
    val path = tmp("stream_cold")
    val ckpt = tmp("stream_cold_ckpt")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Seq(path, ckpt).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    // no files yet: the user supplies the schema, and the stream's
    // expected Avro schema falls back to the table schema's mapping
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val q = spark.readStream.format("graft-avro").schema(st).load(path)
      .writeStream.format("memory").queryName("avro_cold")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("avro_cold").count() === 0)
      (1 to 40).map(i => (i.toLong, s"c_$i")).toDF("id", "s")
        .write.format("graft-avro").mode("append").save(path)
      q.processAllAvailable()
      assert(spark.table("avro_cold").count() === 40)
      assert(spark.table("avro_cold").agg(sum(col("id"))).head().getLong(0) ===
        (1 to 40).map(_.toLong).sum)
    } finally q.stop()
  }

  test("writeStream.format(graft-avro) lands epoch-committed atomic drops") {
    import spark.implicits._
    val src = tmp("sink_src")
    val out = tmp("sink_out")
    val ckpt = tmp("sink_ckpt")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Seq(src, out, ckpt).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    (1 to 80).map(i => (i.toLong, s"a_$i")).toDF("id", "s")
      .write.format("graft-avro").mode("overwrite").save(src)
    val q = spark.readStream.format("graft-avro").load(src)
      .writeStream.format("graft-avro").option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.read.format("graft-avro").load(out).count() === 80)
      (81 to 120).map(i => (i.toLong, s"b_$i")).toDF("id", "s")
        .write.format("graft-avro").mode("append").save(src)
      q.processAllAvailable()
      val got = spark.read.format("graft-avro").load(out)
      assert(got.count() === 120)
      assert(got.agg(sum(col("id"))).head().getLong(0) ===
        (1 to 120).map(_.toLong).sum)
      val parts = fs.listStatus(new org.apache.hadoop.fs.Path(out))
        .map(_.getPath.getName).filter(_.endsWith(".avro"))
      assert(parts.nonEmpty && parts.forall(_.startsWith("part-e")),
        parts.mkString(","))
    } finally q.stop()
  }

  test("hive-style partition directories discover, type, and prune") {
    import spark.implicits._
    val root = tmp("partitioned")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val leaves = Seq(("en", 1, 0L), ("en", 2, 100L), ("de", 1, 200L))
    leaves.foreach { case (lang, day, base) =>
      (1 to 10).map(i => (base + i, s"${lang}_$i"))
        .toDF("id", "s").repartition(1).write.format("graft-avro")
        .mode("overwrite").save(s"$root/lang=$lang/day=$day")
    }
    val df = spark.read.format("graft-avro").load(root)
    assert(df.schema.fieldNames.toSeq === Seq("id", "s", "lang", "day"))
    assert(df.schema("day").dataType === org.apache.spark.sql.types.LongType)
    assert(df.count() === 30)
    assert(df.filter(col("lang") === "de").agg(min(col("id"))).head()
      .getLong(0) === 201L)
    // a partition filter prunes directories before planning
    val pruned = df.filter(col("day") === 2L)
    assert(pruned.rdd.getNumPartitions === 1,
      s"expected 1 surviving file, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.agg(sum(col("id"))).head().getLong(0) ===
      (101L to 110L).sum)
    // projecting only partition columns still counts file rows
    assert(df.select("lang").filter(col("lang") === "en").count() === 20)
  }

  test("a small graft-avro dim broadcasts off reported statistics") {
    val dimPath = tmp("dim")
    writeSample(dimPath, rows = 5)
    import spark.implicits._
    val fact = (1 to 500).map(i => (i.toLong % 5 + 1, i)).toDF("id", "x")
    val dim = spark.read.format("graft-avro").load(dimPath).select("id", "name")
    val plan = fact.join(dim, "id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 5-row avro dim with real stats must broadcast:\n$plan")
  }

  test("sidecar row counts reach the planner as exact numRows") {
    import spark.implicits._
    val path = tmp("numrows")
    (1 to 777).map(i => (i.toLong, s"n_$i")).toDF("id", "name")
      .repartition(3).write.format("graft-avro").mode("overwrite").save(path)
    val rel = spark.read.format("graft-avro").load(path)
      .queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
    assert(rel.stats.rowCount === Some(BigInt(777)))
  }

  test("stats sidecars skip whole files and answer aggregates") {
    import spark.implicits._
    val path = tmp("skip_agg")
    // DSv2 write, range-partitioned → disjoint id ranges per part file,
    // each with a one-batch stats sidecar + the merged _stats.json
    (1 to 10000).map(i => (i.toLong, i * 0.5)).toDF("id", "v")
      .repartitionByRange(10, col("id")).sortWithinPartitions("id")
      .write.format("graft-avro").mode("overwrite").save(path)
    assert(new java.io.File(path, graft.io.FeatherStats.MergedName).exists())
    def scan = spark.read.format("graft-avro").load(path)
    assert(scan.rdd.getNumPartitions === 10)
    // file-level skipping: ~9 of 10 range files prove empty for id > 9500
    val pruned = scan.filter(col("id") > 9500L)
    assert(pruned.rdd.getNumPartitions === 1,
      s"expected 1 surviving file, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.count() === 500)
    // nothing matches → every file proves empty
    assert(scan.filter(col("id") > 99999L).rdd.getNumPartitions === 0)
    // aggregate pushdown answers on the driver
    val agged = scan.agg(count(lit(1)).as("n"), min("id").as("lo"),
      max("id").as("hi"), max("v").as("vhi"))
    val plan = agged.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"agg did not push:\n$plan")
    assert(agged.head() === org.apache.spark.sql.Row(10000L, 1L, 10000L, 5000.0))
    // a filter keeps the aggregate on the data scan, values stay exact
    val fagg = scan.filter(col("id") > 5000L).agg(count(lit(1)).as("n"))
    assert(fagg.queryExecution.executedPlan.toString.contains("BatchScan"))
    assert(fagg.head().getLong(0) === 5000L)
    // legacy files (GraftAvro.write: no sidecars) never prune, never break
    val legacy = tmp("skip_legacy")
    writeSample(legacy, rows = 1000)
    val lscan = spark.read.format("graft-avro").load(legacy)
    assert(lscan.filter(col("id") > 900L).count() === 100)
    assert(lscan.agg(count(lit(1))).queryExecution.executedPlan
      .toString.contains("BatchScan"))
  }
}
