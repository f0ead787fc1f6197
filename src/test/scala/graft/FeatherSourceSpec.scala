package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.GraftFeather

/** The DSv2 face of the feather source: `format("feather")` must resolve
  * by short name, prune columns through Catalyst (not a `columns=` arg),
  * split multi-batch files across tasks, and hand the planner real size
  * statistics. */
class FeatherSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String) = s"${sys.props("java.io.tmpdir")}/graft_feather_src/$n"

  private def writeSample(path: String, rows: Int = 5000,
                          batchSize: Int = 512): Unit = {
    import spark.implicits._
    val df = (1 to rows).map(i => (i.toLong, s"name_$i", i * 1.5, i % 7))
      .toDF("id", "name", "v", "grp")
    GraftFeather.write(df.repartition(1), path, codec = "lz4",
      overwrite = true, batchSize = batchSize)
  }

  test("format(feather).load resolves by short name and roundtrips") {
    val path = tmp("basic")
    writeSample(path)
    val df = spark.read.format("feather").load(path)
    assert(df.count() === 5000)
    assert(df.schema.fieldNames.toSeq === Seq("id", "name", "v", "grp"))
    assert(df.filter(col("id") === 42L).select("name").head().getString(0)
      === "name_42")
  }

  test("Catalyst prunes columns into the scan (ReadSchema shows the cut)") {
    val path = tmp("prune")
    writeSample(path)
    val df = spark.read.format("feather").load(path).select("id", "v")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(plan.contains("struct<id:bigint,v:double>"),
      s"expected a pruned 2-column ReadSchema:\n$plan")
    assert(df.agg(sum(col("v"))).head().getDouble(0) ===
      (1 to 5000).map(_ * 1.5).sum)
  }

  test("multi-batch files split across >1 input partition") {
    val path = tmp("splits")
    writeSample(path)
    val df = spark.read.format("feather")
      .option("maxSplitBytes", (32 << 10).toString).load(path)
    assert(df.rdd.getNumPartitions > 1,
      s"expected >1 partition, got ${df.rdd.getNumPartitions}")
    assert(df.count() === 5000)
  }

  test("reported sizeInBytes lets the planner broadcast a small feather dim") {
    val dimPath = tmp("dim")
    writeSample(dimPath, rows = 7)
    import spark.implicits._
    val fact = (1 to 1000).map(i => (i.toLong % 7, i.toDouble)).toDF("grp", "x")
    val dim = spark.read.format("feather").load(dimPath)
      .select(col("id").as("grp"), col("name"))
    val joined = fact.join(dim, "grp")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 7-row feather dim with real stats must broadcast:\n$plan")
  }

  test("sidecar row counts reach the planner as exact numRows") {
    import spark.implicits._
    val path = tmp("numrows")
    (1 to 888).map(i => (i.toLong, s"n_$i")).toDF("id", "name")
      .repartition(3).write.format("feather").mode("overwrite").save(path)
    val rel = spark.read.format("feather").load(path)
      .queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
    assert(rel.stats.rowCount === Some(BigInt(888)))
  }

  test("limit pushes a per-partition row cap (partial push, exact result)") {
    val path = tmp("limit")
    writeSample(path)
    val df = spark.read.format("feather")
      .option("maxSplitBytes", (32 << 10).toString).load(path)
    // correctness: the global limit still yields exactly N rows even
    // though every partition is capped at N
    assert(df.limit(17).count() === 17)
    assert(df.orderBy("id").limit(3).collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 3L))
  }

  test("df.write.format(feather) appends and overwrites through BatchWrite") {
    import spark.implicits._
    val path = tmp("write_v2")
    val a = (1 to 300).map(i => (i.toLong, s"a_$i")).toDF("id", "s")
    val b = (301 to 400).map(i => (i.toLong, s"b_$i")).toDF("id", "s")
    a.write.format("feather").mode("overwrite").save(path)
    assert(spark.read.format("feather").load(path).count() === 300)
    // append adds parts without touching the existing ones
    b.write.format("feather").mode("append").save(path)
    val both = spark.read.format("feather").load(path)
    assert(both.count() === 400)
    assert(both.agg(sum(col("id"))).head().getLong(0) ===
      (1 to 400).map(_.toLong).sum)
    // overwrite truncates to the new content only
    b.write.format("feather").mode("overwrite").save(path)
    assert(spark.read.format("feather").load(path).count() === 100)
    // the non-DSv2 reader sees the same files (one format, two faces)
    assert(GraftFeather.read(spark, path).count() === 100)
    // _SUCCESS stamped by the driver-side commit
    assert(new java.io.File(path, "_SUCCESS").exists())
  }

  test("DSv2 write honors codec/batchSize options and empty frames") {
    import spark.implicits._
    val path = tmp("write_v2_opts")
    val df = (1 to 2000).map(i => (i.toLong, s"text_$i" * 10)).toDF("id", "s")
    df.repartition(1).write.format("feather").mode("overwrite")
      .option("codec", "zstd").option("batchSize", "100").save(path)
    val back = spark.read.format("feather")
      .option("maxSplitBytes", (16 << 10).toString).load(path)
    assert(back.rdd.getNumPartitions > 1) // many batches -> splittable
    assert(back.count() === 2000)
    // empty frame: schema-only part, reads back as empty with schema
    df.filter(col("id") < 0).write.format("feather")
      .mode("overwrite").save(path)
    val empty = spark.read.format("feather").load(path)
    assert(empty.schema.fieldNames.toSeq === Seq("id", "s"))
    assert(empty.count() === 0)
  }

  test("stats sidecars let filters skip record batches (feather's missing row-group stats)") {
    import spark.implicits._
    val path = tmp("skip")
    // sorted id -> disjoint per-batch ranges; batchSize 100 over 1000 rows
    // = 10 batches; tiny maxSplitBytes puts ~1 batch per split
    val df = (1 to 1000).map(i => (i.toLong, s"name_$i", i * 2.0))
      .toDF("id", "name", "v").orderBy("id")
    df.repartition(1).sortWithinPartitions("id")
      .write.format("feather").mode("overwrite")
      .option("codec", "none").option("batchSize", "100").save(path)
    def scan = spark.read.format("feather")
      .option("maxSplitBytes", "1").load(path)
    val full = scan
    val pruned = scan.filter(col("id") > 950L)
    assert(full.rdd.getNumPartitions === 10)
    assert(pruned.rdd.getNumPartitions === 1,
      s"expected 9 of 10 batches skipped, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.count() === 50) // correctness under pruning
    // a filter matching nothing prunes EVERY batch
    assert(scan.filter(col("id") > 5000L).rdd.getNumPartitions === 0)
    assert(scan.filter(col("id") > 5000L).count() === 0)
    // string ranges prune too; conjunctions prune if either side proves empty
    assert(scan.filter(col("v") < 20.0 && col("name") === "zzz")
      .rdd.getNumPartitions === 0)
    // an unfilterable predicate shape disables pruning, never correctness
    assert(scan.filter(length(col("name")) > 4).count() === 1000)
  }

  test("sidecar stats load in parallel: 300-file directory plans fast and prunes") {
    import spark.implicits._
    val path = tmp("skip_many")
    // 300 part files in ONE job (range partitioning → disjoint id ranges per
    // file), each with its own .stats.json sidecar from the DSv2 sink
    (1 to 30000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .repartitionByRange(300, col("id"))
      .sortWithinPartitions("id")
      .write.format("feather").mode("overwrite")
      .option("codec", "none").save(path)
    val nFiles = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".feather"))
    assert(nFiles === 300)
    val scan = spark.read.format("feather").load(path)
    val t0 = System.nanoTime()
    val prunedParts = scan.filter(col("id") > 29900L).rdd.getNumPartitions
    val planMs = (System.nanoTime() - t0) / 1e6
    // ~100 ids survive = 1 range file; every other file proves empty
    assert(prunedParts === 1, s"expected 1 surviving file, got $prunedParts")
    assert(scan.filter(col("id") > 29900L).count() === 100)
    // the parallel sidecar loads must not serialize into a driver stall:
    // 300 local round-trips at ≤16-way parallelism plan in well under the
    // bound (observed ~100-300 ms locally; the bound only catches a
    // regression back to one-file-at-a-time over slow storage)
    assert(planMs < 10000, s"planning 300 sidecars took $planMs ms")
    info(f"planned 300-file skip-pruned scan in $planMs%.0f ms")
  }

  test("all-null batches prune under any comparison; foreign files never prune") {
    import spark.implicits._
    val path = tmp("skip_nulls")
    val df = (1 to 200).map(i =>
      (i.toLong, if (i <= 100) null else s"x_$i")).toDF("id", "s")
    df.repartition(1).sortWithinPartitions("id")
      .write.format("feather").mode("overwrite")
      .option("batchSize", "100").save(path)
    val scan = spark.read.format("feather")
      .option("maxSplitBytes", "1").load(path)
    // batch 1 is all-null in s: no row there can satisfy s = 'x_150'
    assert(scan.filter(col("s") === "x_150").rdd.getNumPartitions === 1)
    assert(scan.filter(col("s") === "x_150").count() === 1)
    // foreign file (no sidecar): same filters, no pruning, full correctness
    val foreign = tmp("skip_foreign")
    GraftFeather.write(df.repartition(1), foreign, overwrite = true,
      batchSize = 100)
    new java.io.File(foreign).listFiles()
      .filter(f => f.getName.endsWith(".stats.json") ||
        f.getName == graft.io.FeatherStats.MergedName).foreach(_.delete())
    val fscan = spark.read.format("feather")
      .option("maxSplitBytes", "1").load(foreign)
    assert(fscan.filter(col("s") === "x_150").rdd.getNumPartitions === 2)
    assert(fscan.filter(col("s") === "x_150").count() === 1)
  }

  test("readStream.format(feather) ingests a drop directory exactly once") {
    import spark.implicits._
    val path = tmp("stream_drops")
    // fresh dirs per run: the memory sink cannot recover a checkpoint,
    // and a stale drop dir would shift the expected counts
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Seq(path, tmp("stream_ckpt")).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    // batch 1 on disk before the stream starts (also feeds inferSchema)
    (1 to 100).map(i => (i.toLong, s"a_$i")).toDF("id", "s")
      .write.format("feather").mode("overwrite").save(path)
    val q = spark.readStream.format("feather").load(path)
      .writeStream.format("memory").queryName("feather_stream")
      .option("checkpointLocation", tmp("stream_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("feather_stream").count() === 100)
      // more files DROP into the directory (append = new parts, atomic
      // rename commit) — the next micro-batch picks up only the new ones
      (101 to 150).map(i => (i.toLong, s"b_$i")).toDF("id", "s")
        .write.format("feather").mode("append").save(path)
      q.processAllAvailable()
      val got = spark.table("feather_stream")
      assert(got.count() === 150) // exactly once: no replay of batch 1
      assert(got.agg(sum(col("id"))).head().getLong(0) ===
        (1 to 150).map(_.toLong).sum)
      // a batch with no new files is empty, not a replay
      q.processAllAvailable()
      assert(spark.table("feather_stream").count() === 150)
    } finally q.stop()
  }

  test("a restarted stream recovers the file-set offset from the checkpoint") {
    import spark.implicits._
    val path = tmp("stream_restart")
    val ckpt = tmp("stream_restart_ckpt")
    val out = tmp("stream_restart_out")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Seq(path, ckpt, out).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    // parquet sink: the memory sink refuses checkpoint recovery, and
    // restart-resume is exactly what this test pins
    (1 to 100).map(i => (i.toLong, s"a_$i")).toDF("id", "s")
      .write.format("feather").mode("overwrite").save(path)
    val q1 = spark.readStream.format("feather").load(path)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() === 100)
    } finally q1.stop()
    // files drop while the stream is DOWN; the restarted query must
    // deserialize the committed offset and process only what's new —
    // a replay of batch 1 would surface as duplicate rows in the sink
    (101 to 150).map(i => (i.toLong, s"b_$i")).toDF("id", "s")
      .write.format("feather").mode("append").save(path)
    val q2 = spark.readStream.format("feather").load(path)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
      assert(got.count() === 150,
        s"restart must resume past the committed offset, got ${got.count()} rows")
      assert(got.agg(sum(col("id"))).head().getLong(0) ===
        (1 to 150).map(_.toLong).sum)
    } finally q2.stop()
  }

  test("a restart across a COMPACTED offset resumes exactly-once") {
    import spark.implicits._
    val path = tmp("stream_compact_restart")
    val ckpt = tmp("stream_compact_restart_ckpt")
    val out = tmp("stream_compact_restart_out")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Seq(path, ckpt, out).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    // 40-part backlog with a threshold of 8: the offset committed by the
    // first run is GUARANTEED to be in the compacted {"log": …} form, so
    // the restart exercises log-file recovery through Spark's real
    // checkpoint, not just FileSetOffset.fromJson in isolation
    (1 to 400).map(i => (i.toLong, s"a_$i")).toDF("id", "s")
      .repartition(40, col("id"))
      .write.format("feather").mode("overwrite").save(path)
    spark.conf.set("spark.graft.streaming.seenCompactThreshold", "8")
    try {
      val q1 = spark.readStream.format("feather")
        .option("maxFilesPerTrigger", "10").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try { q1.processAllAvailable() } finally q1.stop()
      assert(spark.read.parquet(out).count() === 400)
      val offsetsDir = new java.io.File(s"$ckpt/offsets")
      val latest = offsetsDir.listFiles()
        .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toInt)
      val text = new String(
        java.nio.file.Files.readAllBytes(latest.toPath), "UTF-8")
      assert(text.contains("\"log\""),
        s"committed offset should be compacted, got: ${text.take(200)}")
      // drop more files while down; the restarted query must read the
      // compact log to know the 40 originals are done — a failure to load
      // it replays all 40 as duplicates
      (401 to 450).map(i => (i.toLong, s"b_$i")).toDF("id", "s")
        .repartition(2, col("id"))
        .write.format("feather").mode("append").save(path)
      val q2 = spark.readStream.format("feather")
        .option("maxFilesPerTrigger", "10").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try { q2.processAllAvailable() } finally q2.stop()
      val got = spark.read.parquet(out)
      assert(got.count() === 450,
        s"resume across compacted offset failed: ${got.count()} rows")
      assert(got.agg(sum(col("id"))).head().getLong(0) ===
        (1 to 450).map(_.toLong).sum)
    } finally spark.conf.unset("spark.graft.streaming.seenCompactThreshold")
  }

  test("maxFilesPerTrigger drains a file backlog in bounded micro-batches") {
    import spark.implicits._
    val path = tmp("stream_admission")
    val ckpt = tmp("stream_admission_ckpt")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Seq(path, ckpt).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    // backlog BEFORE the stream starts: 5 one-part drops of 10 rows each —
    // the restart-after-downtime shape admission control exists for
    (0 until 5).foreach { k =>
      (1 to 10).map(i => (k * 10L + i, s"f${k}_$i")).toDF("id", "s")
        .repartition(1).write.format("feather")
        .mode(if (k == 0) "overwrite" else "append").save(path)
    }
    val q = spark.readStream.format("feather")
      .option("maxFilesPerTrigger", "2").load(path)
      .writeStream.format("memory").queryName("feather_admission")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("feather_admission")
      assert(got.count() === 50) // exactly once across all batches
      assert(got.agg(sum(col("id"))).head().getLong(0) ===
        (1 to 50).map(_.toLong).sum)
      // the backlog must have been split into 2+2+1 files, never one
      // 5-file batch: batch row counts are (10, 20, 20) in some order
      val batchRows = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchRows.sorted.toSeq === Seq(10L, 20L, 20L),
        s"expected 3 bounded batches, got ${batchRows.mkString(",")}")
    } finally q.stop()
  }

  test("writeStream.format(feather) lands epoch-committed atomic drops") {
    import spark.implicits._
    val src = tmp("sink_src")
    val out = tmp("sink_out")
    val ckpt = tmp("sink_ckpt")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Seq(src, out, ckpt).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    (1 to 80).map(i => (i.toLong, s"a_$i")).toDF("id", "s")
      .write.format("feather").mode("overwrite").save(src)
    // feather in → feather out: the full drop-directory loop
    val q = spark.readStream.format("feather").load(src)
      .writeStream.format("feather").option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val first = spark.read.format("feather").load(out)
      assert(first.count() === 80)
      (81 to 120).map(i => (i.toLong, s"b_$i")).toDF("id", "s")
        .write.format("feather").mode("append").save(src)
      q.processAllAvailable()
      val got = spark.read.format("feather").load(out)
      assert(got.count() === 120)
      assert(got.agg(sum(col("id"))).head().getLong(0) ===
        (1 to 120).map(_.toLong).sum)
      // epoch ids ride the part names, and every part carries its
      // skipping-index sidecar — streamed output prunes like batch output
      val parts = fs.listStatus(new org.apache.hadoop.fs.Path(out))
        .map(_.getPath.getName).filter(_.endsWith(".feather"))
      assert(parts.nonEmpty && parts.forall(_.startsWith("part-e")),
        parts.mkString(","))
      assert(parts.forall(p => fs.exists(
        new org.apache.hadoop.fs.Path(out, p + ".stats.json"))),
        "missing stats sidecar on a streamed part")
    } finally q.stop()
  }

  test("hive-style partition directories discover, type, and prune") {
    import spark.implicits._
    val root = tmp("partitioned")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    // lang=?/day=? leaves, each written through the sink; ids encode the
    // leaf so values can be cross-checked against the directory chain
    val leaves = Seq(("en", 1, 0L), ("en", 2, 100L), ("de", 1, 200L))
    leaves.foreach { case (lang, day, base) =>
      (1 to 10).map(i => (base + i, s"${lang}_$i"))
        .toDF("id", "s").repartition(1).write.format("feather")
        .mode("overwrite").save(s"$root/lang=$lang/day=$day")
    }
    val df = spark.read.format("feather").load(root)
    // partition columns land after the data columns, typed by inference
    assert(df.schema.fieldNames.toSeq === Seq("id", "s", "lang", "day"))
    assert(df.schema("lang").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(df.schema("day").dataType === org.apache.spark.sql.types.LongType)
    assert(df.count() === 30)
    // values come from the chain, matched to the right rows
    assert(df.filter(col("lang") === "de").agg(min(col("id"))).head()
      .getLong(0) === 201L)
    assert(df.filter(col("day") === 2L).count() === 10)
    // pruning: a partition filter must cut the files BEFORE planning —
    // 3 leaf files, day=2 touches exactly 1
    val pruned = df.filter(col("day") === 2L)
    assert(pruned.rdd.getNumPartitions === 1,
      s"expected 1 surviving file, got ${pruned.rdd.getNumPartitions}")
    val both = df.filter(col("lang") === "en" && col("day") === 1L)
    assert(both.rdd.getNumPartitions === 1)
    assert(both.agg(sum(col("id"))).head().getLong(0) ===
      (1L to 10L).sum)
    // projecting ONLY partition columns still counts file rows
    assert(df.select("lang").filter(col("lang") === "en").count() === 20)
    // a small pruned read reports a small size: the broadcast threshold
    // sees post-pruning bytes
    val fact = (1 to 500).map(i => (i % 10 + 1L, i)).toDF("id", "x")
    val dim = spark.read.format("feather").load(root)
      .filter(col("day") === 1L && col("lang") === "en").select("id", "s")
    val plan = fact.join(dim, "id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"pruned dim must broadcast:\n$plan")
    // mixed layouts fail loudly, not silently half-read
    (1 to 5).map(i => (900L + i, s"flat_$i")).toDF("id", "s")
      .repartition(1).write.format("feather").mode("append").save(root)
    val e = intercept[Exception] {
      spark.read.format("feather").load(root).count()
    }
    assert(e.getMessage.contains("inconsistent partition layouts"),
      e.getMessage)
  }

  test("string partition pruning compares in UTF-8 byte order beyond " +
       "the BMP") {
    // unit-level: the local filesystem cannot encode non-BMP directory
    // names (JVM sun.jnu.encoding), but object stores can — so the
    // comparator is pinned directly. U+1F600 sorts ABOVE U+E000 in
    // UTF-8 (F0 9F… > EE 80…), Spark's order; its UTF-16 surrogate
    // D83D sorts below, so a compareTo pruner would prune the emoji
    // leaf for s > U+E000 and silently drop its rows.
    import org.apache.spark.sql.sources.{GreaterThan, LessThan}
    import org.apache.spark.sql.types._
    val leaf = graft.sources.FeatherPartitions.LeafFile(
      "f.feather", 1L, Seq("s" -> "😀"))
    val ps = StructType(Seq(StructField("s", StringType)))
    assert(graft.sources.FeatherPartitions.survives(leaf, ps,
      Seq(GreaterThan("s", ""))),
      "the emoji leaf matches s > U+E000 in UTF-8 order; pruning it " +
        "silently drops rows")
    assert(!graft.sources.FeatherPartitions.survives(leaf, ps,
      Seq(LessThan("s", ""))))
  }

  test("SQL over the source works via USING feather") {
    val path = tmp("sql")
    writeSample(path)
    spark.sql("DROP TABLE IF EXISTS feather_sql_t")
    spark.sql(
      s"CREATE TABLE feather_sql_t USING feather OPTIONS (path '$path')")
    try {
      val n = spark.sql(
        "SELECT count(*) AS n FROM feather_sql_t WHERE grp = 3").head().getLong(0)
      assert(n === (1 to 5000).count(_ % 7 == 3))
    } finally spark.sql("DROP TABLE IF EXISTS feather_sql_t")
  }

  test("unfiltered count/min/max answer from sidecars without reading data") {
    val path = tmp("agg_push")
    writeSample(path, rows = 4000, batchSize = 512)
    val df = spark.read.format("feather").load(path)
    val agged = df.agg(count("*").as("n"), min("id").as("lo"),
      max("id").as("hi"), min("name").as("slo"), max("v").as("vhi"))
    val plan = agged.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"expected the aggregate to collapse to a local scan:\n$plan")
    assert(!plan.contains("BatchScan"), s"data scan should not run:\n$plan")
    val r = agged.head()
    assert(r.getLong(0) === 4000L)
    assert(r.getLong(1) === 1L && r.getLong(2) === 4000L)
    assert(r.getString(3) === "name_1") // lexicographic min
    assert(r.getDouble(4) === 4000 * 1.5)
  }

  test("min/max over a DATE column answer from sidecars (epoch-day " +
       "stats narrow back to DateType)") {
    val path = tmp("agg_push_date")
    import spark.implicits._
    val day0 = java.time.LocalDate.of(2024, 1, 1)
    (1 to 3000).map(i => (i.toLong,
        java.sql.Date.valueOf(day0.plusDays(i.toLong))))
      .toDF("id", "d")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.format("feather").mode("overwrite").save(path)
    val df = spark.read.format("feather").load(path)
    val agged = df.agg(min("d").as("lo"), max("d").as("hi"),
      count("*").as("n"))
    val plan = agged.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"date min/max did not answer from stats:\n$plan")
    assert(!plan.contains("BatchScan"), s"data scan should not run:\n$plan")
    val r = agged.head()
    assert(r.getDate(0).toLocalDate === day0.plusDays(1))
    assert(r.getDate(1).toLocalDate === day0.plusDays(3000))
    assert(r.getLong(2) === 3000L)
  }

  test("min/max over strings beyond the BMP merge in UTF-8 byte order " +
       "across files (the order Spark's data scan would return)") {
    val path = tmp("agg_push_utf8")
    import spark.implicits._
    // two files with disjoint extremes: U+1F600 (UTF-8 F0 9F 98 80)
    // sorts ABOVE U+E000 (EE 80 80) in UTF-8, but its UTF-16 surrogate
    // D83D sorts BELOW — a compareTo merge would pick the wrong min
    Seq((1L, "😀")).toDF("id", "s").repartition(1)
      .write.format("feather").mode("overwrite").save(path)
    Seq((2L, "")).toDF("id", "s").repartition(1)
      .write.format("feather").mode("append").save(path)
    val df = spark.read.format("feather").load(path)
    val agged = df.agg(min("s").as("lo"), max("s").as("hi"))
    assert(agged.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    val viaStats = agged.head()
    // the data scan is the ground truth the pushdown must agree with
    val viaData = df.filter(col("id") > 0L)
      .agg(min("s").as("lo"), max("s").as("hi")).head()
    assert(viaStats === viaData)
    assert(viaStats.getString(0) === "")
    assert(viaStats.getString(1) === "😀")
  }

  test("aggregate pushdown bails to the data scan when it must") {
    val path = tmp("agg_bail")
    writeSample(path, rows = 1000, batchSize = 256)
    val df = spark.read.format("feather").load(path)
    // a filter keeps the exact semantics out of sidecar reach
    val filtered = df.filter(col("id") > 500).agg(count("*").as("n"))
    assert(filtered.queryExecution.executedPlan.toString.contains("BatchScan"))
    assert(filtered.head().getLong(0) === 500L)
    // grouping keys can't be answered from whole-file ranges
    val grouped = df.groupBy(col("grp")).count()
    assert(grouped.queryExecution.executedPlan.toString.contains("BatchScan"))
    assert(grouped.agg(sum("count")).head().getLong(0) === 1000L)
    // an aggregate the sidecars can't carry (sum) falls back whole-hog
    val summed = df.agg(sum("id").as("s"))
    assert(summed.queryExecution.executedPlan.toString.contains("BatchScan"))
    assert(summed.head().getLong(0) === (1 to 1000).map(_.toLong).sum)
  }

  test("pre-count sidecars disqualify pushdown but never the read") {
    val path = tmp("agg_oldcar")
    writeSample(path, rows = 800, batchSize = 256)
    // rewrite every sidecar without the reserved __n entries — the format
    // before counts existed (and drop the merged cache, which post-dates
    // counts: this test exercises the sidecar-era fallback). Rewriting
    // out-of-band stales Hadoop's local .crc files, so drop those too
    // (else the read throws ChecksumException and disqualifies min/max
    // pushdown for the wrong reason).
    val dir = new java.io.File(path)
    val mf = new java.io.File(dir, graft.io.FeatherStats.MergedName)
    if (mf.exists()) { mf.delete()
      val mc = new java.io.File(dir, "." + graft.io.FeatherStats.MergedName + ".crc")
      if (mc.exists()) mc.delete() }
    for (sc <- dir.listFiles().filter(_.getName.endsWith(".stats.json"))) {
      val batches = graft.io.FeatherStats.fromJson(
        new String(java.nio.file.Files.readAllBytes(sc.toPath), "UTF-8"))
      val stripped = batches.map(_ - graft.io.FeatherStats.RowCountKey)
      java.nio.file.Files.write(sc.toPath,
        graft.io.FeatherStats.toJson(stripped).getBytes("UTF-8"))
      val crc = new java.io.File(dir, "." + sc.getName + ".crc")
      if (crc.exists()) crc.delete()
    }
    val df = spark.read.format("feather").load(path)
    val agged = df.agg(count("*").as("n"))
    assert(agged.queryExecution.executedPlan.toString.contains("BatchScan"),
      "count over pre-count sidecars must fall back to the data scan")
    assert(agged.head().getLong(0) === 800L)
    // min/max still answer: ranges are present even without counts
    val mm = df.agg(min("id").as("lo"), max("id").as("hi"))
    assert(mm.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(mm.head().getLong(0) === 1L && mm.head().getLong(1) === 800L)
  }

  test("merged _stats.json alone answers aggregates and prunes batches") {
    import spark.implicits._
    val path = tmp("merged_only")
    (1 to 1000).map(i => (i.toLong, s"n_$i")).toDF("id", "name")
      .repartition(1).sortWithinPartitions("id")
      .write.format("feather").mode("overwrite")
      .option("batchSize", "100").save(path)
    val dir = new java.io.File(path)
    assert(new java.io.File(dir, graft.io.FeatherStats.MergedName).exists(),
      "DSv2 commit must write the merged stats file")
    // drop every per-file sidecar: the merged cache is the only stats left
    dir.listFiles().filter(_.getName.endsWith(".stats.json"))
      .foreach(_.delete())
    def scan = spark.read.format("feather")
      .option("maxSplitBytes", "1").load(path)
    // batch skipping from the merged file (9 of 10 batches proven empty)
    assert(scan.filter(col("id") > 900L).rdd.getNumPartitions === 1)
    assert(scan.filter(col("id") > 900L).count() === 100)
    // aggregate pushdown from the merged file
    val agged = spark.read.format("feather").load(path)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    assert(agged.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(agged.head() === org.apache.spark.sql.Row(1000L, 1L, 1000L))
  }

  test("merged entries are length-validated; torn merged files are ignored") {
    import spark.implicits._
    val path = tmp("merged_guard")
    (1 to 500).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .repartition(1).sortWithinPartitions("id")
      .write.format("feather").mode("overwrite")
      .option("batchSize", "100").save(path)
    val dir = new java.io.File(path)
    dir.listFiles().filter(_.getName.endsWith(".stats.json"))
      .foreach(_.delete())
    val mf = new java.io.File(dir, graft.io.FeatherStats.MergedName)
    def rewrite(f: java.io.File)(xf: String => String): Unit = {
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      java.nio.file.Files.write(f.toPath, xf(txt).getBytes("UTF-8"))
      val crc = new java.io.File(f.getParentFile, "." + f.getName + ".crc")
      if (crc.exists()) crc.delete()
    }
    // 1. length mismatch: the entry stops matching the discovered file —
    // aggregate pushdown bails (no sidecars left to fall back to), the
    // data scan still answers correctly
    rewrite(mf)(_.replaceAll("\"len\":\"\\d+\"", "\"len\":\"1\""))
    val agged = spark.read.format("feather").load(path)
      .agg(count(lit(1)).as("n"))
    assert(agged.queryExecution.executedPlan.toString.contains("BatchScan"),
      "length-mismatched merged entries must not answer aggregates")
    assert(agged.head().getLong(0) === 500L)
    // pruning is likewise disabled, never correctness
    val scan = spark.read.format("feather")
      .option("maxSplitBytes", "1").load(path)
    assert(scan.filter(col("id") > 450L).rdd.getNumPartitions === 5)
    assert(scan.filter(col("id") > 450L).count() === 50)
    // 2. torn write: invalid JSON is ignored wholesale, reads are unharmed
    rewrite(mf)(txt => txt.substring(0, txt.length / 2))
    assert(spark.read.format("feather").load(path).count() === 500)
    assert(spark.read.format("feather").load(path)
      .agg(count(lit(1))).queryExecution.executedPlan.toString
      .contains("BatchScan"))
  }

  test("append commits fold new parts into the merged stats") {
    import spark.implicits._
    val path = tmp("merged_append")
    (1 to 300).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .repartition(1).write.format("feather").mode("overwrite").save(path)
    (301 to 500).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .repartition(1).write.format("feather").mode("append").save(path)
    val dir = new java.io.File(path)
    // merged covers BOTH commits' parts: delete sidecars, count must answer
    dir.listFiles().filter(_.getName.endsWith(".stats.json"))
      .foreach(_.delete())
    val agged = spark.read.format("feather").load(path)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    assert(agged.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "append must fold its parts into the merged stats")
    assert(agged.head() === org.apache.spark.sql.Row(500L, 1L, 500L))
  }
}
