package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.GraftStreaming

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowedCounts aggregates event-time windows with a watermark") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)](spark)
    val df = input.toDF().toDF("ts", "k")
    val q = GraftStreaming.startToMemory(
      GraftStreaming.windowedCounts(df, "ts", "k", "10 minutes", "5 minutes"),
      "win_counts")
    try {
      input.addData((ts(1), "a"), (ts(2), "a"), (ts(11), "b"), (ts(3), "a"))
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .groupBy("win_start", "k").agg(max("n").as("n"))
        .orderBy("win_start", "k")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == Seq(
        (Timestamp.valueOf("2026-01-01 10:00:00"), "a", 3L),
        (Timestamp.valueOf("2026-01-01 10:10:00"), "b", 1L)))
    } finally q.stop()
  }

  test("windowedCounts append mode finalizes on watermark and drops late rows") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)](spark)
    val df = input.toDF().toDF("ts", "k")
    val q = GraftStreaming.windowedCounts(df, "ts", "k", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_final")
      .outputMode("append").start()
    try {
      input.addData((ts(1), "a"), (ts(2), "a"))
      q.processAllAvailable() // watermark 09:57 — window [10:00,10:10) still open
      assert(spark.table("win_final").count() == 0)
      input.addData((ts(16), "b"))
      q.processAllAvailable() // watermark 10:11 — closes and emits [10:00,10:10)
      input.addData((ts(3), "a"))
      q.processAllAvailable() // LATE: event 10:03 behind the 10:11 watermark → dropped
      input.addData((ts(27), "c"))
      q.processAllAvailable() // watermark 10:22 — closes [10:10,10:20)
      val got = spark.table("win_final")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      // the late row neither re-opened [10:00,10:10) nor changed its count
      assert(got == Set(
        (Timestamp.valueOf("2026-01-01 10:00:00"), "a", 2L),
        (Timestamp.valueOf("2026-01-01 10:10:00"), "b", 1L)))
    } finally q.stop()
  }

  test("windowedCounts batch-mode plan equals the batch oracle result") {
    import spark.implicits._
    val batch = Seq((ts(1), "a"), (ts(2), "a"), (ts(11), "b"), (ts(3), "a")).toDF("ts", "k")
    val got = GraftStreaming.windowedCounts(batch, "ts", "k", "10 minutes", "5 minutes")
      .orderBy("win_start", "k")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (Timestamp.valueOf("2026-01-01 10:00:00"), "a", 3L),
      (Timestamp.valueOf("2026-01-01 10:10:00"), "b", 1L)))
  }

  test("streamingDedup keeps first occurrence per digest") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long)](spark)
    val df = input.toDF().toDF("ts", "digest")
    val q = GraftStreaming.streamingDedup(df, "ts", "digest", "5 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts(1), 100L), (ts(2), 100L), (ts(3), 200L))
      q.processAllAvailable()
      // append-mode dedup emits each digest once
      val got = spark.table("dedup_out").select("digest")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(100L, 200L))
    } finally q.stop()
  }

  test("streamingDedup state survives a checkpointed stop/restart") {
    import spark.implicits._
    // the operational contract at 100 TB/day: a restarted ingest job must
    // not re-admit digests it already passed before the crash. File source
    // (replayable) + file sink (exactly-once via _spark_metadata) + the
    // SAME checkpoint dir across two query incarnations; the batch-2
    // duplicate of a batch-1 digest is dropped ONLY if the dedup state
    // store recovered from the checkpoint.
    val root = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_stream_restart_${System.nanoTime()}")
    val (in, out, ckpt) = (new java.io.File(root, "in"),
      new java.io.File(root, "out"), new java.io.File(root, "ckpt"))
    in.mkdirs()
    def addBatch(name: String, rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "digest").repartition(1)
        .write.mode("append").parquet(in.getPath)
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("ts TIMESTAMP, digest BIGINT").parquet(in.getPath)
      val q = GraftStreaming.streamingDedup(src, "ts", "digest", "10 minutes")
        .writeStream.format("parquet")
        .option("path", out.getPath)
        .option("checkpointLocation", ckpt.getPath)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    addBatch("b1", Seq((ts(1), 100L), (ts(2), 200L)))
    runOnce() // incarnation 1 admits 100 and 200
    addBatch("b2", Seq((ts(3), 100L), (ts(4), 300L))) // 100 is a replayed dup
    runOnce() // incarnation 2 must remember 100 from the checkpoint
    val got = spark.read.parquet(out.getPath)
      .select("digest").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(100L, 200L, 300L),
      s"restart must keep dedup state (no re-admitted 100, no losses): $got")
  }

  test("corpusPrepStream gates quality then dedups digests, streaming == batch") {
    import spark.implicits._
    // (ts, doc_id, digest, n_tokens, quality): doc 2 is a dup of doc 1's
    // digest, doc 3 fails the token gate, doc 4 fails the quality gate
    val rows = Seq(
      (ts(1), 1L, 100L, 50L, 0.9),
      (ts(2), 2L, 100L, 60L, 0.8),
      (ts(3), 3L, 200L, 5L, 0.9),
      (ts(4), 4L, 300L, 80L, 0.1),
      (ts(5), 5L, 400L, 70L, 0.7))
    val cols = Seq("ts", "doc_id", "digest", "n_tokens", "quality")
    val input = MemoryStream[(Timestamp, Long, Long, Long, Double)](spark)
    val q = GraftStreaming.corpusPrepStream(input.toDF().toDF(cols: _*),
        "ts", "digest", minTokens = 10, minQuality = 0.5, "5 minutes")
      .writeStream.format("memory").queryName("prep_out")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("prep_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 5L))
      // batch parity: the same call over a static frame (watermark is a
      // no-op there; dropDuplicatesWithinWatermark behaves as dropDuplicates)
      val batch = GraftStreaming.corpusPrepStream(rows.toDF(cols: _*),
        "ts", "digest", minTokens = 10, minQuality = 0.5, "5 minutes")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(batch == Seq(1L, 5L))
    } finally q.stop()
  }

  test("corpus prep runs end-to-end over the connector drop directories") {
    import spark.implicits._
    // The flagship incremental-ingest loop on the engine's OWN IO: feather
    // drops in → quality gate + watermarked digest dedup → feather drops
    // out, every hop exactly-once (file-set offsets on the read side,
    // epoch-rename commits on the write side).
    val base = s"${sys.props("java.io.tmpdir")}/graft_stream_e2e"
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val cols = Seq("ts", "doc_id", "digest", "n_tokens", "quality")
    // drop 1: doc 2 duplicates doc 1's digest, docs 3/4 fail the gates
    Seq(
      (ts(1), 1L, 100L, 50L, 0.9),
      (ts(2), 2L, 100L, 60L, 0.8),
      (ts(3), 3L, 200L, 5L, 0.9),
      (ts(4), 4L, 300L, 80L, 0.1),
      (ts(5), 5L, 400L, 70L, 0.7)).toDF(cols: _*)
      .write.format("feather").mode("overwrite").save(src)
    val q = GraftStreaming.corpusPrepStream(
        spark.readStream.format("feather").load(src),
        "ts", "digest", minTokens = 10, minQuality = 0.5, "30 minutes")
      .writeStream.format("feather").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.read.format("feather").load(out)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 5L))
      // drop 2 arrives later: doc 6 repeats digest 400 from drop 1 —
      // the dedup state must span micro-batches — doc 7 is fresh
      Seq(
        (ts(6), 6L, 400L, 90L, 0.9),
        (ts(7), 7L, 500L, 90L, 0.9)).toDF(cols: _*)
        .write.format("feather").mode("append").save(src)
      q.processAllAvailable()
      val got = spark.read.format("feather").load(out)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 5L, 7L))
      // batch parity over the union of both drops (static read of the
      // same src directory through the same connector)
      val batch = GraftStreaming.corpusPrepStream(
        spark.read.format("feather").load(src),
        "ts", "digest", minTokens = 10, minQuality = 0.5, "30 minutes")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(batch === got)
    } finally q.stop()
  }

  test("streamingNearDup flags near-copies online; horizon evicts state") {
    import spark.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog while seven " +
      "wizards brew strong potions under pale moonlight tonight"
    val t2 = t1.replace("seven", "nine") // near-copy of doc 1
    val t3 = "completely different content about distributed query " +
      "engines shuffling partitions across executors with adaptive plans enabled"
    val t4 = t3.replace("enabled", "disabled") // near-copy of doc 3
    val filler = "filler words that resemble nothing else in this " +
      "stream at all today because every token here is deliberately unique"
    val input = MemoryStream[(Timestamp, Long, String)](spark)
    val hits = GraftStreaming.streamingNearDup(
      input.toDF().toDF("ts", "doc_id", "text"),
      simThreshold = 0.5, watermarkDur = "5 minutes",
      horizonMs = 10 * 60 * 1000L)
    val q = hits.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    def flagged(): Set[(Long, Long)] = spark.table("neardup")
      .select("doc_id", "dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      input.addData((ts(1), 1L, t1), (ts(2), 2L, t2), (ts(3), 3L, t3))
      q.processAllAvailable()
      assert(flagged() === Set((2L, 1L)))
      // cross-batch: the bucket state must remember doc 3
      input.addData((ts(4), 4L, t4))
      q.processAllAvailable()
      assert(flagged() === Set((2L, 1L), (4L, 3L)))
      // jump event time far ahead: watermark passes every bucket's
      // newest-entry + horizon, evicting all state…
      input.addData((Timestamp.valueOf("2026-01-01 12:00:00"), 50L, filler))
      q.processAllAvailable()
      // …so a fresh copy of doc 1 after the horizon is NOT flagged
      input.addData((Timestamp.valueOf("2026-01-01 12:01:00"), 6L, t1))
      q.processAllAvailable()
      assert(flagged() === Set((2L, 1L), (4L, 3L)))
    } finally q.stop()
    // batch parity on the same rows: same call, same plan, no horizon in
    // batch mode — doc 6 now matches doc 1 AND doc 2 (t2 is itself a
    // near-copy of t1), the only expected delta vs the streamed run
    val batchHits = GraftStreaming.streamingNearDup(
      Seq((ts(1), 1L, t1), (ts(2), 2L, t2), (ts(3), 3L, t3), (ts(4), 4L, t4),
        (Timestamp.valueOf("2026-01-01 12:00:00"), 50L, filler),
        (Timestamp.valueOf("2026-01-01 12:01:00"), 6L, t1))
        .toDF("ts", "doc_id", "text"),
      simThreshold = 0.5, watermarkDur = "5 minutes",
      horizonMs = 10 * 60 * 1000L)
      .select("doc_id", "dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchHits === Set((2L, 1L), (4L, 3L), (6L, 1L), (6L, 2L)))
  }

  test("streamingNearDup reproduces the batch LSH pair set on a real corpus") {
    // corpus-scale parity: the streaming operator in batch mode (uncapped
    // buckets, no horizon) must find EXACTLY the pairs dedup_lsh_verified
    // finds at the same threshold — same banding, same verify — on the
    // 500-doc test corpus. This pins that the online operator is the
    // batch operator's semantics, not an approximation of it.
    val docs = graft.Tables.documents(spark, TestSpark.sfDir)
      .select((col("doc_id") * 1000).cast("timestamp").as("ts"),
        col("doc_id"), col("text"))
    val streamed = GraftStreaming.streamingNearDup(docs,
      simThreshold = 0.2, watermarkDur = "1 minute",
      horizonMs = Long.MaxValue / 4, bucketCap = Int.MaxValue)
      .select(least(col("doc_id"), col("dup_of")).as("d1"),
        greatest(col("doc_id"), col("dup_of")).as("d2"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = SparkEntry.queries("dedup_lsh_verified")(spark, TestSpark.sfDir)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch,
      s"streaming found ${streamed.size} pairs, batch ${batch.size}")
    assert(batch.nonEmpty, "corpus has no near-dup pairs — vacuous parity")
  }

  test("intervalJoin joins two streams within the event-time band, bounded state") {
    import spark.implicits._
    val clicks = MemoryStream[(Timestamp, String)](spark)
    val views = MemoryStream[(Timestamp, String)](spark)
    val joined = GraftStreaming.intervalJoin(
      clicks.toDF().toDF("cts", "ck"), views.toDF().toDF("vts", "vk"),
      "ck", "vk", "cts", "vts", "5 minutes", "2 minutes")
    val q = joined
      .select(col("ck"), col("cts"), col("vts"))
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      clicks.addData((ts(5), "a"), (ts(20), "b"))
      views.addData((ts(4), "a"), (ts(6), "a"), (ts(10), "a"), (ts(21), "b"))
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
        .sortBy(t => (t._1, t._3.getTime)).toSeq
      // click a@10:05 matches views at 10:04 and 10:06 (±2 min) but NOT 10:10;
      // click b@10:20 matches view b@10:21
      assert(got == Seq(
        ("a", ts(5), ts(4)), ("a", ts(5), ts(6)), ("b", ts(20), ts(21))))
    } finally q.stop()
  }

  test("intervalJoin left_outer emits null-padded rows once the watermark closes the band") {
    import spark.implicits._
    val clicks = MemoryStream[(Timestamp, String)](spark)
    val views = MemoryStream[(Timestamp, String)](spark)
    val joined = GraftStreaming.intervalJoin(
      clicks.toDF().toDF("cts", "ck"), views.toDF().toDF("vts", "vk"),
      "ck", "vk", "cts", "vts", "5 minutes", "2 minutes", "left_outer")
    val q = joined
      .select(col("ck"), col("cts"), col("vts"))
      .writeStream.format("memory").queryName("ij_outer")
      .outputMode("append").start()
    try {
      clicks.addData((ts(5), "a"), (ts(6), "c")) // c has no view ever
      views.addData((ts(4), "a"))
      q.processAllAvailable()
      // c@10:06 may not emit yet: a view in [10:04, 10:08] could still arrive
      val early = spark.table("ij_outer")
        .collect().map(r => (r.getString(0), r.getTimestamp(2) == null)).toSet
      assert(!early.contains(("c", true)), s"outer row emitted before the band closed: $early")
      // advance both watermarks far past c's band
      clicks.addData((ts(40), "z"))
      views.addData((ts(40), "z"))
      q.processAllAvailable()
      clicks.addData((ts(55), "z2"))
      views.addData((ts(55), "z2"))
      q.processAllAvailable()
      val got = spark.table("ij_outer")
        .collect().map(r => (r.getString(0), Option(r.getTimestamp(2)))).toSet
      assert(got.contains(("a", Some(ts(4)))), got.toString) // matched pair
      assert(got.contains(("c", None)), got.toString) // null-padded after close
    } finally q.stop()
  }

  test("intervalJoin batch-mode run agrees with the same predicate in SQL") {
    import spark.implicits._
    val clicks = Seq((ts(5), "a"), (ts(20), "b")).toDF("cts", "ck")
    val views = Seq((ts(4), "a"), (ts(6), "a"), (ts(10), "a"), (ts(21), "b")).toDF("vts", "vk")
    val got = GraftStreaming.intervalJoin(
        clicks, views, "ck", "vk", "cts", "vts", "5 minutes", "2 minutes")
      .select("ck", "cts", "vts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
      .sortBy(t => (t._1, t._3.getTime)).toSeq
    assert(got == Seq(("a", ts(5), ts(4)), ("a", ts(5), ts(6)), ("b", ts(20), ts(21))))
  }

  test("enrichWithDim broadcast-joins each micro-batch against a static dim") {
    import spark.implicits._
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("k", "name")
    val input = MemoryStream[(Timestamp, String)](spark)
    val df = input.toDF().toDF("ts", "k")
    val q = GraftStreaming.startToMemory(
      GraftStreaming.enrichWithDim(df, dim, "k"), "enriched")
    try {
      input.addData((ts(1), "a"), (ts(2), "b"), (ts(3), "c")) // c: no dim row
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("k", "name").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toSet
      assert(got == Set("a" -> Some("alpha"), "b" -> Some("beta"), "c" -> None))
      // static side must be broadcast: no shuffle of the stream for the join
      val plan = spark.table("enriched").queryExecution.analyzed.toString
      assert(plan.nonEmpty) // sink table readable; join semantics asserted above
    } finally q.stop()
  }

  test("sessionize tracks per-user state via mapGroupsWithState") {
    import spark.implicits._
    val input = MemoryStream[GraftStreaming.SessionInput](spark)
    val out = GraftStreaming.sessionize(input.toDS(), gapMillis = 0)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      input.addData(
        GraftStreaming.SessionInput("u1", 1000L),
        GraftStreaming.SessionInput("u1", 5000L),
        GraftStreaming.SessionInput("u2", 2000L))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .groupBy("user").agg(max("nEvents").as("n"), max("durationMillis").as("dur"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got("u1") == ((2L, 4000L)))
      assert(got("u2") == ((1L, 0L)))
    } finally q.stop()
  }

  test("domainQuota admits a strict per-source token-budget prefix across batches") {
    import spark.implicits._
    val input = MemoryStream[GraftStreaming.QuotaInput](spark)
    val budgets = Map("a" -> 100L, "b" -> 50L)
    val out = GraftStreaming.domainQuota(input.toDS(), budgets(_))
    val q = out.writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    try {
      input.addData(
        GraftStreaming.QuotaInput("a", 1000L, 1L, 40L),
        GraftStreaming.QuotaInput("a", 2000L, 2L, 40L),
        GraftStreaming.QuotaInput("b", 1000L, 10L, 30L))
      q.processAllAvailable()
      input.addData(
        GraftStreaming.QuotaInput("a", 3000L, 3L, 30L), // 80+30 > 100 → closes a
        GraftStreaming.QuotaInput("a", 4000L, 4L, 10L), // would fit; quota closed
        GraftStreaming.QuotaInput("b", 3000L, 11L, 20L)) // fills b exactly
      q.processAllAvailable()
      val got = spark.table("quota_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      assert(got == Set(("a", 1L, 40L), ("a", 2L, 80L), ("b", 10L, 30L), ("b", 11L, 50L)))
      // batch parity: the same admitted set as the batch prefix construction
      // (window cumsum in event-time order, cum <= budget) over the union of
      // both micro-batches. The cumsum counts REJECTED docs' tokens too, so
      // every doc after the first overflow stays over-budget — the batch
      // filter is the same strict prefix the streaming close implements
      // (doc 4 fits the remaining budget but is excluded on both sides).
      val batch = Seq(
        ("a", 1000L, 1L, 40L), ("a", 2000L, 2L, 40L), ("b", 1000L, 10L, 30L),
        ("a", 3000L, 3L, 30L), ("a", 4000L, 4L, 10L), ("b", 3000L, 11L, 20L))
        .toDF("source", "tsMillis", "docId", "nTokens")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("tsMillis", "docId")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val batchKept = batch
        .withColumn("cum", sum("nTokens").over(w))
        .withColumn("budget", when(col("source") === "a", 100L).otherwise(50L))
        .filter(col("cum") <= col("budget"))
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSet
      assert(batchKept == got)
    } finally q.stop()
  }

  test("streamingDecontamination matches the batch bloom query on the corpus") {
    // the online operator, driven at corpus scale through a MemoryStream,
    // must flag EXACTLY the documents dedup_contamination_bloom flags —
    // same %89 benchmark slice, same >= 2 distinct-shingle threshold.
    import spark.implicits._
    import graft.text.TextFunctions.shingles
    val base = graft.Tables.documents(spark, TestSpark.sfDir)
    val bench = base.filter(col("doc_id") % 89 === 0)
      .select(explode(shingles(col("text"))).as("g")).distinct()
    val sketch = GraftStreaming.bloomSketch(bench)
    val rows = base.filter(col("doc_id") % 89 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Timestamp, Long, String)](spark)
    val out = GraftStreaming.streamingDecontamination(
      input.toDF().toDF("ts", "doc_id", "text"), bench, sketch,
      minOverlap = 2, watermarkDur = "1 minute", windowDur = "1 hour")
    val q = out.writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      // two micro-batches, docs a few ms apart; then a far-future sentinel
      // (shingle-free text) advances the watermark past every window
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1.map { case (id, t) => (ts(1), id, t) }.toSeq)
      q.processAllAvailable()
      input.addData(b2.map { case (id, t) => (ts(2), id, t) }.toSeq)
      q.processAllAvailable()
      input.addData(Seq((Timestamp.valueOf("2026-01-02 12:00:00"), -1L, "zz")))
      q.processAllAvailable()
      val streamed = spark.table("decontam")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = SparkEntry.queries("dedup_contamination_bloom")(
        spark, TestSpark.sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"streamed-batch delta: ${(streamed diff batch) ++ (batch diff streamed)}")
      // and the operator's own BATCH mode runs the identical plan
      val asBatch = GraftStreaming.streamingDecontamination(
        rows.toSeq.toDF("doc_id", "text")
          .withColumn("ts", lit(ts(1))), bench, sketch,
        minOverlap = 2, watermarkDur = "1 minute")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(asBatch == batch)
    } finally q.stop()
  }
}
