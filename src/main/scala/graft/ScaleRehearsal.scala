package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: runs the dedup/ANN family at sf0.1 and at a synthetic
  * 10× corpus ("sf1"), printing per-query seconds — the empirical check
  * that the claimed linear-in-N candidate bounds hold (≤ ~10× wall-time at
  * 10× rows). Results are recorded in SCALE.md.
  *
  * The 10× corpus is NOT ten verbatim copies: duplicating rows would
  * multiply the near-dup rate tenfold and turn the rehearsal into a
  * different (pathological) workload. Instead each copy k applies a
  * per-copy CHARACTER BIJECTION (alphabet rotated by k) to the text — a
  * bijective map preserves every within-copy relationship exactly (exact
  * duplicates stay exact, shingle-Jaccard similarities are invariant,
  * token/shingle counts unchanged) while making cross-copy text disjoint
  * at the vocabulary level, so the per-document near-dup rate of the
  * scaled corpus matches sf0.1. Embeddings rotate dimensions cyclically
  * per copy (an isometry — within-copy cosine structure invariant).
  *
  * Usage: runMain graft.ScaleRehearsal [outDir] [mode]
  *   mode ∈ dedup|ordered|joins|cc|skew|io|sketch|ingest|compaction|
  *          mutation|cluster|manifest|planning|overlap|dv|dvmerge|
  *          inccluster|parquet|preddml|replovr|copyinto|all;
  *   builds <outDir>/sf1/{documents,embeddings}.parquet from
  *   /root/testdata/sf0.1, then times the family at both scales.
  */
object ScaleRehearsal {

  val Family: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_ppjoin",
    "dedup_embedding_cosine", "dedup_span_ngrams", "dedup_simhash",
    "dedup_connected_components", "dedup_cluster_best", "sim_lsh_buckets",
    "sim_ivfpq_search", "dedup_semantic",
    // text-analysis tier: scan-fused or single-shuffle — expected ~linear
    "text_lang_id", "text_quality", "text_fasttext_score",
    "text_fingerprint", "text_gopher_rules", "text_token_budget_pack")

  /** The ordered/window tier (r8 ask #7): these ride the OrderedOps
    * block-replication constructions that carry the engine's global-order
    * contract — their claimed shuffle-bounded behavior gets the same
    * measured 10× evidence as the dedup tier. Inputs are orders/lineitem,
    * scaled by key-shifted copies (order statistics preserved per copy;
    * the global window genuinely spans 10× rows). */
  val OrderedFamily: Seq[String] = Seq(
    "win_global_cumsum", "win_global_rolling", "idx_global_ffill",
    "sort_multi_nulls", "win_topk_per_group")

  /** The custom-join tier: as-of (union+window), range (bucketized
    * equi-join), skew-salted. Inputs scale by key-shifted events (user
    * series replicate disjointly — per-key window sizes preserved, 10×
    * the keys) and consistently-shifted lineitem.l_suppkey ↔
    * supplier.s_suppkey. */
  val JoinFamily: Seq[String] = Seq(
    "join_asof", "join_asof_nearest", "join_range_bucketed", "join_skew_salted")

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  def buildScaled(spark: SparkSession, srcDir: String, outDir: String,
                  copies: Int): Unit = {
    val docs = Tables.documents(spark, srcDir)
    val embs = Tables.embeddings(spark, srcDir)
    val docN = docs.count()
    val embN = embs.count()
    val scaledDocs = (0 until copies).map { k =>
      val rot = alpha.drop(k % 26) + alpha.take(k % 26)
      docs.select(
        (col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
        translate(col("text"), alpha, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    val dim = embs.select(size(col("embedding"))).first().getInt(0)
    val scaledEmbs = (0 until copies).map { k =>
      val shift = k % dim
      // cyclic dimension rotation: slice+concat, an exact isometry
      embs.select(
        (col("vec_id") + lit(k * 10_000_000L)).as("vec_id"),
        concat(
          slice(col("embedding"), shift + 1, dim - shift),
          slice(col("embedding"), 1, shift)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    scaledDocs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaledEmbs.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[scale] built ${docN * copies} docs / ${embN * copies} embeddings at $outDir")
  }

  /** Key-shifted copies of orders/lineitem for the ordered/window tier:
    * each copy offsets its join/sort keys by k·10⁷ so keys stay unique and
    * the copies occupy disjoint, consecutive key ranges — the global
    * ORDER BY genuinely spans 10× rows (block-replicated OrderedOps must
    * carry boundary state across 10× the range blocks). */
  def buildScaledRelational(spark: SparkSession, srcDir: String, outDir: String,
                            copies: Int): Unit = {
    val shift = (k: Int) => lit(k * 10_000_000L)
    (0 until copies).map { k =>
      Tables.orders(spark, srcDir)
        .withColumn("o_orderkey", col("o_orderkey") + shift(k))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    (0 until copies).map { k =>
      Tables.lineitem(spark, srcDir)
        .withColumn("l_orderkey", col("l_orderkey") + shift(k))
        .withColumn("l_suppkey", col("l_suppkey") + shift(k))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    // suppkeys shift consistently with lineitem so the join fans out the
    // same per copy; events shift (user_id, event_id) so each copy is a
    // disjoint block of user series with identical per-key window sizes
    (0 until copies).map { k =>
      Tables.supplier(spark, srcDir)
        .withColumn("s_suppkey", col("s_suppkey") + shift(k))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
    // RAW events file, not Tables.events: the loader derives ts/ts_ns from
    // the stored nanos column, so the scaled copy must carry the raw shape
    // (the nanos read back as a plain long — same loader arithmetic)
    (0 until copies).map { k =>
      Tables(spark, srcDir, "events")
        .withColumn("event_id", col("event_id") + shift(k))
        .withColumn("user_id", col("user_id") + shift(k))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
  }

  /** FULL sf1 dataset for the whole-suite bench rehearsal: every table
    * ×10 with CONSISTENTLY shifted keys, so joins fan out exactly as at
    * sf0.1 (each copy is a disjoint key universe: orders↔lineitem,
    * orders↔customer, lineitem↔part/supplier all stay 1:N with the same
    * N). The tiny dims (nation, region) copy as-is — their keys are the
    * unshifted c_nationkey/s_nationkey targets. Documents/embeddings
    * come from [[buildScaled]] (perturbed copies — verbatim replicas
    * would multiply the near-dup rate tenfold and turn the dedup tier
    * into a different workload). Usage:
    * `runMain graft.ScaleRehearsal <outDir> bench1` then
    * `SPARK_GRAFT_SF_DIR=<outDir>/sf1full runMain graft.Bench`. */
  def buildFullSf1(spark: SparkSession, srcDir: String, outDir: String,
                   copies: Int = 10): Unit = {
    val shift = (k: Int) => lit(k * 10_000_000L)
    def scaled(table: String, keyCols: Seq[String]): Unit =
      (0 until copies).map { k =>
        keyCols.foldLeft(Tables(spark, srcDir, table)) { (df, c) =>
          df.withColumn(c, col(c) + shift(k)) }
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    scaled("orders", Seq("o_orderkey", "o_custkey"))
    scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scaled("customer", Seq("c_custkey"))
    scaled("part", Seq("p_partkey"))
    scaled("supplier", Seq("s_suppkey"))
    scaled("events", Seq("event_id", "user_id"))
    Seq("nation", "region").foreach(t =>
      Tables(spark, srcDir, t).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet"))
    buildScaled(spark, srcDir, outDir, copies)
    println(s"[scale] full sf1 dataset at $outDir")
  }

  /** Skew-payoff demo: the registered `join_skew_salted` query runs on
    * organic (unskewed) data where Spark broadcasts the dim and salt is
    * moot — the honest measurement of WHY SkewJoin exists needs (a) a
    * corpus with a genuinely hot key (50% of 10×-scaled lineitem lands on
    * one suppkey) and (b) broadcast + AQE-skew mitigation disabled, i.e.
    * the regime where the dim is too big to broadcast and the engine
    * must shuffle — there a plain join funnels the hot key through ONE
    * task while salting spreads it over `saltFactor`. Both variants are
    * asserted row-identical before timing. */
  def skewDemo(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val hot = 7L
    (0 until 20).map { k =>
      Tables.lineitem(spark, srcDir)
        .withColumn("l_orderkey", col("l_orderkey") + lit(k * 10_000_000L))
        .withColumn("l_suppkey",
          when(col("l_orderkey") % 10 < 9, lit(hot)).otherwise(col("l_suppkey")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    Tables.supplier(spark, srcDir)
      .write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      // AQE coalesce would merge the whole 12M-row shuffle into a couple
      // of partitions at this data size, hiding the hot-key imbalance the
      // demo measures (it did: both variants read ~12M records in one
      // task until this was pinned off)
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, outDir)
        .withColumn("s_suppkey", col("l_suppkey"))
        .select("s_suppkey", "l_orderkey", "l_quantity")
      val dim = Tables.supplier(spark, outDir).select("s_suppkey", "s_nationkey")
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("s_nationkey")).agg(
          count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val plainDf = agg(fact.join(dim, Seq("s_suppkey")))
      val saltedDf = agg(graft.ops.SkewJoin.saltedInnerJoin(
        fact, dim, "s_suppkey", factIdCol = "l_orderkey", saltFactor = 32))
      require(plainDf.exceptAll(saltedDf).isEmpty &&
        saltedDf.exceptAll(plainDf).isEmpty, "salted join must be row-identical")
      def t(df: org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      def med3(df: org.apache.spark.sql.DataFrame): Double =
        Seq(t(df), t(df), t(df)).sorted.apply(1)
      def joinKind(df: org.apache.spark.sql.DataFrame): String =
        Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
          .filter(df.queryExecution.executedPlan.toString.contains).mkString("+")
      // per-task shuffle-read balance: the metric that IS the wall-clock on
      // a real cluster (one executor sorting the hot partition while the
      // fleet idles). Captured via listener across one run of the job.
      val maxRecords = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            maxRecords.getAndUpdate(v => math.max(v, m.shuffleReadMetrics.recordsRead))
        }
      }
      def maxTask(df: org.apache.spark.sql.DataFrame): Long = {
        maxRecords.set(0)
        spark.sparkContext.addSparkListener(listener)
        try { df.write.format("noop").mode("overwrite").save() }
        finally {
          // listener events are async; a short drain keeps the max stable
          Thread.sleep(500)
          spark.sparkContext.removeSparkListener(listener)
        }
        maxRecords.get()
      }
      t(plainDf); t(saltedDf) // warm both plans
      val plain = med3(plainDf)
      val salted = med3(saltedDf)
      val plainMax = maxTask(plainDf)
      val saltedMax = maxTask(saltedDf)
      // third variant: AQE's runtime skew-join mitigation on the PLAIN
      // join. Out of the box it DECLINES here — the downstream groupBy
      // needs hash partitioning, and OptimizeSkewedJoin won't split a
      // skewed partition when that would add a shuffle (plus the byte
      // threshold is sized for clusters, not this corpus) — so the split
      // must be forced and the threshold lowered. That asymmetry is the
      // point of keeping SkewJoin: salting is a plan-level fix that works
      // for any join strategy and downstream layout; AQE is a runtime
      // mitigation with engagement conditions.
      val aqeConfs = Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m")
      val aqeOlds = aqeConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
      aqeConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      val (aqe, aqeMax) =
        try { t(plainDf); (med3(plainDf), maxTask(plainDf)) }
        finally aqeOlds.foreach { case (k, o) =>
          o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      println(f"""{"skew_demo":"hot_key_90pct_20x","plain_sec":$plain%.2f,"salted_sec":$salted%.2f,"aqe_forced_sec":$aqe%.2f,"plain_max_task_records":$plainMax,"salted_max_task_records":$saltedMax,"aqe_max_task_records":$aqeMax,"balance_gain":${plainMax.toDouble / saltedMax}%.1f,"plain_join":"${joinKind(plainDf)}","salted_join":"${joinKind(saltedDf)}"}""")
    } finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** IO tier: the hand-rolled sources (GraftAvro, GraftFeather) against
    * parquet on the documents corpus at sf0.1 and 10× — write wall, read
    * wall, and read-task parallelism. The scale claims under test: both
    * custom sinks write one part per partition (so writes parallelize like
    * parquet), and both readers SPLIT (sync-marker ranges / footer-indexed
    * batches), so reads never serialize into one task even on few files. */
  def ioTier(spark: SparkSession, srcDir: String, sf1Dir: String): Unit = {
    def med3(f: () => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      Seq(once(), once(), once()).sorted.apply(1)
    }
    for ((tag, dir) <- Seq("sf01" -> srcDir, "sf1" -> sf1Dir)) {
      val docs = Tables.documents(spark, dir)
      val out = s"target/scale/io_$tag"
      docs.write.format("noop").mode("overwrite").save() // warm the scan
      val wp = med3(() => docs.write.mode("overwrite").parquet(s"$out/p"))
      val wa = med3(() => graft.io.GraftAvro.write(docs, s"$out/a", overwrite = true))
      val wf = med3(() => graft.io.GraftFeather.write(docs, s"$out/f", overwrite = true))
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val rp = med3(() => noop(spark.read.parquet(s"$out/p")))
      // small maxSplitBytes so split reads engage at this corpus size,
      // mirroring what 128MB defaults do to multi-GB files
      val ra = med3(() => noop(graft.io.GraftAvro.read(spark, s"$out/a",
        maxSplitBytes = 4L << 20)))
      val rf = med3(() => noop(graft.io.GraftFeather.read(spark, s"$out/f",
        maxSplitBytes = 4L << 20)))
      val tasksA = graft.io.GraftAvro.read(spark, s"$out/a",
        maxSplitBytes = 4L << 20).rdd.getNumPartitions
      val tasksF = graft.io.GraftFeather.read(spark, s"$out/f",
        maxSplitBytes = 4L << 20).rdd.getNumPartitions
      println(f"""{"io_tier":"$tag","write_parquet_sec":$wp%.2f,"write_avro_sec":$wa%.2f,"write_feather_sec":$wf%.2f,"read_parquet_sec":$rp%.2f,"read_avro_sec":$ra%.2f,"read_feather_sec":$rf%.2f,"avro_read_tasks":$tasksA,"feather_read_tasks":$tasksF}""")
    }
  }

  /** Streaming-connector ingest tier: drains an N-file drop backlog
    * through readStream(feather) → feather sink at N and 10N files, with
    * maxFilesPerTrigger=10 admission control. Per-batch cost is planning
    * + epoch commit + the data itself; batches scale linearly in file
    * count, so wall time should too (≤ ~10× at 10× files). The file-set
    * offset grows with TOTAL processed files — the documented bound —
    * and this measures its practical cost at hundreds of files. */
  def ingestTier(spark: SparkSession, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val results = Seq(20, 200).map { n =>
      val src = s"$out/ingest_src_$n"
      val dst = s"$out/ingest_dst_$n"
      val ckpt = s"$out/ingest_ckpt_$n"
      Seq(src, dst, ckpt).foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(d), true))
      // the backlog: n one-part drops of 2000 rows each, landed BEFORE
      // the stream starts (the restart-after-downtime shape)
      (0 until n).foreach { k =>
        spark.range(k * 2000L, (k + 1) * 2000L)
          .select(col("id"), concat(lit("doc_"), col("id")).as("s"))
          .repartition(1).write.format("feather")
          .mode(if (k == 0) "overwrite" else "append").save(src)
      }
      val t0 = System.nanoTime()
      val q = spark.readStream.format("feather")
        .option("maxFilesPerTrigger", "10").load(src)
        .writeStream.format("feather").option("path", dst)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.count(_.numInputRows > 0)
      val rows = spark.read.format("feather").load(dst).count()
      require(rows == n * 2000L, s"expected ${n * 2000L} rows, got $rows")
      println(f"""{"ingest_files":$n,"drain_sec":$secs%.2f,"nonempty_batches":$batches,"rows":$rows}""")
      (n, secs)
    }
    val ratio = results(1)._2 / results(0)._2
    println(f"""{"ingest_tier":"feather","files_ratio":10,"wall_ratio":$ratio%.2f}""")
  }

  /** Compaction tier: the small-file maintenance path at file counts the
    * per-trigger sinks actually produce. Batch: 200 vs 2000 one-batch parts
    * bin-packed to ~1% of the file count — wall should scale ~linearly in
    * TOTAL BYTES (the rewrite is one streaming pass), not quadratically in
    * file count; row identity is required, not sampled. Streaming: a
    * 1200-file backlog drained with `seenCompactThreshold` 256 must leave a
    * COMPACTED offset in Spark's real checkpoint log — the artifact proves
    * the 10⁵-file bound documented in r9 is implemented, not aspirational:
    * the final offset JSON carries a log reference plus a bounded tail
    * instead of every name seen. */
  def compactionTier(spark: SparkSession, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val results = Seq(200, 2000).map { n =>
      val dir = s"$out/compact_$n"
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      spark.range(n * 1000L)
        .select(col("id"), concat(lit("doc_"), col("id")).as("s"))
        .repartition(n, col("id"))
        .write.format("feather").mode("overwrite").save(dir)
      val rowsBefore = spark.read.format("feather").load(dir).count()
      val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.getPath.getName.endsWith(".feather")).map(_.getLen).sum
      val target = math.max(1L, totalBytes * 100 / n) // ~n/100 outputs
      val t0 = System.nanoTime()
      val r = graft.io.FeatherCompact.compact(spark, dir, targetBytes = target)
      val secs = (System.nanoTime() - t0) / 1e9
      require(r.filesBefore == n, s"expected $n inputs, saw $r")
      require(r.filesAfter <= n / 50, s"no real reduction: $r")
      val rowsAfter = spark.read.format("feather").load(dir).count()
      require(rowsAfter == rowsBefore, s"rows $rowsBefore -> $rowsAfter")
      println(f"""{"compact_files":$n,"files_after":${r.filesAfter},"sec":$secs%.2f,"rows":$rowsAfter}""")
      (n, secs)
    }
    println(f"""{"compaction_tier":"feather","files_ratio":10,"wall_ratio":${results(1)._2 / results(0)._2}%.2f}""")

    // streaming: 1200-file backlog, offsets must compact inside the REAL
    // checkpointed offset log (not just the unit-test harness)
    val src = s"$out/off_src"; val dst = s"$out/off_dst"; val ckpt = s"$out/off_ckpt"
    Seq(src, dst, ckpt).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    spark.range(1200L * 100)
      .select(col("id"), concat(lit("d_"), col("id")).as("s"))
      .repartition(1200, col("id"))
      .write.format("feather").mode("overwrite").save(src)
    spark.conf.set("spark.graft.streaming.seenCompactThreshold", "256")
    try {
      val q = spark.readStream.format("feather")
        .option("maxFilesPerTrigger", "100").load(src)
        .writeStream.format("feather").option("path", dst)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.read.format("feather").load(dst).count()
      require(rows == 1200L * 100, s"expected ${1200L * 100} rows, got $rows")
      val offsetsDir = new java.io.File(s"$ckpt/offsets")
      val latest = offsetsDir.listFiles()
        .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toInt)
      val text = new String(
        java.nio.file.Files.readAllBytes(latest.toPath), "UTF-8")
      require(text.contains("\"log\""),
        s"final offset is not compacted (len ${text.length})")
      // 1200 inline file URIs would be ~80 KB; the compacted form carries
      // a log path + <=256 inline names
      require(text.length < 40000,
        s"compacted offset unexpectedly large: ${text.length}")
      println(f"""{"offset_backlog_files":1200,"final_offset_bytes":${text.length},"compacted":true,"rows":$rows}""")
    } finally spark.conf.unset("spark.graft.streaming.seenCompactThreshold")
  }

  /** Pathological connected-components input (r8 ask #8): a CHAIN graph of
    * n vertices has diameter n. With pointer doubling (r9) the chain
    * CONVERGES in ~log2(n) rounds at the default cap — timed at n and 10n
    * to pin the per-round O(|edges|+|V|) cost model — and the loud-failure
    * contract is pinned separately with a cap far below the log bound. */
  def ccPathological(spark: SparkSession, sizes: Seq[Long]): Unit = {
    sizes.foreach { n =>
      val chain = spark.range(n - 1)
        .select(col("id").as("d1"), (col("id") + 1).as("d2"))
      val t0 = System.nanoTime()
      val labels = graft.ops.ConnectedComponents.minLabel(chain)
      val distinct = labels.select("label").distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      require(distinct == 1L, s"a chain is ONE component, got $distinct labels")
      val failed =
        // contraction off: the loud-failure contract is about the
        // ROUND CAP, and local union-find would collapse the chain
        // before the cap could bite
        try { graft.ops.ConnectedComponents.minLabel(chain, maxIters = 4,
                localContract = false)
              .write.format("noop").mode("overwrite").save(); false }
        catch { case _: IllegalStateException => true }
      require(failed, s"cap 4 on a $n-vertex chain MUST fail loudly")
      println(f"""{"cc_chain_n":$n,"converged_sec":$secs%.2f,"one_component":true,"tiny_cap_loud_failure":true}""")
    }
  }

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val s = (System.nanoTime() - t0) / 1e9
    graft.ops.OrderedOps.clearPins()
    s
  }

  private def runFamily(spark: SparkSession, family: Seq[String],
                        src: String, sf1: String, tag: String): Unit = {
    // warmup: absorb JIT/codegen on one family member per scale
    time(spark, family.head, src)
    time(spark, family.head, sf1)
    val rows = family.map { q =>
      val t01 = time(spark, q, src)
      val t1 = time(spark, q, sf1)
      println(f"""{"query":"$q","sf01_sec":$t01%.2f,"sf1_sec":$t1%.2f,"ratio":${t1 / t01}%.2f}""")
      (q, t01, t1)
    }
    val tot01 = rows.map(_._2).sum
    val tot1 = rows.map(_._3).sum
    println(f"""{"family":"$tag","total_sf01_sec":$tot01%.2f,"total_sf1_sec":$tot1%.2f,"ratio":${tot1 / tot01}%.2f}""")
  }

  /** The sketch-prune tier (r10): bloom decontamination and CMS heavy
    * hitters. Both are two-pass (sketch build, then pruned exact confirm)
    * with fixed-size sketch state, so wall time should track corpus bytes
    * ~linearly and the candidate/confirm stages must stay bounded. */
  val SketchFamily: Seq[String] = Seq(
    "dedup_contamination_bloom", "text_heavy_hitters_cms")

  /** Usage: runMain graft.ScaleRehearsal [outDir]
    * [dedup|ordered|joins|cc|skew|io|ingest|compaction|sketch|all] */
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/scale")
    val mode = args.drop(1).headOption.getOrElse("all")
    // a typo'd mode must not run ZERO tiers and exit 0 — that reads as
    // "rehearsal passed" when nothing was measured
    val validModes = Set("dedup", "ordered", "joins", "cc", "skew", "io",
      "sketch", "ingest", "compaction", "mutation", "cluster", "manifest",
      "planning", "overlap", "dv", "dvmerge", "inccluster", "parquet",
      "preddml", "replovr", "copyinto", "facedml", "pqread", "bench1",
      "all")
    require(validModes(mode),
      s"unknown mode '$mode' (one of ${validModes.toSeq.sorted.mkString("|")})")
    val src = "/root/testdata/sf0.1"
    val sf1 = s"$out/sf1"
    val spark = GraftSession.build("graft-scale")
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "bench1")
      // build only — the 3-rep sweep itself is
      // SPARK_GRAFT_SF_DIR=<out>/sf1full runMain graft.Bench (one JVM,
      // the same warmup + med-of-3 discipline the driver uses)
      buildFullSf1(spark, src, s"$out/sf1full")
    if (mode == "all" || mode == "dedup") {
      buildScaled(spark, src, sf1, copies = 10)
      runFamily(spark, Family, src, sf1, "dedup")
    }
    if (mode == "all" || mode == "ordered") {
      buildScaledRelational(spark, src, sf1, copies = 10)
      runFamily(spark, OrderedFamily, src, sf1, "ordered")
    }
    if (mode == "all" || mode == "joins") {
      buildScaledRelational(spark, src, sf1, copies = 10)
      runFamily(spark, JoinFamily, src, sf1, "joins")
    }
    if (mode == "all" || mode == "cc")
      ccPathological(spark, Seq(100000L, 1000000L))
    if (mode == "all" || mode == "skew")
      skewDemo(spark, src, s"$out/skew")
    if (mode == "all" || mode == "io") {
      buildScaled(spark, src, sf1, copies = 10)
      ioTier(spark, src, sf1)
    }
    if (mode == "all" || mode == "sketch") {
      buildScaled(spark, src, sf1, copies = 10)
      runFamily(spark, SketchFamily, src, sf1, "sketch")
    }
    if (mode == "all" || mode == "ingest")
      ingestTier(spark, s"$out/ingest")
    if (mode == "all" || mode == "compaction")
      compactionTier(spark, s"$out/compaction")
    if (mode == "all" || mode == "mutation")
      mutationTier(spark, s"$out/mutation")
    if (mode == "all" || mode == "cluster")
      clusterTier(spark, s"$out/cluster")
    if (mode == "all" || mode == "manifest")
      manifestTier(spark, s"$out/manifest")
    if (mode == "all" || mode == "overlap")
      overlapTier(spark, s"$out/overlap")
    if (mode == "all" || mode == "planning")
      planningTier(spark, s"$out/planning")
    if (mode == "all" || mode == "dv")
      dvTier(spark, s"$out/dv")
    if (mode == "all" || mode == "dvmerge")
      dvMergeTier(spark, s"$out/dvmerge")
    if (mode == "all" || mode == "inccluster")
      incClusterTier(spark, s"$out/inccluster")
    if (mode == "all" || mode == "parquet")
      parquetTier(spark, s"$out/parquet")
    if (mode == "all" || mode == "preddml")
      predDmlTier(spark, s"$out/preddml")
    if (mode == "all" || mode == "replovr")
      replaceOverwriteTier(spark, s"$out/replovr")
    if (mode == "all" || mode == "copyinto")
      copyIntoTier(spark, s"$out/copyinto")
    if (mode == "all" || mode == "facedml")
      faceDmlTier(spark, s"$out/facedml")
    if (mode == "all" || mode == "pqread")
      pqReadTier(spark, s"$out/pqread")
    spark.stop()
  }

  /** Face-generic catalog-only DML tier (r19 ask #7): the r18 interop
    * surfaces get the same measured receipt the engine paths carry. A
    * hive-partitioned PARQUET-face table (~8M rows, 8 leaves, several
    * parts per leaf) is driven BY NAME from an extension-free session:
    *
    *  - a partition-pruned COW DELETE must rewrite ONLY the named
    *    leaf's files (every other leaf carried through the manifest
    *    verbatim),
    *  - a scattered graft_dv DELETE must rewrite ZERO data files
    *    (DV sidecars only, bytes ∝ deleted rows),
    *  - a COW MERGE that updates two leaves and inserts a brand-new
    *    partition value must route the inserts to the new leaf inside
    *    the one commit.
    *
    * Wall times print per statement; the structural claims are REQUIREd
    * (a receipt that stopped checking is not a receipt). */
  def faceDmlTier(spark: SparkSession, out: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val n = 8000000L
    val path = s"$out/events"
    graft.io.ParquetTable.write(
      spark.range(n).select(col("id"),
        (col("id") % 8).cast("long").as("day"),
        (col("id") * 3).as("v"),
        concat(lit("p"), col("id") % 977).as("tag"))
        .repartitionByRange(32, col("day"), col("id")),
      path, partitionBy = Seq("day")): Unit
    val root = new org.apache.hadoop.fs.Path(path)
    def snap = graft.sources.FeatherSnapshots.resolve(fs, root, None).get
    def dataFiles(s: graft.sources.FeatherSnapshots.Snapshot) =
      s.files.filterNot(_._1.contains("-empty."))
    val plain = org.apache.spark.sql.graft.Bridge.sessionWithoutExtensions(
      spark, Map(
        "spark.sql.catalog.graft" -> "graft.catalog.GraftCatalog",
        "spark.sql.catalog.graft.warehouse" -> out,
        "spark.sql.catalog.graft_dv" -> "graft.catalog.GraftCatalog",
        "spark.sql.catalog.graft_dv.warehouse" -> out))
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(plain)
    try {
      // 1. partition-pruned COW DELETE by name
      val s0 = snap
      var t0 = System.nanoTime()
      plain.sql("DELETE FROM graft.events WHERE day = 3 AND id % 10 = 7")
      val delSec = (System.nanoTime() - t0) / 1e9
      val s1 = snap
      val removed = dataFiles(s0).map(_._1).toSet --
        dataFiles(s1).map(_._1).toSet
      require(removed.nonEmpty && removed.forall(_.startsWith("day=3/")),
        s"partition-pruned DELETE must touch ONLY day=3: $removed")
      require(dataFiles(s0).filterNot(f => f._1.startsWith("day=3/"))
        .forall(dataFiles(s1).contains),
        "untouched leaves must carry through the manifest verbatim")
      // 2. scattered merge-on-read DELETE by name: zero rewrites
      t0 = System.nanoTime()
      plain.sql("DELETE FROM graft_dv.events WHERE id % 1009 = 13")
      val dvSec = (System.nanoTime() - t0) / 1e9
      val s2 = snap
      require(dataFiles(s2).map(_._1).toSet ==
        dataFiles(s1).map(_._1).toSet,
        "a delta DELETE must rewrite ZERO data files")
      val dvBytes = s2.dvs.values.map { case (rel, _) =>
        fs.getFileStatus(new org.apache.hadoop.fs.Path(root, rel)).getLen
      }.sum
      // 3. COW MERGE: update two leaves, insert a NEW partition value
      t0 = System.nanoTime()
      plain.sql("MERGE INTO graft.events t USING " +
        s"(SELECT id * 16 AS id, CAST(8 AS LONG) AS day, " +
        s"CAST(-1 AS LONG) AS v, 'merged' AS tag " +
        s"FROM range(0, 600000)) s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT (id, day, v, tag) " +
        "VALUES (s.id, s.day, s.v, s.tag)")
      val mrgSec = (System.nanoTime() - t0) / 1e9
      val s3 = snap
      require(dataFiles(s3).exists(_._1.startsWith("day=8/")),
        "NOT MATCHED inserts must route to the new day=8 leaf")
      val count = plain.sql("SELECT count(*) FROM graft.events")
        .head().getLong(0)
      val expect = {
        val afterDel = (0L until n).count(i =>
          !(i % 8 == 3 && i % 10 == 7) && i % 1009 != 13).toLong
        val live = (0L until n).filter(i =>
          !(i % 8 == 3 && i % 10 == 7) && i % 1009 != 13).toSet
        afterDel + (0L until 600000L).map(_ * 16).count(!live(_))
      }
      require(count == expect, s"row count $count != model $expect")
      println(f"""{"facedml_rows":$n,"leaves":8,"files":${dataFiles(s0).size},"pruned_delete_sec":$delSec%.2f,"rewritten_files":${removed.size},"dv_delete_sec":$dvSec%.2f,"dv_bytes":$dvBytes,"merge_sec":$mrgSec%.2f,"final_rows":$count}""")
    } finally {
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  /** Catalog-only parquet BATCH-read tier (r19 ask #1's receipt): the
    * SAME bytes served by the new vectorized scan (clean snapshot) and
    * by the r18 generic row scan (the DV-fallback path, forced with a
    * one-row delete) — the ≥4× single-file criterion, measured, plus
    * the native `spark.read.parquet` reference point. One ~150 MB part
    * so the split planner (not file count) provides the parallelism. */
  def pqReadTier(spark: SparkSession, out: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val n = 8000000L
    def df = spark.range(n).select(col("id"),
      (col("id") * 7 % 1000003).as("k"),
      (col("id") * 13 % 999983).as("k2"),
      (col("id") % 8191).cast("double").as("d1"),
      (col("id") % 127).cast("double").as("d2"),
      concat(lit("payload-"), col("id") % 9973,
        lit("-abcdefghijklmnopqrstuvwxyz")).as("s"))
    Seq("clean", "dv").foreach(t =>
      graft.io.ParquetTable.write(df.coalesce(1), s"$out/$t"): Unit)
    val plain = org.apache.spark.sql.graft.Bridge.sessionWithoutExtensions(
      spark, Map(
        "spark.sql.catalog.graft" -> "graft.catalog.GraftCatalog",
        "spark.sql.catalog.graft.warehouse" -> out,
        "spark.sql.catalog.graft_dv" -> "graft.catalog.GraftCatalog",
        "spark.sql.catalog.graft_dv.warehouse" -> out))
    val prior = SparkSession.getActiveSession
    SparkSession.setActiveSession(plain)
    try {
      // one masked row forces the generic whole-file row scan for the
      // whole snapshot — the exact plan every by-name parquet read got
      // before r19
      plain.sql("DELETE FROM graft_dv.dv WHERE id = 12345")
      def q(tbl: String) =
        "SELECT sum(k) AS sk, sum(k2) AS sk2, sum(d1) AS sd1, " +
          "sum(d2) AS sd2, count(*) AS c, max(length(s)) AS m " +
          s"FROM $tbl WHERE id % 3 > 0"
      def time2(sql: String): (Double, Seq[Any]) = {
        plain.sql(sql).collect() // warm (codegen + footer caches)
        val reps = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val r = plain.sql(sql).collect().head.toSeq
          ((System.nanoTime() - t0) / 1e9, r)
        }
        (reps.map(_._1).min, reps.head._2)
      }
      val (vecSec, vecRow) = time2(q("graft.clean"))
      val (rowSec, rowRow) = time2(q("graft.dv"))
      // id=12345 (the masked row) fails the id%3 filter, so BOTH plans
      // must return identical values — a determinism check on top of
      // the timing
      require(rowRow == vecRow, s"row plan $rowRow != vectorized $vecRow")
      val t0 = System.nanoTime()
      // the exact data part (a bare directory read would choke on the
      // engine's .stats.json sidecars — manifest readers never list)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/clean"))
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      val nat = spark.read.parquet(part.toString)
        .where("id % 3 > 0")
        .selectExpr("sum(k) AS sk", "sum(k2) AS sk2", "sum(d1) AS sd1",
          "sum(d2) AS sd2", "count(*) AS c",
          "max(length(s)) AS m").collect().head.toSeq
      val natSec = (System.nanoTime() - t0) / 1e9
      // values agree (the dv table is one row short on count/sum)
      require(vecRow == nat, s"vectorized $vecRow != native $nat")
      require(rowSec / vecSec >= 4.0,
        f"single-file speedup ${rowSec / vecSec}%.1f× < 4× " +
          f"(vec $vecSec%.2f s, row $rowSec%.2f s)")
      val bytes = fs.getContentSummary(
        new org.apache.hadoop.fs.Path(s"$out/clean")).getLength
    println(f"""{"pqread_rows":$n,"file_bytes":$bytes,"vectorized_sec":$vecSec%.2f,"row_fallback_sec":$rowSec%.2f,"speedup":${rowSec / vecSec}%.1f,"native_sec":$natSec%.2f}""")
    } finally {
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  /** COPY-INTO tier (r15, io/CopyInto): the exactly-once loader's
    * structural claim — an INCREMENTAL batch costs the batch, not the
    * history. A source with N already-ingested files takes a fixed
    * 20-file increment; the increment's wall time and its ledger
    * entry's bytes must stay ~flat as N grows 4× (the ledger is a
    * delta log: per-run entries carry only the batch; only every 16th
    * run pays a checkpoint). REQUIRED: the increment reads exactly 20
    * files at both scales and its ledger delta stays under 16 KB. */
  def copyIntoTier(spark: SparkSession, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val results = Seq(400, 1600).map { n =>
      val table = s"$out/ct_$n"; val src = s"$out/src_$n"
      fs.delete(new org.apache.hadoop.fs.Path(table), true)
      fs.delete(new org.apache.hadoop.fs.Path(src), true)
      spark.range(10).select(col("id"), (col("id") * 2).as("v"))
        .coalesce(1)
        .write.format("feather").mode("overwrite")
        .option("snapshots", "true").save(table)
      // N source files land first (the accumulated history)...
      spark.range(n * 50L)
        .select(col("id"), (col("id") * 3).as("v"))
        .repartition(n).write.mode("append").parquet(src)
      val t0 = System.nanoTime()
      val r0 = graft.io.CopyInto.run(spark, table, src, "parquet")
      val bulkSec = (System.nanoTime() - t0) / 1e9
      require(r0.filesIngested == n, s"bulk load: $r0")
      // ...then the fixed-size increment the nightly job ships
      spark.range(1000).select((col("id") + 10000000L).as("id"),
        lit(0L).as("v")).repartition(20)
        .write.mode("append").parquet(src)
      val t1 = System.nanoTime()
      val r1 = graft.io.CopyInto.run(spark, table, src, "parquet")
      val incSec = (System.nanoTime() - t1) / 1e9
      require(r1.filesIngested == 20 && r1.filesSkipped == n,
        s"increment must read exactly its own files: $r1")
      // a NO-OP re-run isolates the metadata floor (listing + ledger
      // reconstruction + diff) every nightly re-run pays even with
      // nothing new — this is the statement's one O(history) term, and
      // it is the LISTING (you cannot diff what you do not list); the
      // operational answer at scale is per-batch source subdirectories
      // (the ledger is absolute-path-keyed, so pointing each run at its
      // batch's dir keeps listing ∝ batch — CopyIntoSpec's delta-ledger
      // case runs 17 batches from 17 dirs against one ledger)
      val t2 = System.nanoTime()
      val r2 = graft.io.CopyInto.run(spark, table, src, "parquet")
      val noopSec = (System.nanoTime() - t2) / 1e9
      require(r2.filesIngested == 0, s"no-op re-run: $r2")
      // a narrowed source dir pays only its own listing: stage a
      // 20-file batch in a SUBDIR and copy from there — the flat-cost
      // spelling of the same ledger
      spark.range(500).select((col("id") + 20000000L).as("id"),
        lit(1L).as("v")).repartition(20)
        .write.mode("overwrite").parquet(s"$src/batch_b")
      val t3 = System.nanoTime()
      val r3 = graft.io.CopyInto.run(spark, table, s"$src/batch_b",
        "parquet")
      val subdirSec = (System.nanoTime() - t3) / 1e9
      require(r3.filesIngested == 20, s"subdir increment: $r3")
      // the increment's ledger entry is a DELTA: bytes ∝ the batch
      val ledger2 = new org.apache.hadoop.fs.Path(table,
        "_copy/ledger-v00000002.json")
      val deltaBytes = fs.getFileStatus(ledger2).getLen
      require(deltaBytes < 16 * 1024,
        s"the increment's ledger entry must carry only the batch " +
          s"($deltaBytes bytes)")
      (n, bulkSec, incSec, noopSec, subdirSec, deltaBytes)
    }
    println("COPYINTO tier (read work + ledger bytes ∝ batch; the one " +
      "O(history) term is the source LISTING, avoided by per-batch " +
      "subdirs — the ledger is path-keyed across source dirs):")
    results.foreach { case (n, bulk, inc, noop, sub, db) =>
      println(f"  history=$n%5d files bulkLoad=$bulk%6.2fs " +
        f"increment20=$inc%6.2fs noopRerun=$noop%6.2fs " +
        f"subdirIncrement20=$sub%6.2fs ledgerDeltaBytes=$db%6d")
    }
  }

  /** REPLACE-OVERWRITE tier (r15, PredicateMutations.replaceWhere +
    * TableInserts dynamic partition overwrite): the backfill statements'
    * structural claims on day-partitioned parquet tables at two scales
    * (4×) —
    *  (a) a leaf-aligned replaceWhere rewrites exactly the target
    *      leaf's files; every OTHER leaf is byte-identical on disk
    *      (required, not observed), so written bytes ∝ the replaced
    *      slice, not the table;
    *  (b) dynamic INSERT OVERWRITE replaces exactly the leaves the
    *      query's rows land in, same untouched-leaf requirement —
    *      re-running one day's job at 100 TB swaps one day's files. */
  def replaceOverwriteTier(spark: SparkSession, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val days = 20
    def leafFiles(dir: String, day: Int): Set[(String, Long)] = {
      val d = new java.io.File(s"$dir/day=d$day")
      if (!d.isDirectory) Set.empty
      else d.listFiles().filter(f => !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")) // .crc checksum shadows
        .map(f => (f.getName, f.length())).toSet
    }
    def tableBytes(dir: String): Long =
      (0 until days).map(d => leafFiles(dir, d).map(_._2).sum).sum
    def build(dir: String, n: Long): Unit = {
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      graft.io.ParquetTable.write(
        spark.range(n).select(col("id"),
          concat(lit("pay_"), col("id")).as("pay"),
          concat(lit("d"), col("id") % days).as("day"))
          .repartition(col("id") % days),
        dir, partitionBy = Seq("day"))
    }
    val results = Seq(1000000L, 4000000L).map { n =>
      val dir = s"$out/ro_$n"
      build(dir, n)
      val before = (0 until days).map(d => d -> leafFiles(dir, d)).toMap
      val total = tableBytes(dir)
      // (a) leaf-aligned replaceWhere: recompute day d7 and swap it
      val fresh = spark.range(n / days)
        .select((col("id") * days + 7).as("id"),
          concat(lit("redo_"), col("id")).as("pay"), lit("d7").as("day"))
      val t0 = System.nanoTime()
      val r = graft.io.PredicateMutations.replaceWhere(spark, dir, fresh,
        col("day") === "d7")
      val rwSec = (System.nanoTime() - t0) / 1e9
      // the leaf sets above include the .stats.json sidecars (byte-pinned
      // too); the manifest candidate count compares DATA files only
      val d7Data = before(7).count(_._1.endsWith(".parquet"))
      require(r.filesTouched == d7Data,
        s"replaceWhere candidates must be exactly the d7 leaf " +
          s"($d7Data data files): $r")
      (0 until days).filter(_ != 7).foreach { d =>
        require(leafFiles(dir, d) == before(d),
          s"replaceWhere must leave day=d$d byte-identical") }
      val rwNew = leafFiles(dir, 7).map(_._2).sum
      // (b) dynamic INSERT OVERWRITE swapping two days via SQL
      spark.range(n / days)
        .select((col("id") * days + 3).as("id"),
          concat(lit("ow_"), col("id")).as("pay"),
          concat(lit("d"), lit(3) + (col("id") % 2) * 8).as("day"))
        .createOrReplaceTempView("replovr_src") // days d3 and d11
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      val t1 = System.nanoTime()
      try spark.sql(s"INSERT OVERWRITE graft.`$dir` " +
        "SELECT id, pay, day FROM replovr_src").collect(): Unit
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      val ovSec = (System.nanoTime() - t1) / 1e9
      (0 until days).filter(d => d != 3 && d != 7 && d != 11).foreach { d =>
        require(leafFiles(dir, d) == before(d),
          s"dynamic overwrite must leave day=d$d byte-identical") }
      require(leafFiles(dir, 3) != before(3) &&
          leafFiles(dir, 11) != before(11),
        "dynamic overwrite must replace exactly the named leaves")
      val ovNew = leafFiles(dir, 3).map(_._2).sum +
        leafFiles(dir, 11).map(_._2).sum
      (n, total, rwSec, rwNew, ovSec, ovNew)
    }
    println("REPLOVR tier (leaf-aligned backfill: bytes ∝ the replaced " +
      "slice, untouched leaves byte-identical — required, not observed):")
    results.foreach { case (n, total, rw, rwB, ov, ovB) =>
      println(f"  n=$n%8d tableBytes=$total%11d replaceWhere=$rw%6.2fs " +
        f"newBytes=$rwB%9d dynOverwrite=$ov%6.2fs newBytes=$ovB%9d")
    }
  }

  /** PREDICATE-DML tier (r14, PredicateMutations): the structural
    * claims behind DELETE FROM / UPDATE —
    *  (a) a BANDED predicate's COW rewrite touches only the parts whose
    *      stats admit the band (work ∝ selectivity, not table size:
    *      filesTouched must stay ≤2 across a 4× table);
    *  (b) a SCATTERED predicate under the DV spelling writes bytes ∝
    *      deleted rows (data files untouched) where the COW spelling
    *      rewrites every part — the reason both strategies exist. The
    *      scattered predicate is deliberately UNTRANSLATABLE (modulo),
    *      so this also rehearses the no-pruning worst case. */
  def predDmlTier(spark: SparkSession, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataBytes(dir: String): Long =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".feather") &&
          !f.getName.startsWith("_")).map(_.length()).sum
    def build(dir: String, n: Long, parts: Int): Unit = {
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      spark.range(n)
        .select(col("id"), concat(lit("pay_"), col("id")).as("pay"))
        .repartitionByRange(parts, col("id"))
        .write.format("feather").mode("overwrite")
        .option("snapshots", "true").save(dir)
    }
    val results = Seq((10, 1000000L), (40, 4000000L)).map { case (parts, n) =>
      val dir = s"$out/pd_$n"
      build(dir, n, parts)
      // (a) banded COW delete: stats admit the band into ≤2 parts
      val lo = n / 2
      val t0 = System.nanoTime()
      val rd = graft.io.PredicateMutations.deleteWhere(spark, dir,
        col("id").between(lo, lo + 49999L))
      val delSec = (System.nanoTime() - t0) / 1e9
      require(rd.filesTouched <= 2,
        s"banded predicate must touch <=2 of $parts range parts: $rd")
      require(spark.read.format("feather").load(dir).count() == n - 50000L)
      // banded UPDATE at the table head
      val t1 = System.nanoTime()
      val ru = graft.io.PredicateMutations.updateWhere(spark, dir,
        Map("pay" -> concat(lit("upd_"), col("id"))),
        Some(col("id") < 40000L))
      val updSec = (System.nanoTime() - t1) / 1e9
      require(ru.filesTouched <= 2,
        s"banded update must touch <=2 parts: $ru")
      // (b) scattered untranslatable predicate: DV vs COW twin
      val dvDir = s"$out/pd_dv_$n"; val cowDir = s"$out/pd_cow_$n"
      build(dvDir, n, parts); build(cowDir, n, parts)
      val before = dataBytes(dvDir)
      val t2 = System.nanoTime()
      graft.io.PredicateMutations.deleteWhereDV(spark, dvDir,
        col("id") % 1999L === 0L)
      val dvSec = (System.nanoTime() - t2) / 1e9
      require(dataBytes(dvDir) == before,
        "DV predicate delete must not rewrite data files")
      val dvSidecars = new java.io.File(dvDir).listFiles()
        .filter(_.getName.endsWith(".dv")).map(_.length()).sum
      val cowBefore = dataBytes(cowDir)
      val t3 = System.nanoTime()
      val rc = graft.io.PredicateMutations.deleteWhere(spark, cowDir,
        col("id") % 1999L === 0L)
      val cowSec = (System.nanoTime() - t3) / 1e9
      // NEW bytes the rewrite wrote (retired parts stay on disk for
      // time travel until expire() — total dir size would double-count)
      val cowNewBytes = dataBytes(cowDir) - cowBefore
      (n, delSec, updSec, dvSec, dvSidecars, cowSec, cowNewBytes,
        cowBefore, rc.filesTouched)
    }
    println("PREDDML tier (banded COW ∝ selectivity; scattered DV " +
      "bytes ∝ deleted rows vs COW full rewrite):")
    results.foreach { case (n, d, u, dv, dvB, cw, cwB, before, cowTouched) =>
      println(f"  n=$n%8d bandedDelete=$d%6.2fs bandedUpdate=$u%6.2fs " +
        f"scatteredDV=$dv%6.2fs dvSidecarBytes=$dvB%9d " +
        f"scatteredCOW=$cw%6.2fs cowNewBytes=$cwB%11d " +
        f"(table $before%11d, touched $cowTouched)")
    }
  }

  /** DV-MERGE tier (r13, FeatherMutations.mergeDV): the structural
    * claim behind merge-on-read upserts — a scattered 1000-key
    * correction's WRITTEN BYTES scale with the CHANGED ROWS under the
    * DV path but with the TOUCHED FILE BYTES under copy-on-write. Two
    * table scales (4×), the same strided source hitting every part:
    * COW merge bytes must grow ~4×, DV merge bytes must stay flat
    * (one small source part + position sidecars). */
  def dvMergeTier(spark: SparkSession, out: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val results = Seq(8, 32).map { parts =>
      val n = parts * 40000L
      def build(path: String): Unit = {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        fs.delete(p, true)
        spark.range(n)
          .select(col("id"),
            concat(lit("payload_"), col("id") % 1000,
              lit("_padpadpadpadpadpadpadpadpadpadpad")).as("pay"))
          .repartitionByRange(parts, col("id"))
          .write.format("feather").mode("overwrite")
          .option("snapshots", "true").save(path)
      }
      // 1000 strided upserts + 100 inserts: every part is a candidate
      val source = spark.range(1000)
        .select((col("id") * (n / 1000) + 7).as("id"),
          concat(lit("CORRECTED_"), col("id")).as("pay"))
        .unionByName(spark.range(100)
          .select((col("id") + n + 1).as("id"),
            concat(lit("NEW_"), col("id")).as("pay")))
      def newBytes(path: String): Long = {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        val v1 = graft.sources.FeatherSnapshots.read(fs, p, 1L).files.toSet
        val v2 = graft.sources.FeatherSnapshots.read(fs, p, 2L)
        v2.files.filterNot(v1).map(_._2).sum +
          v2.dvs.values.map { case (dvRel, _) =>
            fs.getFileStatus(new org.apache.hadoop.fs.Path(p, dvRel)).getLen
          }.sum
      }
      val cowPath = s"$out/cow_$parts"
      build(cowPath)
      val t0 = System.nanoTime()
      val rc = graft.io.FeatherMutations.merge(spark, cowPath, source,
        Seq("id"))
      val cowSec = (System.nanoTime() - t0) / 1e9
      val cowBytes = newBytes(cowPath)
      val dvPath = s"$out/dv_$parts"
      build(dvPath)
      val t1 = System.nanoTime()
      val rd = graft.io.FeatherMutations.mergeDV(spark, dvPath, source,
        Seq("id"))
      val dvSec = (System.nanoTime() - t1) / 1e9
      val dvBytes = newBytes(dvPath)
      require(rc.filesTouched == parts && rd.filesTouched == parts,
        s"strided keys must touch every part: cow=$rc dv=$rd")
      println(f"""{"dvmerge_parts":$parts,"cow_bytes_written":$cowBytes,"dv_bytes_written":$dvBytes,"cow_sec":$cowSec%.2f,"dv_sec":$dvSec%.2f}""")
      (cowBytes, dvBytes)
    }
    println(f"""{"dvmerge_tier":"merge_on_read_upsert","table_ratio":4,"cow_bytes_ratio":${results(1)._1.toDouble / results(0)._1}%.2f,"dv_bytes_ratio":${results(1)._2.toDouble / results(0)._2}%.2f}""")
  }

  /** INCREMENTAL-OPTIMIZE tier (r13, FeatherCluster incremental=true):
    * the structural claim — a continuously-ingesting table's OPTIMIZE
    * cost scales with NEW data, not table size. Build n rows, full
    * cluster, append n/10, then compare the incremental sweep's
    * rewritten bytes (must ≈ the append) against a full re-cluster's
    * (must ≈ the whole table); pin the band-prune payoff across both
    * generations. */
  def incClusterTier(spark: SparkSession, out: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val n = 2000000L
    val path = s"$out/t"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.delete(p, true)
    spark.range(n)
      .select(col("id"),
        concat(lit("pay_"), col("id") % 997).as("pay"))
      .repartition(16, col("id")) // hash: worst case, nothing prunes
      .write.format("feather").mode("overwrite")
      .option("snapshots", "true").save(path)
    def liveBytes(v: Long): Map[String, Long] =
      graft.sources.FeatherSnapshots.read(fs, p, v).files.toMap
    val t0 = System.nanoTime()
    graft.io.FeatherCluster.cluster(spark, path, Seq("id"),
      targetBytes = 8L << 20)
    val fullSec = (System.nanoTime() - t0) / 1e9
    val vFull = graft.sources.FeatherSnapshots.latestVersion(fs, p).get
    val clusteredBytes = liveBytes(vFull).values.sum
    // a 10% append lands hash-ordered (un-clustered)
    spark.range(n, n + n / 10)
      .select(col("id"), concat(lit("pay_"), col("id") % 997).as("pay"))
      .repartition(2, col("id"))
      .write.format("feather").mode("append").save(path)
    val vApp = graft.sources.FeatherSnapshots.latestVersion(fs, p).get
    val appendBytes = liveBytes(vApp).values.sum - clusteredBytes
    val t1 = System.nanoTime()
    graft.io.FeatherCluster.cluster(spark, path, Seq("id"),
      targetBytes = 8L << 20, incremental = true)
    val incSec = (System.nanoTime() - t1) / 1e9
    val vInc = graft.sources.FeatherSnapshots.latestVersion(fs, p).get
    val before = liveBytes(vApp)
    val incRewritten = liveBytes(vInc).filterNot { case (k, v) =>
      before.get(k).contains(v) }.values.sum
    // the payoff: a banded delete prunes across BOTH generations
    val rd = graft.io.FeatherMutations.deleteByKey(spark, path,
      spark.range(1000, 1200).select(col("id"))
        .unionByName(spark.range(n + 500, n + 600).select(col("id"))),
      Seq("id"))
    val headFiles = graft.sources.FeatherSnapshots.read(fs, p,
      graft.sources.FeatherSnapshots.latestVersion(fs, p).get).files.size
    val t2 = System.nanoTime()
    graft.io.FeatherCluster.cluster(spark, path, Seq("id"),
      targetBytes = 8L << 20) // full run for the cost contrast
    val fullSec2 = (System.nanoTime() - t2) / 1e9
    println(f"""{"inccluster_rows":$n,"table_bytes":$clusteredBytes,"append_bytes":$appendBytes,"incremental_rewritten_bytes":$incRewritten,"full_first_sec":$fullSec%.2f,"incremental_sec":$incSec%.2f,"full_again_sec":$fullSec2%.2f,"banded_delete_touched":${rd.filesTouched},"head_files":$headFiles}""")
  }

  /** PARQUET-FACE tier (r13, GraftParquet/ParquetTable/ParquetCompact):
    * the table tier over the format a 100-TB corpus actually stores.
    * Pins (a) DV-delete bytes flat vs COW's table-proportional bytes on
    * parquet, (b) the BINARY row-group compaction's wall vs a decode
    * rewrite (cluster) of the same files, (c) manifest-planned read
    * wall on the native vectorized scan. */
  def parquetTier(spark: SparkSession, out: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val n = 2000000L
    val parts = 32
    def build(path: String, nParts: Int): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      fs.delete(p, true)
      graft.io.ParquetTable.write(
        spark.range(n)
          .select(col("id"),
            concat(lit("payload_"), col("id") % 1000,
              lit("_padpadpadpadpadpadpadpadpadpadpad")).as("pay"))
          .repartitionByRange(nParts, col("id")), path)
    }
    val keys = spark.range(1000).select((col("id") * (n / 1000) + 7).as("id"))
    // (a) DV vs COW delete bytes
    val cowPath = s"$out/cow"; build(cowPath, parts)
    val p1 = new org.apache.hadoop.fs.Path(cowPath)
    val fs1 = p1.getFileSystem(conf)
    val t0 = System.nanoTime()
    graft.io.FeatherMutations.deleteByKey(spark, cowPath, keys, Seq("id"))
    val cowSec = (System.nanoTime() - t0) / 1e9
    val v1 = graft.sources.FeatherSnapshots.read(fs1, p1, 1L).files.toSet
    val cowBytes = graft.sources.FeatherSnapshots.read(fs1, p1, 2L)
      .files.filterNot(v1).map(_._2).sum
    val dvPath = s"$out/dv"; build(dvPath, parts)
    val p2 = new org.apache.hadoop.fs.Path(dvPath)
    val fs2 = p2.getFileSystem(conf)
    val t1 = System.nanoTime()
    graft.io.FeatherMutations.deleteByKeyDV(spark, dvPath, keys, Seq("id"))
    val dvSec = (System.nanoTime() - t1) / 1e9
    val dvBytes = graft.sources.FeatherSnapshots.read(fs2, p2, 2L)
      .dvs.values.map { case (dvRel, _) =>
        fs2.getFileStatus(new org.apache.hadoop.fs.Path(p2, dvRel)).getLen
      }.sum
    // (b) binary row-group compaction vs decode rewrite of the same data
    val cmpPath = s"$out/cmp"; build(cmpPath, parts)
    val t2 = System.nanoTime()
    val rcmp = graft.io.ParquetCompact.compact(spark, cmpPath,
      targetBytes = 1L << 30)
    val binSec = (System.nanoTime() - t2) / 1e9
    val cluPath = s"$out/clu"; build(cluPath, parts)
    val t3 = System.nanoTime()
    graft.io.FeatherCluster.cluster(spark, cluPath, Seq("id"),
      targetBytes = 1L << 30)
    val decodeSec = (System.nanoTime() - t3) / 1e9
    // (c) manifest-planned filtered read on the native scan
    val t4 = System.nanoTime()
    val cnt = graft.io.ParquetTable.read(spark, dvPath)
      .where(col("id").between(n / 2, n / 2 + 100000)).count()
    val readSec = (System.nanoTime() - t4) / 1e9
    println(f"""{"parquet_rows":$n,"cow_bytes_written":$cowBytes,"dv_bytes_written":$dvBytes,"cow_sec":$cowSec%.2f,"dv_sec":$dvSec%.2f,"binary_compact_sec":$binSec%.2f,"binary_files_after":${rcmp.filesAfter},"decode_cluster_sec":$decodeSec%.2f,"banded_read_sec":$readSec%.2f,"banded_read_rows":$cnt}""")
  }

  /** Deletion-vector tier (r12, io/DeletionVectors.scala): the
    * structural claim behind merge-on-read deletes — a scattered
    * takedown's WRITTEN BYTES scale with the DELETED ROWS under the DV
    * path but with the TOUCHED FILE BYTES under copy-on-write. Two
    * table scales (4×), same 1000 scattered keys hitting every part:
    * COW bytes must grow ~4× (it rewrites every touched part), DV bytes
    * must stay flat (1000 positions is 1000 positions). Real feather
    * tables, real deletes, wall clocks reported for honesty. */
  def dvTier(spark: SparkSession, out: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val results = Seq(8, 32).map { parts =>
      val n = parts * 40000L
      def build(path: String): Unit = {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        fs.delete(p, true)
        spark.range(n)
          .select(col("id"),
            concat(lit("payload_"), col("id") % 1000,
              lit("_padpadpadpadpadpadpadpadpadpadpad")).as("pay"))
          .repartitionByRange(parts, col("id"))
          .write.format("feather").mode("overwrite")
          .option("snapshots", "true").save(path)
      }
      // 1000 scattered keys, strided across the whole domain: every
      // part is a candidate (the worst case for COW, the exact case DV
      // exists for)
      val keys = spark.range(1000)
        .select((col("id") * (n / 1000) + 7).as("id"))
      def dataBytes(path: String, v: Long): Long = {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        graft.sources.FeatherSnapshots.read(fs, p, v).files.map(_._2).sum
      }
      val cowPath = s"$out/cow_$parts"
      build(cowPath)
      val before = dataBytes(cowPath, 1L)
      val t0 = System.nanoTime()
      val rc = graft.io.FeatherMutations.deleteByKey(spark, cowPath,
        keys, Seq("id"))
      val cowSec = (System.nanoTime() - t0) / 1e9
      // COW write cost = the new parts' bytes (v2 files minus carried v1)
      val p1 = new org.apache.hadoop.fs.Path(cowPath)
      val fs1 = p1.getFileSystem(conf)
      val v1 = graft.sources.FeatherSnapshots.read(fs1, p1, 1L).files.toSet
      val cowBytes = graft.sources.FeatherSnapshots.read(fs1, p1, 2L)
        .files.filterNot(v1).map(_._2).sum
      val dvPath = s"$out/dv_$parts"
      build(dvPath)
      val t1 = System.nanoTime()
      val rd = graft.io.FeatherMutations.deleteByKeyDV(spark, dvPath,
        keys, Seq("id"))
      val dvSec = (System.nanoTime() - t1) / 1e9
      val p2 = new org.apache.hadoop.fs.Path(dvPath)
      val fs2 = p2.getFileSystem(conf)
      val dvBytes = graft.sources.FeatherSnapshots.read(fs2, p2, 2L)
        .dvs.values.map { case (dvRel, _) =>
          fs2.getFileStatus(new org.apache.hadoop.fs.Path(p2, dvRel)).getLen
        }.sum
      require(rc.filesTouched == parts && rd.filesTouched == parts,
        s"scattered keys must touch every part: cow=$rc dv=$rd")
      println(f"""{"dv_parts":$parts,"table_bytes":$before,"cow_bytes_written":$cowBytes,"dv_bytes_written":$dvBytes,"cow_sec":$cowSec%.2f,"dv_sec":$dvSec%.2f}""")
      (cowBytes, dvBytes)
    }
    println(f"""{"dv_tier":"merge_on_read","table_ratio":4,"cow_bytes_ratio":${results(1)._1.toDouble / results(0)._1}%.2f,"dv_bytes_ratio":${results(1)._2.toDouble / results(0)._2}%.2f}""")
  }

  /** Overlapping-generations probe tier (r11,
    * io/FeatherMutations.scala): DELIBERATELY overlapping file ranges —
    * generation g holds the STRIDED keys {g, g+gens, g+2·gens, …}, so
    * EVERY generation's every part spans the whole key domain and the
    * overlap depth equals generations × parts-per-generation (the
    * disjoint fast path cannot apply; the probe runs the interval-STAB
    * index — elementary segments + BoundBucket binary search; the
    * pre-r11 shape was a DISTINCT-keys × broadcast-ranges
    * BroadcastNestedLoopJoin). The structural claim: probe wall grows
    * with keys · overlap depth, not keys × files, and stays sub-second
    * while the rewrite cost tracks the (deliberately full) touch set. */
  def overlapTier(spark: SparkSession, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val results = Seq((4, 1000000L), (8, 10000000L)).map { case (gens, n) =>
      val dir = s"$out/ovl_$n"
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      for (g <- 0 until gens)
        spark.range(g.toLong, n, gens.toLong) // strided: spans the WHOLE domain
          .select(col("id"), concat(lit("pay_"), col("id")).as("pay"))
          .repartition(4, col("id"))
          .write.format("feather")
          .mode(if (g == 0) "overwrite" else "append")
          .option("snapshots", "true").save(dir)
      // every file's [min,max] ≈ [g, n): overlap depth = gens × 4
      val keys = spark.range(0, 50L)
        .select((col("id") * (n / 50)).as("id")) // scattered across the domain
      val t0 = System.nanoTime()
      val r = graft.io.FeatherMutations.deleteByKey(spark, dir, keys, Seq("id"))
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.format("feather").load(dir).count()
      require(rows == n - 50, s"rows after overlap delete: $rows")
      // probe-ONLY wall: bloom sidecars + the SAME (now absent, in-range)
      // keys — the stab index and bloom refinement run, zero rewrites
      graft.io.FeatherBloom.build(spark, dir, "id")
      val t1 = System.nanoTime()
      val r2 = graft.io.FeatherMutations.deleteByKey(spark, dir, keys, Seq("id"))
      val probeSec = (System.nanoTime() - t1) / 1e9
      // blooms are advisory at fpp 0.001: 50 keys x 32 files ≈ 1 expected
      // false positive — a touched file or two is the index working as
      // specified, not a pruning failure
      require(r2.filesTouched <= 3,
        s"absent in-range keys must prune to ~zero through blooms: $r2")
      println(f"""{"overlap_rows":$n,"generations":$gens,"files":${gens * 4},"touched":${r.filesTouched},"probe_and_rewrite_sec":$sec%.2f,"probe_only_sec":$probeSec%.2f}""")
      (sec, probeSec)
    }
    println(f"""{"overlap_tier":"interval_stab","table_ratio":10,"wall_ratio":${results(1)._1 / results(0)._1}%.2f,"probe_ratio":${results(1)._2 / results(0)._2}%.2f}""")
  }

  /** Manifest delta-log tier (r11, sources/FeatherSnapshots.scala): the
    * structural claim is that a commit's manifest bytes scale with the
    * CHANGED files, not the table's — the pre-r11 full-file-set-per-
    * version form made every epoch append an O(files) driver JSON write.
    * Synthetic file entries (the manifest layer never opens data files),
    * tables of 10³ and 10⁴ parts, 12 ten-file appends each: per-append
    * manifest bytes must stay flat across the 10× table growth (the
    * every-8th checkpoint is the amortized exception and is reported
    * separately), and head reconstruction stays bounded by the
    * checkpoint chain. */
  def manifestTier(spark: SparkSession, out: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val results = Seq(1000, 10000, 100000).map { parts =>
      val dir = new org.apache.hadoop.fs.Path(s"$out/man_$parts")
      val fs = dir.getFileSystem(conf)
      fs.delete(dir, true)
      fs.mkdirs(dir)
      val base = (0 until parts).map(i => (f"part-$i%06d.feather", 1000L))
      graft.sources.FeatherSnapshots.commit(fs, dir, "overwrite")(_ => base)
      var appendBytes = List.empty[Long]
      var ckptBytes = List.empty[Long]
      val t0 = System.nanoTime()
      // 20 commits: the size rule never fires for tiny deltas against a
      // big table, so exactly ONE chain-cap checkpoint (MaxDeltaChain=16)
      // lands inside the window — its bytes amortize over the commits
      for (k <- 0 until 20) {
        val add = (0 until 10).map(i => (f"epoch-$k%03d-$i%02d.feather", 500L))
        val v = graft.sources.FeatherSnapshots.commit(fs, dir, "append")(
          parent => parent ++ add)
        val mp = new org.apache.hadoop.fs.Path(dir,
          f"_snapshots/v$v%08d.json")
        val len = fs.getFileStatus(mp).getLen
        // classify by CONTENT (a checkpoint carries the "files" list),
        // not by version arithmetic — the cadence is size-aware now
        val in = fs.open(mp)
        val isCkpt =
          try new String(org.apache.hadoop.io.IOUtils
            .readFullyToByteArray(in), "UTF-8").contains("\"files\"")
          finally in.close()
        if (isCkpt) ckptBytes ::= len
        else appendBytes ::= len
      }
      val commitSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val head = graft.sources.FeatherSnapshots.readAll(fs, dir).last
      val readSec = (System.nanoTime() - t1) / 1e9
      require(head.files.size == parts + 200, s"head files: ${head.files.size}")
      val medAppend = appendBytes.sorted.apply(appendBytes.size / 2)
      // checkpoint amortization: the size-aware cadence writes the full
      // list only at the chain cap, so per-commit log cost is
      // median-delta + ckptBytes/period — compare against the pre-r12
      // fixed every-8th cadence's parts-list-every-8 cost
      val amortized = medAppend + ckptBytes.sum / 20
      println(f"""{"manifest_parts":$parts,"append_manifest_bytes_median":$medAppend,"checkpoints_in_20":${ckptBytes.size},"checkpoint_bytes":${ckptBytes.headOption.getOrElse(0L)},"amortized_bytes_per_commit":$amortized,"commits_sec":$commitSec%.2f,"read_all_sec":$readSec%.2f}""")
      (medAppend, amortized)
    }
    println(f"""{"manifest_tier":"delta_log","table_ratio":100,"append_bytes_ratio":${results(2)._1.toDouble / results(0)._1}%.2f,"amortized_ratio":${results(2)._2.toDouble / results(0)._2}%.2f}""")
  }

  /** Connector planning tier (r11): FeatherSource's driver-side planning
    * wall at 10³ / 10⁴ REAL parts — manifest discovery vs listing walk,
    * merged-stats load (one `_stats.json` per directory) vs the
    * per-file-sidecar fallback, and footer split planning (bounded pool,
    * the one honest O(files/pool) term). The merged-stats and manifest
    * paths must grow far slower than the file count; the footer sweep is
    * the term a real 10⁵-part table amortizes across executors via
    * caching/refresh, reported here for honesty. */
  def planningTier(spark: SparkSession, out: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def med3(f: () => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    val results = Seq((1000, 2000000L), (10000, 20000000L)).map {
      case (parts, n) =>
        val dir = s"$out/plan_$parts"
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(conf)
        fs.delete(p, true)
        spark.range(n)
          .select(col("id"), concat(lit("pay_"), col("id")).as("pay"))
          .repartition(parts)
          .write.format("feather").mode("overwrite")
          .option("snapshots", "true").save(dir)
        val discManifest = med3(() =>
          graft.sources.FeatherSnapshots.discoverOrWalk(spark, dir, None,
            graft.sources.FeatherSnapshots.FeatherSuffixes): Unit)
        val fsLocal = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
        val discListing = med3(() =>
          graft.sources.FeatherSnapshots.listDataFiles(fsLocal,
            new org.apache.hadoop.fs.Path(dir)): Unit)
        val files = graft.sources.FeatherSnapshots
          .discoverOrWalk(spark, dir, None,
            graft.sources.FeatherSnapshots.FeatherSuffixes)
          .files.map(l => (l.file, l.len))
        require(files.size == parts, s"parts on disk: ${files.size}")
        val statsMerged = med3(() =>
          graft.io.FeatherStats.loadForFiles(conf, files): Unit)
        val footers = med3(() =>
          graft.io.GraftFeather.planReadFiles(spark, files, 128L << 20): Unit)
        // uncovered fallback LAST (destructive): remove the merged
        // per-directory stats so every load falls back to per-file
        // sidecars
        fs.delete(new org.apache.hadoop.fs.Path(p, "_stats.json"), false)
        val statsFallback = med3(() =>
          graft.io.FeatherStats.loadForFiles(conf, files): Unit)
        println(f"""{"planning_parts":$parts,"discover_manifest_sec":$discManifest%.3f,"discover_listing_sec":$discListing%.3f,"stats_merged_sec":$statsMerged%.3f,"stats_fallback_sec":$statsFallback%.3f,"footer_plan_sec":$footers%.3f}""")
        (discManifest, statsMerged)
    }
    println(f"""{"planning_tier":"feather","file_ratio":10,"discover_ratio":${results(1)._1 / math.max(results(0)._1, 1e-4)}%.2f,"stats_ratio":${results(1)._2 / math.max(results(0)._2, 1e-4)}%.2f}""")
  }

  /** Re-clustering tier (r10, io/FeatherCluster.scala): OPTIMIZE is the
    * deliberate O(table) rewrite that buys O(touched) mutations forever
    * after — so the honest expectation here is ~LINEAR wall growth at 10×
    * rows (it IS a full rewrite), verified together with the payoff: the
    * same fixed band that touched every hash-written part touches ≤2
    * after clustering, at both sizes. */
  def clusterTier(spark: SparkSession, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val results = Seq((10, 1000000L), (100, 10000000L)).map { case (parts, n) =>
      val dir = s"$out/clust_$n"
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      spark.range(n)
        .select(col("id"), concat(lit("pay_"), col("id")).as("pay"))
        .repartition(parts, col("id")) // hash: worst case, nothing prunes
        .write.format("feather").mode("overwrite")
        .option("snapshots", "true").save(dir)
      val band = spark.range(n / 2, n / 2 + 50000L).select(col("id"))
      val r0 = graft.io.FeatherMutations.deleteByKey(spark, dir, band, Seq("id"))
      require(r0.filesTouched == parts,
        s"hash layout should touch all $parts parts: $r0")
      val t0 = System.nanoTime()
      val rc = graft.io.FeatherCluster.cluster(spark, dir, Seq("id"),
        targetBytes = (n * 24) / parts) // ~input part count out
      val sec = (System.nanoTime() - t0) / 1e9
      val band2 = spark.range(n / 4, n / 4 + 50000L).select(col("id"))
      val r1 = graft.io.FeatherMutations.deleteByKey(spark, dir, band2, Seq("id"))
      require(r1.filesTouched <= 2,
        s"clustered band must touch <=2 of ${rc.filesAfter}: $r1")
      val rows = spark.read.format("feather").load(dir).count()
      require(rows == n - 100000L, s"rows after two deletes: $rows")
      println(f"""{"cluster_rows":$n,"parts_in":$parts,"parts_out":${rc.filesAfter},"cluster_sec":$sec%.2f,"touched_before":${r0.filesTouched},"touched_after":${r1.filesTouched}}""")
      sec
    }
    println(f"""{"cluster_tier":"feather","table_ratio":10,"wall_ratio":${results(1) / results(0)}%.2f}""")
  }

  /** Row-level mutation tier (r10, io/FeatherMutations.scala): DELETE and
    * MERGE against range-clustered snapshotted tables at 1M and 10M rows.
    * The structural claim under test: copy-on-write work scales with
    * TOUCHED bytes, not table bytes — a fixed-width key band (50k keys)
    * touches the same number of parts at both sizes, so its wall time
    * should stay ~flat across the 10× table growth (the residual growth
    * is the candidate probe + manifest bookkeeping, both O(files)). */
  def mutationTier(spark: SparkSession, out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val results = Seq((10, 1000000L), (100, 10000000L)).map { case (parts, n) =>
      val dir = s"$out/mut_$n"
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      spark.range(n)
        .select(col("id"), concat(lit("pay_"), col("id")).as("pay"))
        .repartitionByRange(parts, col("id"))
        .write.format("feather").mode("overwrite")
        .option("snapshots", "true").save(dir)
      // fixed-width band: 50k keys starting mid-table → touches the 1-2
      // parts whose range covers the band, regardless of table size
      val lo = n / 2
      val delKeys = spark.range(lo, lo + 50000L).select(col("id"))
      val t0 = System.nanoTime()
      val rd = graft.io.FeatherMutations.deleteByKey(spark, dir, delKeys, Seq("id"))
      val delSec = (System.nanoTime() - t0) / 1e9
      require(rd.filesTouched <= 2,
        s"fixed band must touch <=2 of $parts range parts: $rd")
      val afterDel = spark.read.format("feather").load(dir).count()
      require(afterDel == n - 50000L, s"rows after delete: $afterDel")
      // merge: same-width update band at the table head + 10k inserts
      val src = spark.range(0L, 40000L)
        .select(col("id"), concat(lit("upd_"), col("id")).as("pay"))
        .unionAll(spark.range(n, n + 10000L)
          .select(col("id"), concat(lit("new_"), col("id")).as("pay")))
      val t1 = System.nanoTime()
      val rm = graft.io.FeatherMutations.merge(spark, dir, src, Seq("id"))
      val mrgSec = (System.nanoTime() - t1) / 1e9
      require(rm.filesTouched <= 2,
        s"merge band must touch <=2 data parts: $rm")
      val afterMrg = spark.read.format("feather").load(dir).count()
      require(afterMrg == n - 50000L + 10000L, s"rows after merge: $afterMrg")
      // bloom refinement: absent keys INSIDE a live file's range (the
      // band deleted above — the rewritten survivor file still spans it).
      // Keys ABOVE every range would prove nothing: the hi-bound check
      // prunes those with no bloom involved. First probe runs WITHOUT
      // blooms and must touch ≥1 file (ranges alone cannot prune this
      // workload); after the build the same probe touches ZERO.
      val inBandAbsent = spark.range(lo + 1000L, lo + 1200L).select(col("id"))
      val rNoBloom = graft.io.FeatherMutations.deleteByKey(
        spark, dir, inBandAbsent, Seq("id"))
      require(rNoBloom.filesTouched >= 1,
        s"workload sanity: ranges alone must NOT prune in-band keys: $rNoBloom")
      val t2 = System.nanoTime()
      val nb = graft.io.FeatherBloom.build(spark, dir, "id")
      val bloomBuildSec = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val rb = graft.io.FeatherMutations.deleteByKey(
        spark, dir, inBandAbsent, Seq("id"))
      val bloomProbeSec = (System.nanoTime() - t3) / 1e9
      require(rb.filesTouched == 0,
        s"bloom must prune an in-range absent-key delete to zero: $rb")
      println(f"""{"mutation_rows":$n,"parts":$parts,"del_touched":${rd.filesTouched},"del_sec":$delSec%.2f,"merge_touched":${rm.filesTouched},"merge_sec":$mrgSec%.2f,"bloom_files":$nb,"bloom_build_sec":$bloomBuildSec%.2f,"bloom_probe_sec":$bloomProbeSec%.2f}""")
      (delSec, mrgSec)
    }
    println(f"""{"mutation_tier":"feather","table_ratio":10,"del_wall_ratio":${results(1)._1 / results(0)._1}%.2f,"merge_wall_ratio":${results(1)._2 / results(0)._2}%.2f}""")
  }
}
