package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY §2.9 north star; cuDF itself is
  * strictly batch — dask_cudf distributes but does not stream — so this is
  * greenfield surface, built the Spark way).
  *
  * Every transform here takes a streaming OR batch DataFrame: the same
  * logical plan runs both ways, which is how the batch oracle pins the
  * streaming semantics (the batch run of `windowedCounts` is the
  * dt_window_bucket query family; the streaming run is asserted in
  * StreamingSpec with a MemoryStream).
  *
  * Scale notes: watermark + windowed aggregation keeps state bounded per
  * (window, key); state lives in the state store keyed by the shuffle
  * partitioning of the grouping key, so a 1000-executor cluster partitions
  * state exactly like the batch shuffle.
  *
  * Sources: these transforms are source-agnostic (file, rate, memory — and
  * kafka via `spark-sql-kafka` where that connector is deployed; it is not
  * present in this zero-egress environment, so specs drive MemoryStream).
  */
object GraftStreaming {

  /** Event-time tumbling-window counts with a watermark: the canonical
    * readStream → window agg → writeStream pipeline. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowDur: String, watermarkDur: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDur)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))

  /** Streaming exact dedup on a digest column within the watermark horizon —
    * the streaming form of dedup_exact. `dropDuplicatesWithinWatermark` (not
    * plain `dropDuplicates`) is what makes the watermark live: state for a
    * digest is evicted once the watermark passes its event time, so state
    * stays bounded by the horizon instead of growing with every distinct
    * digest ever seen. (Plain dropDuplicates(digest) would only evict when
    * the event-time column itself is part of the dedup keys.) */
  def streamingDedup(events: DataFrame, tsCol: String, digestCol: String,
                     watermarkDur: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDur)
      .dropDuplicatesWithinWatermark(Seq(digestCol))

  /** Stream-static dimension enrichment: join each micro-batch against a
    * small static dimension table. The static side is broadcast into every
    * micro-batch (no stream-side state at all — unlike stream-stream joins
    * this needs no watermark bookkeeping), which is the right plan for
    * enriching a 100-TB/day stream with a dimension that fits an executor:
    * the stream never shuffles for the join. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String,
                    how: String = "left"): DataFrame =
    events.join(broadcast(dim), Seq(key), how)

  /** Watermarked stream-stream interval join: equi-key plus an event-time
    * band (`|rightTs - leftTs| <= within`). BOTH inputs carry a watermark and
    * the join condition bounds each side's event time by the other's, which
    * is exactly what lets Spark compute a state-eviction horizon per side —
    * buffered rows are dropped once the other stream's watermark passes
    * their band, so join state is bounded by (rate × (watermark + band)),
    * never by stream length. State is partitioned by the equi-key like any
    * shuffle, so it scales out with executors. Without the time band this
    * would be an unbounded-state join — Spark rejects it in append mode.
    *
    * `joinType` supports the outer variants too ("left_outer",
    * "right_outer", "full_outer"): an unmatched buffered row is emitted
    * null-padded only once the other side's watermark proves no in-band
    * match can still arrive — late outer results by design, not a bug. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   watermarkDur: String, within: String,
                   joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, watermarkDur)
      .join(right.withWatermark(rightTs, watermarkDur),
        col(leftKey) === col(rightKey)
          && col(rightTs) >= col(leftTs) - expr(s"INTERVAL $within")
          && col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
        joinType)

  final case class SessionInput(user: String, tsMillis: Long)
  final case class SessionState(nEvents: Long, firstTs: Long, lastTs: Long)
  final case class SessionOutput(user: String, nEvents: Long, durationMillis: Long, closed: Boolean)

  /** Custom sessionization state machine via mapGroupsWithState — the
    * KeyValueGroupedDataset custom-state tier (the streaming analogue of
    * groupby.apply). With `gapMillis > 0` a processing-time timeout closes
    * idle sessions (production mode — the trigger loop keeps firing, so
    * tests that wait for quiescence should pass `gapMillis = 0` for
    * NoTimeout). */
  def sessionize(input: Dataset[SessionInput], gapMillis: Long): Dataset[SessionOutput] = {
    import input.sparkSession.implicits._
    val timeout =
      if (gapMillis > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    input
      .groupByKey(_.user)
      .mapGroupsWithState[SessionState, SessionOutput](timeout) {
        (user: String, events: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOutput(user, s.nEvents, s.lastTs - s.firstTs, closed = true)
          } else {
            val ts = events.map(_.tsMillis).toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, ts.min, ts.min))
            val next = SessionState(prev.nEvents + ts.size,
              math.min(prev.firstTs, ts.min), math.max(prev.lastTs, ts.max))
            state.update(next)
            if (gapMillis > 0) state.setTimeoutDuration(gapMillis)
            SessionOutput(user, next.nEvents, next.lastTs - next.firstTs, closed = false)
          }
      }
  }

  final case class QuotaInput(source: String, tsMillis: Long, docId: Long, nTokens: Long)
  final case class QuotaState(used: Long, open: Boolean)
  final case class QuotaOutput(source: String, docId: Long, nTokens: Long, cumTokens: Long)

  /** Streaming per-domain token-budget quota — the incremental form of
    * pipeline_domain_mix: each source admits documents in event-time order
    * until its token budget is exhausted, then closes (strict prefix
    * semantics: the first overflowing document closes the quota, matching
    * the batch query's `cum <= budget` prefix — no skip-and-backfill).
    *
    * flatMapGroupsWithState keyed by source: state is two scalars per
    * domain — bounded by the domain count, not the stream — and partitions
    * with the shuffle like all keyed state. Within a micro-batch events are
    * ordered by (ts, docId) so replays are deterministic; across batches
    * event-time order is the source's append order (enforce upstream with a
    * watermark-sorted sink if the transport reorders). */
  def domainQuota(input: Dataset[QuotaInput],
                  budgetFor: String => Long): Dataset[QuotaOutput] = {
    import input.sparkSession.implicits._
    input
      .groupByKey(_.source)
      .flatMapGroupsWithState[QuotaState, QuotaOutput](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, events: Iterator[QuotaInput], state: GroupState[QuotaState]) =>
          val budget = budgetFor(source)
          val prev = state.getOption.getOrElse(QuotaState(0L, open = true))
          var used = prev.used
          var open = prev.open
          val out = Seq.newBuilder[QuotaOutput]
          events.toSeq.sortBy(e => (e.tsMillis, e.docId)).foreach { e =>
            if (open) {
              if (used + e.nTokens <= budget) {
                used += e.nTokens
                out += QuotaOutput(source, e.docId, e.nTokens, used)
              } else open = false
            }
          }
          state.update(QuotaState(used, open))
          out.result().iterator
      }
  }

  final case class BandRow(ts: java.sql.Timestamp, doc_id: Long,
                           h: Seq[Long], band: Int, bkey: Long)
  final case class BucketEntry(docId: Long, h: Seq[Long], tsMs: Long)
  final case class BucketState(entries: List[BucketEntry])
  final case class NearDupHit(doc_id: Long, band: Int, dup_of: Long,
                              jaccard: Double)

  /** Streaming NEAR-duplicate detection — MinHash-LSH within the watermark
    * horizon, the incremental form of `dedup_minhash_lsh`/
    * `dedup_lsh_verified`. Batch near-dup needs the whole corpus; an
    * ingest stream needs "is this arriving document a near-copy of
    * anything recent?" answered online with bounded state.
    *
    * Shape (keyed EXACTLY like the batch LSH shuffle):
    *  1. Per row, fully scalar — no pre-shuffle aggregation: distinct
    *     word-shingle hash set `h` (fused WordShingleHashes), 8-hash
    *     MinHash signature, 8 bands × 1 row (band key = signature value).
    *  2. Explode to (band, bkey) rows, watermark, groupByKey on the
    *     BUCKET — state is per band-bucket, partitioned like any shuffle.
    *  3. flatMapGroupsWithState: compare the arriving doc's `h` against
    *     the bucket's stored entries (EXACT jaccard on the hash sets, the
    *     same verify the batch path runs); emit a hit per match ≥
    *     threshold; append self to the bucket (most-recent `bucketCap`
    *     kept — the batch sub-bucket cap's streaming twin); event-time
    *     timeout evicts buckets once the watermark passes their newest
    *     entry + horizon.
    *
    * A document repeats across 8 band buckets, so doc-level verdicts are
    * a trivial rollup of the emitted hits (distinct dup_of per doc_id) —
    * hits stream append-mode, available immediately.
    *
    * State bound: activeBuckets × bucketCap × |h|. The horizon bounds
    * activeBuckets to the recent-window working set; 100-TB/day ingest
    * tunes the horizon exactly like streamingDedup's. */
  def streamingNearDup(docs: DataFrame, simThreshold: Double,
                       watermarkDur: String, horizonMs: Long,
                       bucketCap: Int = 20): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    import graft.text.TextFunctions
    val nBands = 8
    val sig = TextFunctions.minhashFromFps(col("h"), nBands)
    val keyed = docs
      .select(col("ts"), col("doc_id"),
        array_distinct(TextFunctions.shingleHashes(col("text"))).as("h"))
      .filter(size(col("h")) > 0) // an empty/short doc has no signature
      .select(col("ts"), col("doc_id"), col("h"),
        posexplode(sig).as(Seq("band", "bkey")))
      .withWatermark("ts", watermarkDur)
      .as[BandRow]
    def jac(a: Seq[Long], b: Seq[Long]): Double = {
      val (sa, sb) = (a.toSet, b.toSet)
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
    keyed
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandRow],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val hits = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
              .flatMap { r =>
                val out = entries.flatMap { e =>
                  val j = jac(r.h, e.h)
                  if (e.docId != r.doc_id && j >= simThreshold)
                    Some(NearDupHit(r.doc_id, r.band, e.docId,
                      math.rint(j * 1e6) / 1e6))
                  else None
                }
                entries = (BucketEntry(r.doc_id, r.h, r.ts.getTime) ::
                  entries).take(bucketCap)
                out
              }
            state.update(BucketState(entries))
            // evict once the watermark passes newest-entry + horizon
            state.setTimeoutTimestamp(entries.map(_.tsMs).max + horizonMs)
            hits.iterator
          }
      }
  }

  /** Update-mode console/memory-sink convenience used by the spec. */
  def startToMemory(df: DataFrame, queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Update()).start()

  /** Incremental corpus prep: the streaming form of pipeline_corpus_prep's
    * quality gate + exact dedup. Documents arrive as (ts, doc_id, digest,
    * n_tokens, quality); the gate is a stateless codegen filter, dedup keeps
    * the first occurrence of each digest within the watermark horizon
    * (bounded state — `dropDuplicatesWithinWatermark`), and the per-row
    * survivor stream is returned append-mode, ready for a parquet sink.
    * Batch parity: on a static frame the same call runs filter +
    * dropDuplicates (Spark rejects the watermarked variant in batch mode,
    * where the horizon is meaningless anyway — the whole input is one
    * "batch"); StreamingSpec asserts both modes agree.
    *
    * The expensive parts of batch corpus prep (digest computation,
    * tokenize) stay upstream map-side in both modes; the only stateful
    * operator is the digest dedup, keyed exactly like the batch shuffle. */
  def corpusPrepStream(docs: DataFrame, tsCol: String, digestCol: String,
                       minTokens: Int, minQuality: Double,
                       watermarkDur: String): DataFrame = {
    val gated = docs.filter(col("n_tokens") >= minTokens && col("quality") >= minQuality)
    if (docs.isStreaming)
      gated.withWatermark(tsCol, watermarkDur)
        .dropDuplicatesWithinWatermark(Seq(digestCol))
    else {
      // first-occurrence-by-event-time, the deterministic batch equivalent
      // of the stream's arrival-order keep-first (plain dropDuplicates keeps
      // an arbitrary row)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(digestCol)).orderBy(col(tsCol))
      gated.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** Distributed Bloom sketch of a shingle relation's `g` column: one
    * fixed-size binary row via BloomFilterAggregate's tree-aggregated
    * partial merges — the benchmark side never collects or broadcasts its
    * raw strings. Shared by `dedup_contamination_bloom` (batch) and
    * [[streamingDecontamination]]; see the batch query's Scaladoc for the
    * sizing rule (bits ∝ items; 2²⁰ bits = 128 KiB here). */
  def bloomSketch(shingles: DataFrame, column: String = "g",
                  numItems: Long = 1L << 16, numBits: Long = 1L << 20): Array[Byte] =
    graft.ops.SketchOps.bloomSketch(shingles, column, numItems, numBits)

  /** Streaming decontamination — the online form of
    * `dedup_contamination_bloom`: flag arriving documents that share ≥
    * `minOverlap` distinct 3-shingles with a (static) benchmark corpus,
    * using the benchmark's Bloom sketch so the overwhelmingly-clean ingest
    * stream is rejected BEFORE any join, shuffle, or state.
    *
    * Shape, in cost order:
    *  1. Per-row SCALAR prune: the document's distinct shingle array is
    *     filtered by a codegen'd `might_contain` on the embedded constant
    *     sketch *inside the array* (higher-order filter), so a document
    *     with zero sketch hits — at 100 TB/day, almost all of them —
    *     contributes nothing downstream. No false negatives: Bloom misses
    *     only what was never inserted.
    *  2. Surviving (doc, shingle) pairs explode and exact-confirm against
    *     the static benchmark relation (stream-static equi-join, stateless
    *     on the stream side) — false positives die here, keeping the
    *     output exact, not approximate.
    *  3. Watermarked per-(window, doc) count ≥ minOverlap emits one row
    *     per contaminated document when its window closes. State is
    *     bounded by contaminated-docs-per-horizon, not by the stream.
    *
    * Batch mode runs the identical plan (watermark is a no-op), which is
    * how StreamingSpec pins parity with the batch query's oracle-checked
    * result. */
  def streamingDecontamination(docs: DataFrame, benchShingles: DataFrame,
                               sketch: Array[Byte], minOverlap: Int,
                               watermarkDur: String,
                               windowDur: String = "10 minutes"): DataFrame = {
    val mightContain = graft.ops.SketchOps.mightContain(sketch) _
    // the watermark sits on the RAW stream, upstream of the prune: every
    // arriving document advances event time, including the (vast) clean
    // majority the sketch rejects — otherwise a stretch of clean ingest
    // would freeze the watermark and no contaminated window would ever
    // close
    val src =
      if (docs.isStreaming) docs.withWatermark("ts", watermarkDur) else docs
    val candExpr = filter(graft.text.TextFunctions.shingles(col("text")),
      g => mightContain(g))
    // In batch, a size(cand) >= minOverlap pre-filter on a materialized
    // candidate column is a free necessary condition. In STREAMING no
    // part of the prune may become a Filter below the watermark node, or
    // clean documents stop advancing event time — the watermark freezes
    // and no window ever closes. Two optimizer rules conspire to put one
    // there (both observed, not hypothetical): (a) an explicit
    // size-filter is deterministic and event-time-free, so
    // PushPredicateThroughNonJoin pushes it through EventTimeWatermark to
    // the source; (b) even WITHOUT an explicit filter, exploding a
    // materialized `cand` ATTRIBUTE lets InferFiltersFromGenerate add
    // `size(cand) > 0` below the Generate, which then takes the same ride
    // down. Exploding the candidate EXPRESSION inline defeats (b) — the
    // inference rule only fires on attribute children, precisely to avoid
    // duplicating expensive expressions — so the drop of clean documents
    // happens in the Generate itself, safely above the watermark.
    val pruned =
      if (docs.isStreaming)
        src.select(col("ts"), col("doc_id"), explode(candExpr).as("g"))
      else
        src.select(col("ts"), col("doc_id"), candExpr.as("cand"))
          .filter(size(col("cand")) >= minOverlap)
          .select(col("ts"), col("doc_id"), explode(col("cand")).as("g"))
    val confirmed = pruned.join(benchShingles, Seq("g"))
    val agged =
      if (docs.isStreaming)
        confirmed
          .groupBy(window(col("ts"), windowDur), col("doc_id"))
          .agg(count(lit(1)).as("n_overlap"))
      else
        confirmed.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_overlap"))
    agged.filter(col("n_overlap") >= minOverlap)
      .select(col("doc_id"), col("n_overlap"))
  }
}
