package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the
  * transitive-closure step of near-dup clustering (pairs are not enough:
  * A≈B, B≈C ⇒ drop two of {A,B,C}).
  *
  * Every iteration is one equi-join (edges × labels, both hash-partitioned
  * on the key) plus one min() aggregate, PLUS a label-shortcut self-join
  * (pointer doubling: L(v) ← min(L(v), L(L(v))) — the Shiloach-Vishkin /
  * MapReduce-CC contraction step). Neighbor propagation alone needs
  * rounds proportional to the component DIAMETER (a million-node chain =
  * a million rounds); with shortcutting the pointer chains halve each
  * round, so convergence is O(log n) rounds on ANY graph — a 1M-vertex
  * chain converges in ~21 rounds instead of failing the cap. Shuffle
  * volume per round is O(|edges| + |V|). The driver sees one Boolean per
  * round, never the labels.
  *
  * LINEAGE DISCIPLINE — each round's plan references the previous labels
  * relation twice (the neighbor join and the carry join), so building
  * lazily would DOUBLE the logical plan per round: 2^rounds plan nodes,
  * a driver OOM near the round cap even on a 40-row graph (measured:
  * the pre-truncation version of this loop died exactly that way in
  * ConnectedComponentsSpec). persist() alone does not help — it caches
  * blocks, not plans. Every round is therefore materialized into a
  * persisted RDD and re-wrapped as a LogicalRDD leaf (the same truncation
  * Dataset.checkpoint performs), which keeps an explicit handle for
  * cleanup: each round unpersists its predecessor, so storage stays
  * O(one round), not O(rounds) — Dataset.checkpoint offers no public
  * release and reliable checkpoint files are never auto-deleted under the
  * default cleaner config. Same discipline as GraphX's Pregel
  * checkpointer, which likewise unpersists superseded rounds eagerly.
  *
  * The round cap still exists and hitting it FAILS LOUDLY: silently
  * returning partially-propagated labels would under-merge clusters and
  * let duplicates through the dedup gate, which is exactly the corruption
  * a pipeline can least afford to miss. With shortcutting the default cap
  * of 32 covers any graph up to ~2^30 vertices, so reaching it means a
  * genuine bug, not a deep graph. Reference semantics: transitive
  * near-dup clustering over MinHash pairs (Lee et al. 2022 dedup;
  * cuDF has no graph op — this is the Spark-native construction).
  */
object ConnectedComponents {

  /** Eagerly materializes into a persisted RDD and re-wraps it as a fresh
    * leaf DataFrame — truncates the logical plan like Dataset.checkpoint,
    * but returns a release handle so superseded rounds free their blocks
    * deterministically. */
  private def materialized(df: DataFrame): (DataFrame, () => Unit) = {
    val rdd = df.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager: pin blocks before the next round's plan reads twice
    val out = df.sparkSession.createDataFrame(rdd, df.schema)
    (out, () => { rdd.unpersist(false); () })
  }

  /** Labels every vertex of the undirected `pairs` graph with its
    * component's minimum vertex id.
    *
    * @param pairs    (d1, d2) edge list; direction ignored
    * @param maxIters hard round cap; exceeding it throws IllegalStateException
    * @return (doc_id, label) — one row per vertex that appears in any pair
    */
  def minLabel(pairs: DataFrame, maxIters: Int = 32): DataFrame = {
    val (edges, releaseEdges) = materialized(pairs.select("d1", "d2")
      .union(pairs.select(col("d2").as("d1"), col("d1").as("d2"))))
    // round 1 for free: from identity labels, one propagation step is just
    // min(neighbor) vs self over the raw edge list — a single aggregation
    // instead of the loop body's join+agg+join round
    var (labels, releasePrev) = {
      val (l, r) = materialized(edges.groupBy(col("d1"))
        .agg(min(col("d2")).as("nmin"))
        .select(col("d1").as("doc_id"), least(col("d1"), col("nmin")).as("label")))
      (l, r)
    }
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("d2"), col("label").as("nl")), Seq("d2"))
        .groupBy(col("d1").as("doc_id")).agg(min(col("nl")).as("nmin"))
      // pointer doubling: resolve each vertex's label's OWN label. Labels
      // are always vertex ids inside the same component (initially a
      // neighbor min; inductively preserved), so the inner self-join
      // resolves every row, and least() keeps the invariant L(v) ≤ v.
      val shortcut = labels.select(col("doc_id"), col("label").as("via"))
        .join(labels.select(col("doc_id").as("via"), col("label").as("sl")),
          Seq("via"))
        .select(col("doc_id"), col("sl"))
      // carry the old label through the same projection so convergence needs
      // no second labels join — one filter over the materialized round result
      val (round, releaseRound) = materialized(labels
        .join(nbrMin, Seq("doc_id"), "left")
        .join(shortcut, Seq("doc_id"), "left")
        .select(col("doc_id"), col("label").as("old"),
          least(col("label"),
            coalesce(col("nmin"), col("label")),
            coalesce(col("sl"), col("label"))).as("label")))
      converged = round.filter(col("label") < col("old")).isEmpty
      releasePrev() // superseded round's blocks freed immediately
      releasePrev = releaseRound
      labels = round.select("doc_id", "label")
      iter += 1
    }
    releaseEdges()
    if (!converged) {
      releasePrev()
      throw new IllegalStateException(
        s"connected components did not converge within $maxIters rounds — " +
          "with pointer doubling that covers components of ~2^" + maxIters +
          " vertices, so this is a data or logic bug, not a deep graph. " +
          "Returning the partial labels would under-merge clusters " +
          "(duplicates would pass the dedup gate).")
    }
    labels
  }
}
