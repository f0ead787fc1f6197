package graft.ops

import org.apache.spark.sql.DataFrame

/** Conditional scan widening — the guide's input-skew remedy ("one huge
  * unsplittable file ... repartition immediately after the read").
  *
  * The bench fixtures are single-file, SINGLE-ROW-GROUP parquet, so every
  * scan stage is exactly one task regardless of split configuration (a
  * byte-range split only yields rows to the task holding the row-group
  * midpoint), and whole-stage codegen fuses every pre-exchange expression
  * into that one serial task. `widen` inserts a round-robin repartition
  * ONLY when the planned scan parallelism is below the session's default
  * parallelism; on properly-split inputs (many files / row groups — the
  * normal cluster case) it is the identity and adds no exchange.
  *
  * Measured discipline (r19): this pays ONLY where per-row expression cost
  * far exceeds the one-hop shuffle of the scan's pruned output — e.g. the
  * WordPiece longest-match tokenizer or a 6-regex PII chain over every
  * document. For ordinary aggregates the added exchange is a net loss
  * (see OPTIMIZATION_r19.md "rejected" log); do not blanket-apply.
  * Deterministic under retry: sort-before-repartition is on by default
  * (SPARK-23207).
  */
object ScanParallel {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // physical planning only — no job runs; at scale the scan reports its
    // real split count and the branch is not taken
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
