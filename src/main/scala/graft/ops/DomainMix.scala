package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain token-budget prefix selection (reproducible training-mixture
  * sampling): each domain contributes its hash-ordered document prefix until
  * the domain's token budget is exhausted.
  *
  * Scale design — the naive plan (one window per domain) funnels each domain
  * through a single task; a 40-TB common-crawl domain would be one
  * partition. Instead, two-phase prefix sums (the OrderedOps construction
  * applied per group):
  *   1. order-aligned hash buckets (top bits of the order key) →
  *      per-(domain, bucket) token sums → running bucket offsets; this
  *      relation is (domains × buckets) rows — broadcast, never wide.
  *   2. buckets whose offset already exceeds the budget are dropped BEFORE
  *      the row-level window — rows past the cutoff never window at all (at
  *      a 1% sampling rate ~99% of rows skip phase 2); survivors window
  *      within (domain, bucket), many-way parallel per domain.
  */
object DomainMix {

  /** Adds `cumCol` (the running token total in hash order within `srcCol`)
    * and keeps exactly the budget prefix: rows with cum ≤ budget(src).
    *
    * Bucketing contract: buckets are the top 8 bits of the order key, so the
    * shift MUST match the key's width — `keyBits` is the documented width of
    * `hkeyCol`'s distribution. The default 30 fits `polyHash` (uniform over
    * [0, 1e9+7) < 2^30 — every production caller); pass 64 for a full-range
    * signed 64-bit hash (arithmetic shift keeps bucket order aligned with
    * key order: negatives land in negative buckets). Getting this wrong in
    * either direction defeats the construction — too-small a shift makes the
    * offsets relation corpus-sized (no longer broadcastable), too-large
    * collapses everything into one bucket (the single-task-per-domain window
    * this module exists to avoid) — so the bucket count is asserted
    * structurally: 2^8 = 256 buckets ⇒ offsets = domains × 256 rows.
    *
    * @param df      input; must carry srcCol, tokCol, hkeyCol and tieCol
    * @param tieCol  unique tie-break for hash collisions (determinism)
    * @param budget  per-domain token budget as a Column expression of srcCol
    * @param keyBits width of hkeyCol's uniform distribution (30 = polyHash)
    */
  def budgetPrefix(df: DataFrame, srcCol: String, tokCol: String,
                   hkeyCol: String, tieCol: String, cumCol: String,
                   budget: Column => Column, keyBits: Int = 30): DataFrame = {
    require(keyBits >= 8 && keyBits <= 64,
      s"keyBits must be in [8, 64], got $keyBits")
    val t = df.withColumn("__bucket", shiftright(col(hkeyCol), keyBits - 8))
    val wB = Window.partitionBy(col(srcCol)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = t.groupBy(col(srcCol), col("__bucket"))
      .agg(sum(col(tokCol)).as("__bsum"))
      .withColumn("__offset", sum(col("__bsum")).over(wB) - col("__bsum"))
      .filter(col("__offset") <= budget(col(srcCol)))
      .select(col(srcCol), col("__bucket"), col("__offset"))
    val wR = Window.partitionBy(col(srcCol), col("__bucket"))
      .orderBy(col(hkeyCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.join(broadcast(off), Seq(srcCol, "__bucket"))
      .withColumn(cumCol, col("__offset") + sum(col(tokCol)).over(wR))
      .filter(col(cumCol) <= budget(col(srcCol)))
      .drop("__bucket", "__offset")
  }
}
