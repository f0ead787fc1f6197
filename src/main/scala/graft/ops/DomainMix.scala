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
    * @param df      input; must carry srcCol, tokCol, hkeyCol and tieCol
    * @param tieCol  unique tie-break for hash collisions (determinism)
    * @param budget  per-domain token budget as a Column expression of srcCol
    */
  def budgetPrefix(df: DataFrame, srcCol: String, tokCol: String,
                   hkeyCol: String, tieCol: String, cumCol: String,
                   budget: Column => Column): DataFrame = {
    val t = df.withColumn("__bucket", shiftright(col(hkeyCol), 22))
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
