package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-sketch plumbing shared by the batch decontamination query
  * (`dedup_contamination_bloom`) and the streaming form
  * (`GraftStreaming.streamingDecontamination`).
  *
  * The contract both sides rely on: the sketch is built DISTRIBUTED
  * (BloomFilterAggregate partial merges — the same machinery Spark's
  * runtime row-level filtering uses), only one fixed-size binary row ever
  * reaches the driver, and the probe is a codegen'd scalar expression on
  * an embedded constant — so the benchmark's raw strings are never
  * collected, broadcast, or shuffled. One-sided error: `mightContain` has
  * no false negatives, so a downstream exact-confirm join yields exact
  * results (SketchSpec pins this end to end).
  */
object SketchOps {

  /** Fold a relation's `column` into a Bloom sketch; one binary row,
    * sized by bits (2²⁰ bits = 128 KiB default) — never by cardinality. */
  def bloomSketch(rel: DataFrame, column: String = "g",
                  numItems: Long = 1L << 16, numBits: Long = 1L << 20): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => CLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    val bytes = rel
      .select(Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(col(column))),
        CLit(numItems), CLit(numBits)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    require(bytes != null, "empty relation — no sketch to build")
    bytes
  }

  /** Codegen'd membership probe against an embedded constant sketch.
    * Usable anywhere a scalar Column goes — including inside higher-order
    * array lambdas, which is how the streaming form prunes a document's
    * whole shingle array without exploding it first. */
  def mightContain(sketch: Array[Byte])(value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CLit}
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(BloomFilterMightContain(
      CLit.create(sketch, BinaryType), Bridge.expression(xxhash64(value))))
  }
}
