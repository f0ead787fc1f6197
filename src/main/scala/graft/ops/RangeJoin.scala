package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval range join.
  *
  * `points JOIN intervals ON p.t >= i.start AND p.t < i.end` compiles to a
  * BroadcastNestedLoopJoin (or cartesian) in vanilla Spark — O(|p|·|i|)
  * comparisons. The scalable form quantizes time into fixed-width buckets:
  * each interval is exploded to the buckets it covers (replication factor =
  * span/width, bounded and chosen by the caller), each point maps to one
  * bucket, and the join becomes a hash equi-join on the bucket key with the
  * exact containment predicate as a residual filter. One shuffle, no
  * nested loop — the standard interval-join design (same construction
  * Spark itself uses for stream-stream time-interval joins).
  */
object RangeJoin {

  /** @param bucketWidth bucket size in the units of tCol/startCol/endCol
    *                    (pick ≈ median interval width: replication stays
    *                    small while buckets stay selective) */
  def pointInInterval(points: DataFrame, tCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket", floor(col(tCol) / bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor((col(endCol) - 1) / bucketWidth))))
    p.join(i, Seq("__bucket"))
      .filter(col(tCol) >= col(startCol) && col(tCol) < col(endCol))
      .drop("__bucket")
  }
}
