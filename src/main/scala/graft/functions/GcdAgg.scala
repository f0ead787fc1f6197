package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (SURVEY §2.10 — cuDF exposes UDF aggregations
  * through numba-compiled device reductions; the Spark tier is an
  * `Aggregator`, which participates in partial aggregation: `reduce` runs
  * map-side per partition, `merge` combines partial states on the reduce
  * side, so the shuffle carries one long per group per partition).
  *
  * GCD is chosen as the demo because it is exact, commutative and
  * associative (result independent of partitioning — safe for the
  * hash-compare gate) and has no Spark builtin aggregate.
  */
object GcdAgg extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0L) math.abs(a) else gcd(b, a % b)

  override def reduce(acc: Long, x: Long): Long = gcd(acc, x)
  override def merge(a: Long, b: Long): Long = gcd(a, b)
  override def finish(acc: Long): Long = acc
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
