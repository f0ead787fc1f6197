package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Binary search over a broadcast-by-closure SORTED bounds array: returns
  * the index of the LAST bound ≤ the input, or -1 when the input sorts
  * below every bound. Whole-stage-codegen'd — the per-row cost is
  * O(log F) comparisons in one tight loop, no join.
  *
  * This is the sorted-boundary refinement of the mutation candidate
  * probe (io/FeatherMutations.scala): when a table's per-file key ranges
  * are pairwise disjoint (the invariant [[graft.io.FeatherCluster]]
  * establishes), "which file could contain key k" is a binary search
  * over the files' sorted lower bounds plus one upper-bound check —
  * O(keys · log files) fused into the key scan, replacing the
  * O(keys · files) broadcast non-equi join the overlapping-ranges
  * fallback needs. Bounds must be Long, Double, or UTF8String-comparable
  * Strings matching the child's type; the caller owns sortedness.
  */
case class BoundBucket(bounds: Array[Any], child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bound_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | DoubleType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long/double/string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long => BoundBucketImpl.search(bounds, l.longValue())
    case d: java.lang.Double => BoundBucketImpl.search(bounds, d.doubleValue())
    case s: UTF8String => BoundBucketImpl.search(bounds, s)
    case other => throw new IllegalStateException(
      s"$prettyName: unexpected runtime value ${other.getClass}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", bounds, "java.lang.Object[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BoundBucketImpl.search($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BoundBucket =
    copy(child = newChild)
}

object BoundBucketImpl {
  private def searchBy(n: Int, leq: Int => Boolean): Int = {
    // invariant: every index < lo satisfies leq, every index > hi fails it
    var lo = 0
    var hi = n - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (leq(mid)) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  def search(bounds: Array[Any], v: Long): Int =
    searchBy(bounds.length, i => bounds(i).asInstanceOf[java.lang.Long] <= v)

  def search(bounds: Array[Any], v: Double): Int =
    searchBy(bounds.length, i => bounds(i).asInstanceOf[java.lang.Double] <= v)

  def search(bounds: Array[Any], v: UTF8String): Int =
    searchBy(bounds.length,
      i => bounds(i).asInstanceOf[UTF8String].compareTo(v) <= 0)
}
