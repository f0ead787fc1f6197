package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Jaccard similarity |A∩B| / |A∪B| of two string-array columns in a
  * single hash-set pass.
  *
  * Semantically identical to
  * `size(array_intersect(a,b)) / size(array_union(a,b))` (and to the DuckDB
  * oracle's list_intersect/list_distinct(list_concat) form) but builds ONE
  * set and counts overlaps instead of materializing two result arrays —
  * this is the per-candidate-pair verification kernel of the LSH dedup
  * operators, evaluated O(candidates) times.
  *
  * Duplicate semantics match the builtins: both sides are deduplicated
  * (shingle inputs here are already distinct). Null elements do not occur
  * in shingle arrays (containsNull=false upstream).
  */
case class JaccardSim(left: Expression, right: Expression,
                      prefiltered: Boolean = false) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  private def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimImpl.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.JaccardSimImpl.jaccard($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSimImpl {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val seen = new java.util.HashSet[UTF8String](Math.max(16, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) { seen.add(a.getUTF8String(i)); i += 1 }
    val nA = seen.size
    var inter = 0
    var union = nA
    val seenB = new java.util.HashSet[UTF8String](Math.max(16, b.numElements() * 2))
    i = 0
    while (i < b.numElements()) {
      val e = b.getUTF8String(i)
      if (seenB.add(e)) {
        if (seen.contains(e)) inter += 1 else union += 1
      }
      i += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
