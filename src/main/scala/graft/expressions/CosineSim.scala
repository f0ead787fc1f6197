package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of two double-array columns in one fused pass.
  *
  * Bit-identical to the HOF form it replaces —
  * `aggregate(zip_with(a,b,*), 0.0, +) / (sqrt(aggregate(transform(a,x²)))
  * · sqrt(aggregate(transform(b,x²))))` — because the three accumulators
  * fold left-to-right from 0.0 exactly like the lambda form (and like the
  * DuckDB oracle's list_reduce), and the denominator multiplies the two
  * sqrts rather than sqrt-ing the product. The win is mechanical: the HOF
  * pipeline is interpreted (no whole-stage codegen through lambda
  * expressions) and materializes two intermediate arrays per pair; this is
  * the per-candidate scoring kernel of the ANN / semantic-dedup operators,
  * evaluated O(candidates) times, so it compiles to a single primitive loop
  * with no allocation.
  *
  * Mirrors zip_with's unequal-length semantics by returning NULL, and the
  * HOF fold's element-null semantics too: a null element anywhere poisons
  * the double accumulator, so the whole similarity is NULL (dense embedding
  * vectors never hit this path; callers with nullable elements get the same
  * answer the aggregate/zip_with form would give, not a garbage read).
  *
  * Reference semantics: near-dup cosine over embedding columns (north-star
  * similarity tier; cf. dask_cudf partitioned reductions — the reference has
  * no vector kernel, this is greenfield like §2.9).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("graftCos")
      s"""
         |java.lang.Double $tmp = graft.expressions.CosineSimImpl.cosine($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSimImpl {
  /** Boxed so codegen can represent the length-mismatch NULL. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (Math.sqrt(na) * Math.sqrt(nb))
  }
}
