package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash (Charikar '02) of a token array, `bits` wide: bit j is set
  * iff the sum of ±1 votes (per token, by bit j of the token's
  * [[PolyHash]]) is positive. One codegen'd pass hashes each token ONCE
  * and votes on every bit — semantically identical to the
  * builtin-composed form
  * `Σ_j when(aggregate(transform(toks, polyHash), ..bit-j votes..) > 0, 2^j)`,
  * which evaluates 16 interpreted higher-order aggregates and (after
  * projection collapse) re-hashes every token per bit. The oracle keeps
  * the relational list_reduce spelling.
  *
  * Null tokens vote as polyHash("") = 0 does (all bits clear → -1 per
  * bit): shingle/token arrays here are containsNull=false upstream, so
  * the case is defensive, not semantic.
  *
  * Reference: the simhash member of the dedup tier (SURVEY §2.8);
  * cpp-side anchor is the MinHash/fingerprint family of nvtext.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  // hard cap 30, not 63: PolyHash values are mod 1e9+7 (< 2^30), so bits
  // 30..63 would always vote -1 and come out zero — a wider request would
  // SILENTLY degenerate to a ~30-bit fingerprint; refuse it loudly
  require(bits >= 1 && bits <= 30,
    s"bits must be in [1, 30], got $bits — the per-token PolyHash is " +
      "bounded by 1e9+7 (< 2^30), so higher bits carry no signal")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.eval(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHashImpl.eval($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHashImpl {
  def eval(tokens: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val h = if (t == null) 0L else PolyHashImpl.hash(t)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
