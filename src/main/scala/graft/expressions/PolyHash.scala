package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic polynomial string hash: h ← (31·h + codepoint) mod 1e9+7.
  *
  * Native Catalyst expression with whole-stage codegen. Semantically identical
  * to the pure-builtin form `aggregate(transform(split(s,''), ascii), ...)`
  * (and to the DuckDB oracle SQL that replicates it), but evaluated as one
  * tight JVM loop per string instead of an interpreted per-character
  * expression tree — measured >10× faster on shingle fingerprinting, which
  * dominates the minhash/simhash dedup operators.
  *
  * Reference: content-digest hashing for dedup (cuDF hashing.hpp exposes
  * murmur3/md5 table hashes; the polynomial form is chosen here because every
  * SQL engine can replicate it for oracle checking).
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PolyHashImpl.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PolyHashImpl.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHashImpl {
  final val Mod = 1000000007L

  /** Iterates unicode code points (= ascii() of each split('') char for BMP
    * text; the corpora here are ASCII). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}
