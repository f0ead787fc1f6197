package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a single-space-tokenized text column.
  *
  * Equivalent to the pure-builtin pipeline
  * `array_distinct(transform(sequence(...), i -> concat_ws('_', tok[i..i+n-1])))`
  * over `split(text, ' ')`, and to the DuckDB oracle's
  * `list_distinct(list_transform(range(...), i -> t[i]||'_'||...))` — but one
  * codegen'd JVM loop per row instead of an interpreted higher-order
  * expression tree (measured ~10× on the documents corpus scan).
  *
  * First-occurrence order, trailing empty tokens kept (Java split limit -1),
  * texts with fewer than n tokens yield an empty array — all matching the
  * builtin form it replaces.
  *
  * Reference: nvtext/generate_ngrams.hpp (cpp/src/text/generate_ngrams.cu).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordShinglesImpl.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordShinglesImpl.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShinglesImpl {
  def eval(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append('_')
        sb.append(tokens(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s => UTF8String.fromString(s)).toArray[Any])
  }
}
