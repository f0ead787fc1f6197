package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle HASHES of a single-space-tokenized text
  * column: semantically `array_distinct(transform(shingles(text, n), polyHash))`
  * — [[WordShingles]] fused with [[PolyHash]] — but the '_'-joined shingle
  * strings are never materialized: the polynomial hash streams over the
  * token characters directly, one codegen'd JVM loop per row.
  *
  * This is the index-side primitive for hash-keyed dedup pipelines
  * (candidate generation only ever needs the 64-bit key); measured ~2× on
  * the corpus shingling pass vs shingle-strings-then-hash, and the exploded
  * relation is Array[Long] instead of Array[String].
  *
  * Dedup happens on the HASH (a colliding pair of distinct shingles counts
  * once) — match the oracle with
  * `list_distinct(list_transform(shingles, polyhash))`.
  *
  * Reference: nvtext/generate_ngrams.hpp + the hashing discipline of
  * TextFunctions.polyHash.
  */
case class WordShingleHashes(child: Expression, n: Int,
                             distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (distinct) "graft_word_shingle_hashes" else "graft_word_span_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordShingleHashesImpl.eval(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WordShingleHashesImpl.eval($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashesImpl {
  /** distinct=true: the shingle SET (minhash/LSH input, insertion
    * order). distinct=false: ONE hash per window position, in window
    * order — the duplicate-span primitive (array index IS the token
    * position of the window start), semantically
    * `transform(wordNgrams(tokenize(text), n), polyHash)`. */
  def eval(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val out =
      if (distinct) null
      else new Array[Any](tokens.length - n + 1)
    val seen = if (distinct) new mutable.LinkedHashSet[Long] else null
    var i = 0
    while (i <= tokens.length - n) {
      var h = 0L
      var k = 0
      while (k < n) {
        if (k > 0) h = (h * 31L + '_') % PolyHashImpl.Mod
        val t = tokens(i + k)
        var j = 0
        while (j < t.length) {
          val cp = t.codePointAt(j)
          h = (h * 31L + cp) % PolyHashImpl.Mod
          j += Character.charCount(cp)
        }
        k += 1
      }
      if (distinct) seen.add(h) else out(i) = h
      i += 1
    }
    if (distinct)
      new GenericArrayData(seen.iterator.map(_.asInstanceOf[Any]).toArray[Any])
    else new GenericArrayData(out)
  }

  /** Back-compat entry (pre-r17 codegen sites compiled against it). */
  def eval(text: UTF8String, n: Int): ArrayData = eval(text, n, true)
}
