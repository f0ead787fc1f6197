package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first WordPiece subword tokenization (the BERT
  * algorithm; reference surface: nvtext subword_tokenize,
  * cpp/include/nvtext/subword_tokenize.hpp + python
  * core/subword_tokenizer.py — cuDF loads a hashed vocabulary and emits
  * token ids; this implementation emits the subword STRINGS against a
  * supplied vocabulary, which keeps it engine-checkable).
  *
  * Per word (single-space tokenization, lowercased): repeatedly take the
  * longest vocab prefix; continuations are matched with the "##" prefix
  * convention; a word with no match at some position becomes a single
  * [UNK]. Deterministic, partition-local, one JVM loop per row (codegen).
  */
case class WordpieceTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    WordpieceImpl.eval(input.asInstanceOf[UTF8String], vocabSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("wordpieceVocab", vocabSet,
      "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordpieceImpl.eval($c, $vocabRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordpieceTokenize =
    copy(child = newChild)
}

object WordpieceImpl {
  final val Unk = "[UNK]"
  final val MaxWordLen = 100 // BERT convention: overlong words → [UNK]

  def tokenizeWord(word: String, vocab: java.util.HashSet[String]): List[String] = {
    if (word.isEmpty) return Nil
    if (word.length > MaxWordLen) return List(Unk)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (end > start && found == null) {
        val piece = word.substring(start, end)
        val candidate = if (start == 0) piece else "##" + piece
        if (vocab.contains(candidate)) found = candidate else end -= 1
      }
      if (found == null) return List(Unk)
      out += found
      start = end
    }
    out.toList
  }

  def eval(text: UTF8String, vocab: java.util.HashSet[String]): ArrayData = {
    val words = text.toString.toLowerCase.split(" ", -1)
    val pieces = words.iterator.flatMap(w => tokenizeWord(w, vocab))
      .map(p => UTF8String.fromString(p): Any).toArray
    new GenericArrayData(pieces)
  }
}
