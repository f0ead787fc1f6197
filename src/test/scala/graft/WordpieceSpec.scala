package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.WordpieceImpl
import graft.text.TextFunctions

/** WordPiece verified against an independent recursive reference
  * implementation and the canonical BERT examples. */
class WordpieceSpec extends AnyFunSuite {

  private def vocabSet(v: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    v.foreach(s.add)
    s
  }

  /** Independent reference: recursive greedy longest-match. */
  private def refTokenize(word: String, vocab: Set[String]): List[String] = {
    def go(pos: Int): Option[List[String]] =
      if (pos == word.length) Some(Nil)
      else {
        val prefix = if (pos == 0) "" else "##"
        // greedy: longest piece first, NO backtracking (BERT semantics)
        (word.length to (pos + 1) by -1).view
          .map(end => prefix + word.substring(pos, end))
          .find(vocab.contains)
          .flatMap { piece =>
            val end = pos + piece.length - prefix.length
            go(end).map(piece :: _)
          }
      }
    if (word.isEmpty) Nil
    else go(0).getOrElse(List("[UNK]"))
  }

  test("canonical BERT example: unaffable") {
    val v = Seq("un", "##aff", "##able", "aff", "able")
    assert(WordpieceImpl.tokenizeWord("unaffable", vocabSet(v)) ==
      List("un", "##aff", "##able"))
  }

  test("no-match word collapses to [UNK] as a whole") {
    val v = Seq("un", "##aff")
    assert(WordpieceImpl.tokenizeWord("unaffable", vocabSet(v)) == List("[UNK]"))
    assert(WordpieceImpl.tokenizeWord("xyz", vocabSet(Seq("a"))) == List("[UNK]"))
  }

  test("matches the independent reference on fuzzed words over the real vocab") {
    val vocab = TextFunctions.WordpieceVocab
    val vs = vocabSet(vocab)
    val vset = vocab.toSet
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0139"
    for (_ <- 1 to 2000) {
      val w = (0 until 1 + rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(WordpieceImpl.tokenizeWord(w, vs) == refTokenize(w, vset), s"word=[$w]")
    }
  }

  test("full-text eval lowercases and splits on single spaces") {
    val got = WordpieceImpl.eval(
      UTF8String.fromString("The TABLE"), vocabSet(TextFunctions.WordpieceVocab))
      .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(got == Seq("the", "tab", "##le"))
  }

  test("overlong word becomes [UNK]") {
    val w = "a" * 101
    assert(WordpieceImpl.tokenizeWord(w, vocabSet(Seq("a", "##a"))) == List("[UNK]"))
  }
}
