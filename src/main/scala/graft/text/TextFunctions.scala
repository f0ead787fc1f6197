package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text / LLM-data-pipeline primitives (SURVEY §2.8 nvtext + north-star
  * extensions: dedup, similarity, text analysis).
  *
  * Everything here is a pure Catalyst column expression (higher-order array
  * functions, no UDFs) so it stays inside whole-stage codegen and is
  * partition-local — the shuffle-bearing operators built from these
  * (LSH banding joins, near-dup groupBys) shuffle only small derived keys,
  * never the raw text. That is the property that makes them viable at 100 TB:
  * signature computation is embarrassingly parallel over rows, and the only
  * exchanged data is k integers per document.
  *
  * Reference anchors: nvtext tokenize (cpp/include/nvtext/tokenize.hpp),
  * generate_ngrams (generate_ngrams.hpp), minhash is the standard
  * shingle→permute→band construction (Broder '97), simhash per Charikar '02.
  */
object TextFunctions {

  val HashMod = 1000000007L // prime modulus for all integer hashes

  /** Single-space tokenization (nvtext/tokenize.hpp default delimiter).
    * Deliberately split(" ") — not \s+ — so Spark and the DuckDB oracle's
    * string_split(text, ' ') agree on runs of spaces/tabs/newlines.
    * For whitespace-run collapsing use [[tokenizeWs]].
    */
  def tokenize(text: Column): Column = split(text, " ")

  /** Whitespace-run tokenization (collapses \s+); oracle side must use
    * regexp_split_to_array with the same pattern. */
  def tokenizeWs(text: Column): Column = split(text, "\\s+")

  /** Deterministic polynomial rolling hash of a string: fold over UTF-8 code
    * points, h ← (31·h + c) mod p. Same integer arithmetic is expressible in
    * any SQL engine, which is what makes oracle checking possible. Evaluated
    * by the codegen'd native expression [[graft.expressions.PolyHash]] (one
    * JVM loop per string, not an interpreted per-char expression tree).
    */
  def polyHash(s: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.PolyHash(org.apache.spark.sql.graft.Bridge.expression(s)))

  /** Word n-grams joined with '_' (nvtext/generate_ngrams.hpp). Guarded
    * against Spark's descending sequence() for rows with < n tokens.
    */
  def wordNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(
        sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws("_", (0 until n).map(k => element_at(tokens, i + k)): _*)))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Character n-grams of a single token. Guarded: Spark's sequence(a, b)
    * counts DOWN when b < a, so short strings must short-circuit to empty.
    */
  def charNgrams(s: Column, n: Int): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Distinct word-shingle set of a text column (the minhash input).
    * Codegen'd native expression — see [[graft.expressions.WordShingles]];
    * identical semantics to array_distinct(wordNgrams(tokenize(text), n)).
    */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.WordShingles(
        org.apache.spark.sql.graft.Bridge.expression(text), n))

  /** Distinct word-shingle HASH set — [[shingles]] fused with [[polyHash]],
    * no shingle strings materialized (expressions/WordShingleHashes). The
    * index-side primitive for hash-keyed candidate generation; oracle
    * equivalent: list_distinct(list_transform(shingles, polyhash)). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.WordShingleHashes(
        org.apache.spark.sql.graft.Bridge.expression(text), n))

  /** One hash PER WINDOW POSITION, in window order (duplicates kept —
    * the array index is the window's start-token position): the
    * duplicate-span primitive, [[shingleHashes]] without the distinct.
    * Oracle equivalent: list_transform(n-gram windows, polyhash). */
  def spanHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.WordShingleHashes(
        org.apache.spark.sql.graft.Bridge.expression(text), n,
        distinct = false))

  /** Shingle fingerprints: polyHash per shingle. Materialize this as its own
    * column (withColumn) before building signatures — polyHash is expensive
    * and must be computed once per shingle, not once per signature position.
    * (CollapseProject won't inline a non-cheap aliased expression that is
    * referenced more than once, so the column boundary is the CSE mechanism.)
    */
  def shingleFingerprints(shingleCol: Column): Column =
    transform(shingleCol, s => polyHash(s))

  /** MinHash signature from materialized fingerprints: k permutation-hashes
    * h_i(x) = ((2i+1)·x + 7919·i) mod p minimized over the fingerprints.
    * Returns Array[Long] of length k. Partition-local; no shuffle.
    */
  def minhashFromFps(fps: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(fps, f => ((lit(2) * i + 1) * f + i * 7919L) % HashMod)))

  /** Convenience composition — only for small/one-shot use; prefer
    * shingleFingerprints + minhashFromFps with column materialization.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    minhashFromFps(shingleFingerprints(shingleCol), k)

  /** LSH band keys from a minhash signature: rowsPerBand consecutive hashes
    * concatenated per band. Joining on (band, key) finds candidate pairs with
    * jaccard ≳ threshold — the only shuffled payload is these short strings.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws("_",
        (0 until rowsPerBand).map(r =>
          element_at(sig, b * rowsPerBand + r + 1).cast(StringType)): _*))

  /** Exact Jaccard similarity of two string-array columns (verification
    * step after LSH candidate generation). Single-pass codegen expression —
    * see [[graft.expressions.JaccardSim]]; semantics identical to
    * size(array_intersect)/size(array_union). */
  def jaccard(a: Column, b: Column): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(graft.expressions.JaccardSim(B.expression(a), B.expression(b)))
  }

  /** Jaccard similarity of two STRICTLY-ASCENDING distinct long-array
    * columns (hash sets sorted once per row — `array_sort(shingleHashes)`)
    * with threshold early-exit: rows provably under `threshold` may return
    * -1.0 instead of the exact value, so compose it with the matching
    * `>= threshold` filter. The LSH verify kernel — one merge pass per
    * candidate pair, no allocation; see [[graft.expressions.LongJaccardSim]].
    */
  def jaccardHashes(a: Column, b: Column,
                    threshold: Double = Double.NegativeInfinity): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(graft.expressions.LongJaccardSim(
      B.expression(a), B.expression(b), threshold))
  }

  /** SimHash over token hashes, `bits` wide: bit j is set iff the sum of
    * ±1 votes (per token, by that token-hash's bit j) is positive.
    * One codegen'd pass ([[graft.expressions.SimHash]]) — each token
    * hashes ONCE and votes on every bit; the former builtin composition
    * ran `bits` interpreted aggregate() HOFs whose collapsed projections
    * re-hashed every token per bit.
    */
  def simhash(tokens: Column, bits: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.SimHash(
        org.apache.spark.sql.graft.Bridge.expression(tokens), bits))

  /** Porter stemmer measure m (nvtext/stemmer.hpp), with the full y-rule:
    * 'y' is a vowel iff preceded by a consonant (Porter's cons(i) =
    * !cons(i-1) for y, consonant at position 0). The backreference pass
    * implements exactly that: each vowel canonicalizes to 'a', then a
    * global non-overlapping "([^a])y" → "$1a" classifies y-chains the way
    * the recursive definition does (consumed match = classified consonant,
    * so "syzygy" vowelizes all three y's while "toy"'s y stays consonant).
    * Vowel runs then collapse to 'V'; m = number of V→C transitions.
    */
  def porterMeasure(word: Column): Column = {
    val vowels = regexp_replace(lower(word), "[aeiou]", "a")
    val yRule = regexp_replace(vowels, "([^a])y", "$1a")
    val collapsed = regexp_replace(yRule, "a+", "V")
    size(regexp_extract_all(collapsed, lit("V[^V]+"), lit(0)))
  }

  /** is_letter(VOWEL/CONSONANT, i) (nvtext/stemmer.hpp:77): classify the
    * character at 1-based position i under the same y-rule canonicalization
    * as [[porterMeasure]] — the canonical form has 'a' exactly at vowel
    * positions (replacements are 1 char per 1 char, so positions align). */
  def porterIsVowel(word: Column, i: Column): Column = {
    val vowels = regexp_replace(lower(word), "[aeiou]", "a")
    val yRule = regexp_replace(vowels, "([^a])y", "$1a")
    yRule.substr(i, lit(1)) === "a"
  }

  /** normalize_spaces (nvtext/normalize.hpp): collapse runs of whitespace. */
  def normalizeSpaces(s: Column): Column = trim(regexp_replace(s, "\\s+", " "))

  /** character_tokenize (nvtext/tokenize.hpp:96): one token per character.
    * Guarded: sequence(a, b) counts DOWN for b < a, so empty strings
    * short-circuit to an empty array. */
  def characterTokenize(s: Column): Column =
    when(length(s) >= 1,
      transform(sequence(lit(1), length(s)), i => s.substr(i, lit(1))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** normalize_characters (nvtext/normalize.hpp:72), simplified to the
    * engine-checkable core: lowercase + strip a fixed table of accented
    * latin-1 characters (the reference's full unicode decomposition tables
    * are data, not algorithm — the per-row, shuffle-free shape is the same).
    */
  val AccentFrom = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
  val AccentTo = "aaaaaaceeeeiiiinooooouuuuyy"
  def normalizeCharacters(s: Column): Column =
    translate(lower(s), AccentFrom, AccentTo)

  /** replace_tokens / filter_tokens (nvtext/replace.hpp). */
  def replaceTokens(tokens: Column, from: String, to: String): Column =
    transform(tokens, t => when(t === from, lit(to)).otherwise(t))

  def filterTokens(tokens: Column, minLen: Int): Column =
    filter(tokens, t => length(t) >= minLen)

  /** WordPiece vocabulary for [[wordpiece]]: all single alphanumerics as
    * word-starts and continuations (so alphanumeric words never hit [UNK])
    * plus multi-char pieces drawn from the corpus vocabulary — the greedy
    * matcher prefers these, producing realistic subword splits.
    */
  val WordpieceVocab: Seq[String] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val multi = Seq(
      "the", "ta", "wind", "qu", "str", "val", "sort", "filt", "tab",
      "##ble", "##ow", "##ery", "##eam", "##ue", "##er", "##le", "##ing",
      "##tion", "##ata", "##am")
    singles ++ singles.map("##" + _) ++ multi
  }

  /** Greedy longest-match WordPiece subword tokenization (BERT algorithm;
    * nvtext/subword_tokenize.hpp + core/subword_tokenizer.py — emits piece
    * strings instead of hashed ids to stay engine-checkable). Codegen'd
    * native expression, one JVM loop per row. */
  def wordpiece(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.WordpieceTokenize(
        org.apache.spark.sql.graft.Bridge.expression(text), WordpieceVocab))

  /** BPE-ish token count: word tokens + punctuation tokens via regex. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Crude subword-budget estimate: Σ ceil(len(word)/4). */
  def subwordEstimate(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => acc + ceil(length(t) / 4.0).cast(LongType))

  /** Stopword ratio against a fixed set (quality scoring + lang-ID input). */
  def stopwordRatio(tokens: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens, t => array_contains(sw, t))).cast(DoubleType) / size(tokens)
  }

  /** Token positions covered by ≥ 1 window of `span` tokens starting at the
    * SORTED 0-based positions in `dpos`: interval-merge fold, O(|dpos|) per
    * row (newly covered by window i = (i+span−1) − max(i−1, lastEnd),
    * clamped at 0). The sorted-input contract is the caller's — feed it
    * sort_array/collect_set output.
    */
  def spanCoverage(dpos: Column, span: Int): Column =
    aggregate(
      dpos,
      struct(lit(0L).as("cov"), lit(-1L).as("lastend")),
      (acc, i) => struct(
        (acc.getField("cov") + greatest(lit(0L),
          i.cast(LongType) + (span - 1) -
            greatest(i.cast(LongType) - 1, acc.getField("lastend")))).as("cov"),
        greatest(acc.getField("lastend"), i.cast(LongType) + (span - 1)).as("lastend")),
      acc => acc.getField("cov"))

  /** Document fingerprint: minimum polynomial hash over sliding character
    * windows (winnowing-style, single window size). Bounded to the first
    * `prefixLen` chars so cost is O(prefixLen) per row.
    */
  def fingerprint(text: Column, window: Int, prefixLen: Int): Column = {
    val prefix = substring(text, 1, prefixLen)
    array_min(transform(
      sequence(lit(1), greatest(length(prefix) - (window - 1), lit(1))),
      i => polyHash(prefix.substr(i, lit(window)))))
  }
}
