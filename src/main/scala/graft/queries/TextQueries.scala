package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.text.TextFunctions._

/** nvtext operator surface + text-analysis extensions (SURVEY §2.8 nvtext;
  * north-star: lang-ID, quality scoring, token counting, fingerprinting).
  * All run over the documents table; every op is a partition-local column
  * expression.
  */
object TextQueries extends QueryPack {

  // Shared oracle fragment: polynomial string hash in DuckDB SQL.
  // list_reduce has no init element, so 0 is prepended.
  private def sqlPolyHash(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), ch -> CAST(ascii(ch) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % 1000000007)"

  // --- tokenize + counts (nvtext/tokenize.hpp, token_count) -----------------
  register("text_tokenize",
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |  string_split(text, ' ')[1] AS first_token,
      |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_regex_tokens,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(text, ' '), t -> CAST(ceil(length(t) / 4.0) AS BIGINT))),
      |    (a, b) -> a + b) AS n_subword_est
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = tokenize(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        element_at(toks, 1).as("first_token"),
        regexTokenCount(col("text")).as("n_regex_tokens"),
        subwordEstimate(toks).as("n_subword_est"))
      .orderBy("doc_id")
  }

  // --- word + character n-grams (generate_ngrams.hpp) -----------------------
  // n-gram arrays flattened to '|'-joined strings for the driver's compare
  register("text_ngrams",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id <= 100)
      |SELECT doc_id,
      |  coalesce(array_to_string(list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i+1]), '|'), '') AS bigrams,
      |  len(list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2]))) AS n_distinct_trigrams,
      |  coalesce(array_to_string(list_transform(range(1, length(toks[1]) - 1), i -> substring(toks[1], i, 3)), '|'), '') AS char_trigrams
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = tokenize(col("text"))
    Tables.documents(s, d)
      .filter(col("doc_id") <= 100)
      .select(col("doc_id"),
        array_join(wordNgrams(toks, 2), "|").as("bigrams"),
        size(array_distinct(wordNgrams(toks, 3))).as("n_distinct_trigrams"),
        array_join(charNgrams(element_at(toks, 1), 3), "|").as("char_trigrams"))
      .orderBy("doc_id")
  }

  // --- WordPiece subword tokenization (nvtext/subword_tokenize.hpp;
  // core/subword_tokenizer.py). Greedy longest-match is iterative and not
  // expressible in oracle SQL, so the oracle is a golden literal table.
  // Inputs are LITERAL sentences (covering multi-piece vocab hits,
  // punctuation → [UNK], and accented chars → [UNK]), so the golden is
  // valid at ANY scale factor — it pins only the matcher + vocab. The
  // algorithm is independently verified in WordpieceSpec.
  register("text_wordpiece",
    """SELECT * FROM (VALUES
      |  (0, 12, 'the|str|##eam|##ing|tab|##le|sort|##s', 0),
      |  (1, 10, 'wind|##ow|##s|qu|##ery|d|##ata|val', 0),
      |  (2, 13, 'tab|##u|##l|##a|##t|##e|the|qu', 0),
      |  (3, 8, 'filt|##er|##ing|[UNK]|sort|##e|##d|[UNK]', 2),
      |  (4, 14, 'e|##t|##a|##t|n|##a|##i|##v', 1),
      |  (5, 24, 's|##p|##a|##r|##k|##4|s|##h', 0),
      |  (6, 17, 'qu|##ery|##ing|tab|##le|##s|d|##u', 0),
      |  (7, 12, 'val|##u|##a|##tion|o|##f|the|wind', 0)
      |) t(doc_id, n_pieces, head_pieces, n_unk) ORDER BY doc_id""".stripMargin) { (s, _) =>
    import s.implicits._
    val sents = Seq(
      (0, "the streaming table sorts fast"),
      (1, "windows query data values"),
      (2, "tabulate the quick stream"),
      (3, "filtering windows, sorted rows!"),
      (4, "etat naive cafe été"),
      (5, "spark4 shuffles 1000 partitions"),
      (6, "querying tables during compaction"),
      (7, "valuation of the windowing stream")).toDF("doc_id", "text")
    val pieces = wordpiece(col("text"))
    sents
      .select(col("doc_id"),
        size(pieces).as("n_pieces"),
        array_join(slice(pieces, 1, 8), "|").as("head_pieces"),
        size(filter(pieces, p => p === "[UNK]")).as("n_unk"))
      .orderBy("doc_id")
  }

  // --- token-budget packing: assign docs to fixed-budget training bins ------
  // The batch-assembly step of a training pipeline: documents are packed
  // into 8192-token bins in stable doc_id order; a doc's bin is decided by
  // its STARTING offset in the global token stream. The global running
  // total uses OrderedOps' two-phase numbering (per-partition partials +
  // broadcast prefix), so the packing of a 100-TB corpus never funnels
  // through a single task.
  register("text_token_budget_pack",
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |  sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t)
      |SELECT CAST(floor((cum - n_tokens) / 8192) AS BIGINT) AS bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
      |FROM c GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d)
      .select(col("doc_id"), size(tokenize(col("text"))).cast(LongType).as("n_tokens"))
    graft.ops.OrderedOps
      .withRunningTotal(base, col("n_tokens"), "cum", Seq(col("doc_id")))
      .withColumn("bin", floor((col("cum") - col("n_tokens")) / 8192).cast(LongType))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .orderBy("bin")
  }

  // --- character_tokenize + normalize_characters (tokenize.hpp:96,
  // normalize.hpp:72). The accent table only bites on injected literals —
  // the synthetic corpus is ASCII — so the normalization path is exercised
  // with a seeded accented prefix per row.
  register("text_char_tokenize",
    """WITH t AS (SELECT doc_id, string_split(text, ' ')[1] AS w FROM documents WHERE doc_id <= 200)
      |SELECT doc_id,
      |  array_to_string(string_split_regex(w, ''), '|') AS chars,
      |  length(w) AS n_chars,
      |  translate(lower('Éclair-Über_' || w),
      |    'àáâãäåçèéêëìíîïñòóôõöùúûüýÿ', 'aaaaaaceeeeiiiinooooouuuuyy') AS normalized
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = element_at(tokenize(col("text")), 1)
    Tables.documents(s, d)
      .filter(col("doc_id") <= 200)
      .select(col("doc_id"),
        array_join(characterTokenize(w), "|").as("chars"),
        length(w).as("n_chars"),
        normalizeCharacters(concat(lit("Éclair-Über_"), w)).as("normalized"))
      .orderBy("doc_id")
  }

  // --- edit-distance MATRIX (edit_distance.hpp:89 edit_distance_matrix):
  // all-pairs levenshtein within each row's token list — upper triangle,
  // flattened to (doc_id, i, j, lev). Per-row work is C(4,2) pairs; the
  // operator is a pure projection + two generators, no shuffle at all.
  register("text_edit_distance_matrix",
    """WITH t AS (SELECT doc_id, list_slice(string_split(text, ' '), 1, 4) AS tk
      |  FROM documents WHERE doc_id <= 30),
      |a AS (SELECT doc_id, tk, generate_subscripts(tk, 1) - 1 AS i, unnest(tk) AS ti FROM t),
      |b AS (SELECT doc_id, i, ti, generate_subscripts(tk, 1) - 1 AS j, unnest(tk) AS tj FROM a)
      |SELECT doc_id, i, j, levenshtein(ti, tj) AS lev
      |FROM b WHERE j > i ORDER BY doc_id, i, j""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 30)
      .select(col("doc_id"), slice(tokenize(col("text")), 1, 4).as("tk"))
      .select(col("doc_id"), col("tk"), posexplode(col("tk")).as(Seq("i", "ti")))
      .select(col("doc_id"), col("i"), col("ti"), posexplode(col("tk")).as(Seq("j", "tj")))
      .filter(col("j") > col("i"))
      .select(col("doc_id"), col("i"), col("j"), levenshtein(col("ti"), col("tj")).as("lev"))
      .orderBy("doc_id", "i", "j")
  }

  // --- edit distance (nvtext/edit_distance.hpp) -----------------------------
  register("text_edit_distance",
    """SELECT a.doc_id,
      |  levenshtein(string_split(a.text, ' ')[1], string_split(b.text, ' ')[1]) AS lev_first_tok,
      |  levenshtein(substring(a.text, 1, 30), substring(b.text, 1, 30)) AS lev_prefix
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |WHERE a.doc_id <= 100 ORDER BY a.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val a = docs.select(col("doc_id"), col("text").as("ta"))
    val b = docs.select((col("doc_id") - 1).as("doc_id"), col("text").as("tb"))
    a.join(b, Seq("doc_id"))
      .filter(col("doc_id") <= 100)
      .select(col("doc_id"),
        levenshtein(element_at(tokenize(col("ta")), 1),
          element_at(tokenize(col("tb")), 1)).as("lev_first_tok"),
        levenshtein(substring(col("ta"), 1, 30), substring(col("tb"), 1, 30)).as("lev_prefix"))
      .orderBy("doc_id")
  }

  // --- normalize / replace / filter tokens (normalize.hpp, replace.hpp) ----
  register("text_token_transforms",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id <= 100)
      |SELECT doc_id,
      |  trim(regexp_replace(replace(array_to_string(toks, ' '), 'a ', 'a  '), '\s+', ' ', 'g')) AS normalized,
      |  array_to_string(list_transform(toks, t -> CASE WHEN t = 'table' THEN 'TBL' ELSE t END)[1:8], '|') AS replaced_head,
      |  len(list_filter(toks, t -> length(t) >= 5)) AS n_long_tokens
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = tokenize(col("text"))
    Tables.documents(s, d)
      .filter(col("doc_id") <= 100)
      .select(col("doc_id"),
        normalizeSpaces(regexp_replace(array_join(toks, " "), "a ", "a  ")).as("normalized"),
        array_join(slice(replaceTokens(toks, "table", "TBL"), 1, 8), "|").as("replaced_head"),
        size(filterTokens(toks, 5)).as("n_long_tokens"))
      .orderBy("doc_id")
  }

  // --- porter stemmer measure (nvtext/stemmer.hpp, full y-rule) -------------
  register("text_porter_measure",
    """WITH t AS (SELECT doc_id, string_split(text, ' ')[1] AS w FROM documents WHERE doc_id <= 200)
      |SELECT doc_id, w,
      |  len(regexp_extract_all(
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(lower(w), '[aeiou]', 'a', 'g'),
      |        '([^a])y', '\1a', 'g'),
      |      'a+', 'V', 'g'),
      |    'V[^V]+')) AS measure
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 200)
      .select(col("doc_id"), element_at(tokenize(col("text")), 1).as("w"))
      .withColumn("measure", porterMeasure(col("w")))
      .orderBy("doc_id")
  }

  // --- is_letter vowel/consonant classification (nvtext/stemmer.hpp:77) ----
  // The per-position companion to porter_stemmer_measure: classify the
  // first and last character of each word under the y-rule. Pure per-row
  // expressions, fused into the scan.
  register("text_porter_is_letter",
    """WITH t AS (SELECT doc_id, string_split(text, ' ')[1] AS w FROM documents WHERE doc_id <= 200),
      |c AS (SELECT doc_id, w,
      |  regexp_replace(regexp_replace(lower(w), '[aeiou]', 'a', 'g'), '([^a])y', '\1a', 'g') AS canon
      |FROM t)
      |SELECT doc_id, w,
      |  substring(canon, 1, 1) = 'a' AS first_is_vowel,
      |  substring(canon, length(canon), 1) = 'a' AS last_is_vowel
      |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 200)
      .select(col("doc_id"), element_at(tokenize(col("text")), 1).as("w"))
      .select(col("doc_id"), col("w"),
        porterIsVowel(col("w"), lit(1)).as("first_is_vowel"),
        porterIsVowel(col("w"), length(col("w"))).as("last_is_vowel"))
      .orderBy("doc_id")
  }

  // --- language ID: stopword-profile scoring (n-gram heuristic) -------------
  // Profiles are tiny fixed sets; argmax with deterministic tie-break on
  // profile order. (The corpus vocabulary is synthetic; the operator shape —
  // per-row profile scoring, no shuffle — is the deliverable.)
  register("text_lang_id",
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      |scored AS (SELECT doc_id, lang,
      |  CAST(len(list_filter(toks, w -> list_contains(['the','a','value','table'], w))) AS DOUBLE) / len(toks) AS s_en,
      |  CAST(len(list_filter(toks, w -> list_contains(['query','sort','filter'], w))) AS DOUBLE) / len(toks) AS s_fr,
      |  CAST(len(list_filter(toks, w -> list_contains(['window','stream','batch'], w))) AS DOUBLE) / len(toks) AS s_de
      |FROM t)
      |SELECT doc_id, lang,
      |  CASE WHEN s_en >= s_fr AND s_en >= s_de THEN 'en'
      |       WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END AS predicted,
      |  round(greatest(s_en, s_fr, s_de), 6) AS confidence
      |FROM scored ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = tokenize(col("text"))
    val sEn = stopwordRatio(toks, Seq("the", "a", "value", "table"))
    val sFr = stopwordRatio(toks, Seq("query", "sort", "filter"))
    val sDe = stopwordRatio(toks, Seq("window", "stream", "batch"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        sEn.as("s_en"), sFr.as("s_fr"), sDe.as("s_de"))
      .select(col("doc_id"), col("lang"),
        when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de"), "en")
          .when(col("s_fr") >= col("s_de"), "fr").otherwise("de").as("predicted"),
        round(greatest(col("s_en"), col("s_fr"), col("s_de")), 6).as("confidence"))
      .orderBy("doc_id")
  }

  // --- quality scoring: length/stopword/uniqueness ratios -------------------
  register("text_quality",
    """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  len(toks) AS n_tokens,
      |  round(CAST(n_chars AS DOUBLE) / len(toks), 6) AS mean_token_len,
      |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS uniq_ratio,
      |  round(CAST(len(list_filter(toks, w -> list_contains(['the','a'], w))) AS DOUBLE) / len(toks), 6) AS stopword_ratio,
      |  CAST(len(toks) BETWEEN 20 AND 90
      |    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.2 AS BOOLEAN) AS keep
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = tokenize(col("text"))
    val uniqRatio = size(array_distinct(toks)).cast(DoubleType) / size(toks)
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        round(col("n_chars").cast(DoubleType) / size(toks), 6).as("mean_token_len"),
        round(uniqRatio, 6).as("uniq_ratio"),
        round(stopwordRatio(toks, Seq("the", "a")), 6).as("stopword_ratio"),
        (size(toks).between(20, 90) && uniqRatio > 0.2).as("keep"))
      .orderBy("doc_id")
  }

  // --- document fingerprint (winnowing-style min rolling hash) --------------
  register("text_fingerprint",
    s"""SELECT doc_id,
       |  list_min(list_transform(range(1, greatest(length(substring(text, 1, 64)) - 7, 1) + 1),
       |    i -> ${sqlPolyHash("substring(substring(text, 1, 64), i, 8)")})) AS fp64
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text"), 8, 64).as("fp64"))
      .orderBy("doc_id")
  }

  // --- repetition quality metrics (Gopher-style repetition filters:
  // Rae et al. 2021 §A1.1 — duplicate n-gram fraction and top-token share
  // are THE pretraining quality gates for removing boilerplate/spam).
  // top-token share needs a per-(doc, token) count: explode → two hash
  // aggregations, all map-side-combinable — no window, no driver loop.
  // The bigram-duplication fraction is a pure per-row expression.
  register("text_repetition_metrics",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |tc AS (SELECT doc_id, tok, count(*) AS c
      |       FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
      |ts AS (SELECT doc_id, max(c) AS top_cnt, CAST(sum(c) AS BIGINT) AS n_tokens FROM tc GROUP BY 1),
      |bs AS (SELECT doc_id,
      |         len(list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i+1])) AS nb,
      |         len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i+1]))) AS ndb
      |       FROM t)
      |SELECT ts.doc_id, n_tokens,
      |  round(CAST(top_cnt AS DOUBLE) / n_tokens, 6) AS top_token_share,
      |  CASE WHEN nb = 0 THEN 0.0
      |       ELSE round(1.0 - CAST(ndb AS DOUBLE) / nb, 6) END AS dup_bigram_frac
      |FROM ts JOIN bs ON ts.doc_id = bs.doc_id
      |ORDER BY ts.doc_id""".stripMargin) { (s, d) =>
    val toks = tokenize(col("text"))
    // bg is materialized as its OWN column before being referenced three
    // times: CollapseProject will not inline a non-cheap aliased expression
    // with multiple references (the shingleFingerprints CSE pattern), so the
    // bigram transform runs once per row, not 3×. The per-row dup fraction
    // then rides THROUGH both aggregations as first() instead of paying a
    // separate shuffle join back onto the per-doc shares.
    val base = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("t"))
      .withColumn("bg", wordNgrams(col("t"), 2))
      .withColumn("dup_bigram_frac",
        when(size(col("bg")) === 0, 0.0)
          .otherwise(round(lit(1.0) -
            size(array_distinct(col("bg"))).cast(DoubleType) / size(col("bg")), 6)))
    base
      .select(col("doc_id"), col("dup_bigram_frac"), explode(col("t")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"), first(col("dup_bigram_frac")).as("dup_bigram_frac"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_cnt"), sum(col("c")).as("n_tokens"),
        first(col("dup_bigram_frac")).as("dup_bigram_frac"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("top_cnt").cast(DoubleType) / col("n_tokens"), 6).as("top_token_share"),
        col("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  // --- corpus-scale WordPiece invariant --------------------------------------
  // text_wordpiece pins the matcher on literal sentences (sf-independent
  // golden); this runs the tokenizer over the WHOLE corpus and gates the
  // lossless-ness invariant the greedy matcher guarantees on in-vocab text:
  // pieces stripped of '##' re-concatenate to the input without its spaces,
  // and nothing falls to [UNK] (the corpus is lowercase alphanumeric, which
  // the vocab covers by construction). SQL can't tokenize, but it CAN demand
  // the invariant hold everywhere — a full-corpus gate at every sf.
  register("text_wordpiece_corpus",
    """SELECT doc_id, true AS roundtrip_ok, 0 AS n_unk
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pieces = wordpiece(col("text"))
    // widen: the longest-match WordPiece tokenizer is the heaviest per-row
    // expression in the pack and the single-row-group fixture scans as one
    // task — identity on pre-split inputs (see ScanParallel)
    graft.ops.ScanParallel.widen(Tables.documents(s, d))
      .select(col("doc_id"),
        (array_join(transform(pieces, p => regexp_replace(p, "^##", "")), "")
          === regexp_replace(col("text"), " ", "")).as("roundtrip_ok"),
        size(filter(pieces, p => p === "[UNK]")).cast(IntegerType).as("n_unk"))
      .orderBy("doc_id")
  }

  // --- TF-IDF keyword extraction (north-star text analysis) -----------------
  // Per-doc top-3 terms by tf·idf, idf = ln((N+1)/(df+1)). Two shuffles —
  // (doc, term) then term — both partial-aggregated map-side; the corpus
  // count N is one scalar broadcast, never a driver collect. The top-k is
  // a per-doc WindowGroupLimit (k rows per doc leave each map task), so the
  // window sorts k·docs rows, not the token stream. Ties are broken by term
  // so the rank is total and engine-independent.
  register("text_tfidf_topk",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n FROM documents),
      |w AS (SELECT doc_id, term,
      |    round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, term, tfidf FROM (
      |  SELECT doc_id, term, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      |  FROM w) WHERE rk <= 3
      |ORDER BY doc_id, tfidf DESC, term""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"), explode(tokenize(col("text"))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)), 6).as("tfidf"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    w.withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
  }

  // --- bigram LM quality score (perplexity-style, north-star) ---------------
  // Corpus bigram model with add-one smoothing: P(w2|w1) = (c12+1)/(c1+V);
  // per-doc score = mean −ln P over its bigrams. Counts are corpus-scale
  // aggregates (two shuffles, map-side combined); the per-doc mean sums
  // DECIMAL(18,6)-rounded terms so the fold is order-independent — the
  // repo's exact-decimal pattern applied to log-probs.
  register("text_bigram_lm_score",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg0 AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(toks)),
      |      i -> {'big': toks[i] || chr(9) || toks[i+1], 'w1': toks[i]})) AS p
      |  FROM t),
      |bg AS (SELECT doc_id, p.big AS big, p.w1 AS w1 FROM bg0),
      |uni AS (SELECT doc_id, unnest(toks) AS w FROM t),
      |c1 AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
      |c12 AS (SELECT big, count(*) AS c12 FROM bg GROUP BY big),
      |v AS (SELECT count(*) AS v FROM c1),
      |term AS (SELECT bg.doc_id,
      |    CAST(round(-ln((c12.c12 + 1.0) / (c1.c1 + v.v)), 6) AS DECIMAL(18,6)) AS nll
      |  FROM bg JOIN c12 USING (big)
      |  JOIN c1 ON c1.w = bg.w1
      |  CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(CAST(sum(nll) AS DOUBLE) / count(*), 6) AS avg_nll
      |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d).select(col("doc_id"), tokenize(col("text")).as("toks"))
    // adjacent-pair generation is a per-row HOF (slice + transform with the
    // outer array in scope) — no self-join, no shuffle to form bigrams.
    // Bigram INSTANCES collapse to per-(doc, bigram) multiplicities before
    // anything else reads them: every instance of one (doc, big) carries
    // the SAME rounded nll term, so sum(m · nll) / sum(m) is the identical
    // decimal fold — the bg relation serves both the corpus bigram counts
    // (re-aggregated from multiplicities) and the probe side of the
    // scoring join, one tokenize+explode pass instead of two, with
    // join/shuffle volume in distinct bigrams rather than instances.
    // NOT pinned: both consumers read the same (doc,big,w1) aggregate, so
    // ReuseExchange already shares the one shuffle — a persist here only
    // added string-relation cache-write cost (A/B: 1.85 s vs 1.51 s).
    val bg = t.select(col("doc_id"),
        explode(expr("transform(slice(toks, 1, size(toks) - 1), " +
          "(x, i) -> struct(x AS w1, toks[i + 1] AS w2))")).as("p"))
      .select(col("doc_id"),
        concat_ws("\t", col("p.w1"), col("p.w2")).as("big"),
        col("p.w1").as("w1"))
      .groupBy(col("doc_id"), col("big"), col("w1"))
      .agg(count(lit(1)).as("m"))
    val uni = t.select(col("doc_id"), explode(col("toks")).as("w"))
    val c1 = uni.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val c12 = bg.groupBy(col("big")).agg(sum(col("m")).as("c12"))
    val v = c1.agg(count(lit(1)).as("v"))
    val term = bg.join(c12, Seq("big"))
      .join(c1.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("m"),
        round(-log((col("c12") + 1.0) / (col("c1") + col("v"))), 6)
          .cast(DecimalType(18, 6)).as("nll"))
    term.groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        // cast the exact decimal sum to DOUBLE before dividing — decimal
        // division has its own rounding and would drift from the
        // original double(sum)/count
        round(sum(col("m") * col("nll")).cast(DoubleType) / sum(col("m")), 6)
          .as("avg_nll"))
      .orderBy("doc_id")
  }

  // --- URL/domain filtering (web-corpus prep: host extraction + blocklist) --
  // URLs are synthesized deterministically from (source, lang, doc_id); the
  // operator under test is Spark's codegen parse_url (HOST / PATH / QUERY
  // key) + a broadcast-anti-join blocklist + per-domain rollup — the
  // domain-level filter stage every crawl pipeline runs before dedup. The
  // blocklist is an explicit anti-join (the production shape: blocklists are
  // tables, not literals); at corpus scale it broadcasts.
  register("text_url_domain",
    """WITH u AS (SELECT doc_id, lang, source,
      |    concat('https://', source, '.example.com/', lang, '/doc-', doc_id,
      |           '?ref=', source, '&id=', doc_id) AS url
      |  FROM documents),
      |p AS (SELECT doc_id, lang, source,
      |    regexp_extract(url, 'https://([^/]+)/', 1) AS host,
      |    regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
      |    regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref_param
      |  FROM u),
      |kept AS (SELECT * FROM p WHERE source NOT IN ('src3', 'src7'))
      |SELECT host, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
      |  min(doc_id) AS min_doc, min(path) AS sample_path, min(ref_param) AS ref_src
      |FROM kept GROUP BY host ORDER BY host""".stripMargin) { (s, d) =>
    val u = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        concat(lit("https://"), col("source"), lit(".example.com/"), col("lang"),
          lit("/doc-"), col("doc_id"), lit("?ref="), col("source"),
          lit("&id="), col("doc_id")).as("url"))
    val p = u.select(col("doc_id"), col("lang"), col("source"),
      parse_url(col("url"), lit("HOST")).as("host"),
      parse_url(col("url"), lit("PATH")).as("path"),
      parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref_param"))
    val block = u.sparkSession.createDataFrame(
      Seq("src3", "src7").map(Tuple1.apply)).toDF("source")
    p.join(broadcast(block), Seq("source"), "left_anti")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("doc_id")).as("min_doc"),
        min(col("path")).as("sample_path"),
        min(col("ref_param")).as("ref_src"))
      .orderBy("host")
  }

  // --- detokenize (nvtext/tokenize.hpp detokenize): reassemble documents
  // from (row_id, position, token) triples — the inverse of tokenize, and
  // the write path of every token-level transform. Roundtrip gate: explode
  // with position, regroup per doc ordered by position, and the rebuilt
  // string must equal the source byte-for-byte. One shuffle on doc_id.
  register("text_detokenize",
    """WITH tok AS (SELECT doc_id, text,
      |    unnest(string_split(text, ' ')) AS token,
      |    generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents WHERE doc_id <= 200),
      |back AS (SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS rebuilt,
      |    min(text) AS text FROM tok GROUP BY doc_id)
      |SELECT doc_id, rebuilt = text AS roundtrip_ok, substring(rebuilt, 1, 30) AS head
      |FROM back ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 200)
      .select(col("doc_id"), col("text"),
        posexplode(tokenize(col("text"))).as(Seq("pos", "token")))
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")), " ").as("rebuilt"),
        min(col("text")).as("text"))
      .select(col("doc_id"), (col("rebuilt") === col("text")).as("roundtrip_ok"),
        substring(col("rebuilt"), 1, 30).as("head"))
      .orderBy("doc_id")
  }

  // --- PII redaction (corpus-prep scrub pass, north-star) -------------------
  // Emails / IPv4s / phone numbers are counted and replaced with typed
  // placeholder tokens — the standard scrub every web corpus runs before
  // training. PII is synthesized deterministically from (doc_id, source) so
  // the op is exercised at any scale factor; the patterns are written in the
  // dialect intersection of Java regex and RE2 (no backrefs, no lookaround)
  // so both engines compile them identically. Pure per-row codegen
  // expressions — zero shuffles, scales embarrassingly.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\+1-555-\\d{4}"
  register("text_pii_redact",
    s"""WITH a AS (SELECT doc_id,
      |    text || ' contact user' || doc_id || '@mail-' || source || '.com from 10.' ||
      |      (doc_id % 256) || '.' || (doc_id % 100) || '.7 call +1-555-' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' end' AS aug
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(aug, '$EmailRe')) AS n_emails,
      |  len(regexp_extract_all(aug, '$Ipv4Re')) AS n_ips,
      |  len(regexp_extract_all(aug, '$PhoneRe')) AS n_phones,
      |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
      |      '$EmailRe', '<EMAIL>', 'g'),
      |      '$Ipv4Re', '<IP>', 'g'),
      |      '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
      |FROM a ORDER BY doc_id""".stripMargin) { (s, d) =>
    val aug = concat(col("text"), lit(" contact user"),
      col("doc_id").cast(StringType), lit("@mail-"), col("source"),
      lit(".com from 10."), (col("doc_id") % 256).cast(StringType), lit("."),
      (col("doc_id") % 100).cast(StringType), lit(".7 call +1-555-"),
      lpad((col("doc_id") % 10000).cast(StringType), 4, "0"), lit(" end"))
    // widen: six regex passes per row dominate the serial one-task scan —
    // identity on pre-split inputs (see ScanParallel)
    graft.ops.ScanParallel.widen(Tables.documents(s, d))
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("aug"), lit(Ipv4Re)).as("n_ips"),
        regexp_count(col("aug"), lit(PhoneRe)).as("n_phones"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("aug"),
          EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  // --- sliding-window chunking with overlap (training-sequence prep) --------
  // seq_len=16, stride=12 token windows per document — the chunking step
  // that turns variable-length documents into fixed-context training rows
  // (complements text_token_budget_pack, which packs WHOLE docs). Chunk
  // generation is a per-row HOF over the token array (no self-join, no
  // shuffle); output cardinality is sum(ceil(len/stride)) — linear in corpus
  // token count, the same scaling as the tokenize pass itself.
  register("text_chunk_stride",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (SELECT doc_id,
      |    unnest(list_transform(range(0, CAST(floor((len(toks) - 1) / 12.0) AS INT) + 1),
      |      i -> {'cid': i, 'chunk': list_slice(toks, i*12+1, i*12+16)})) AS p
      |  FROM t)
      |SELECT doc_id, p.cid AS chunk_id, len(p.chunk) AS n_tok,
      |  p.chunk[1] AS first_tok, p.chunk[-1] AS last_tok
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, cast(floor((size(toks) - 1) / 12.0) as int)), " +
          "i -> struct(i as cid, slice(toks, i*12+1, 16) as chunk))")).as("p"))
      .select(col("doc_id"), col("p.cid").as("chunk_id"),
        size(col("p.chunk")).as("n_tok"),
        element_at(col("p.chunk"), 1).as("first_tok"),
        element_at(col("p.chunk"), -1).as("last_tok"))
      .orderBy("doc_id", "chunk_id")
  }

  // --- conjunctive full-text search over the inverted index -----------------
  // AND-of-terms keyword search: docs containing EVERY query term, ranked by
  // summed term frequency. The term filter lands BEFORE any aggregation —
  // the corpus collapses to rows matching the query terms immediately after
  // tokenize (with a pre-built (term, doc_id, tf) index table this is a
  // partition-pruned scan of two term partitions). One shuffle on doc_id for
  // the AND-count, TakeOrdered for the top-k — no full sort, no join.
  register("text_search_and",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
      |  WHERE term IN ('table', 'window') GROUP BY doc_id, term),
      |hit AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score FROM tf
      |  GROUP BY doc_id HAVING count(*) = 2)
      |SELECT doc_id, score FROM hit ORDER BY score DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokenize(col("text"))).as("term"))
      .filter(col("term").isin("table", "window"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("score"))
      .filter(col("n_terms") === 2)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  // --- BPE pair counting (vocab-training inner loop) ------------------------
  // One iteration of byte-pair-encoding merge selection: adjacent
  // character-pair frequencies weighted by word frequency, top-20 pairs.
  // The corpus collapses to a vocab-sized word-frequency table FIRST (one
  // map-side-combined shuffle of (word, count)); pair explosion runs over
  // the vocab, not the corpus — at 100 TB the vocab is ~10⁶ rows, so the
  // expensive HOF touches 10⁶ rows regardless of corpus size. Final top-k is
  // a TakeOrdered over pair counts (vocab-bounded, no full sort).
  register("text_bpe_pair_counts",
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |wf AS (SELECT word, count(*) AS freq FROM w WHERE len(word) >= 2 GROUP BY word),
      |p AS (SELECT freq,
      |    unnest(list_transform(range(1, len(word)), i -> substring(word, i, 2))) AS pair
      |  FROM wf),
      |pc AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p GROUP BY pair)
      |SELECT pair, cnt FROM pc ORDER BY cnt DESC, pair LIMIT 20""".stripMargin) { (s, d) =>
    val wf = Tables.documents(s, d)
      .select(explode(tokenize(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    wf.select(col("freq"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
  }

  // --- BPE merge-training loop (3 rounds) -----------------------------------
  // The tokenizer-training inner loop end-to-end (text_bpe_pair_counts is
  // one round's counting step): per round, count adjacent symbol pairs over
  // the vocab-collapsed word-frequency table, pick the top pair (count desc,
  // pair asc — the deterministic merge order), and merge it greedily
  // left-to-right in every word via an array fold.
  //
  // Scale: the corpus collapses to the vocab ONCE (one map-side-combined
  // shuffle); every subsequent round touches only vocab-sized relations.
  // Each round's winner and symbol-count are 1-row broadcast scalars
  // (documented nested-loop exemption). The 3 unioned round plans share the
  // identical vocab-aggregation subtree, which ReuseExchange dedupes — the
  // corpus is scanned once, not once per round.
  register("text_bpe_train", {
    def roundSql(r: Int): String = {
      val prev = if (r == 1) "s0" else s"s${r - 1}"
      s"""p$r AS (SELECT ps.a AS a, ps.b AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(syms)),
         |      i -> struct_pack(a := syms[i], b := syms[i+1]))) AS ps
         |    FROM $prev WHERE len(syms) >= 2)
         |  GROUP BY 1, 2),
         |w$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |s$r AS (SELECT freq, list_reduce(
         |    list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, x -> [x])),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = w.a AND x[1] = w.b
         |      THEN list_append(acc[1:len(acc)-1], w.a || w.b)
         |      ELSE list_append(acc, x[1]) END) AS syms
         |  FROM $prev, w$r w)""".stripMargin
    }
    s"""WITH wf AS (SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) >= 2 GROUP BY word),
       |s0 AS (SELECT freq, string_split(word, '') AS syms FROM wf),
       |${roundSql(1)},
       |${roundSql(2)},
       |${roundSql(3)}
       |SELECT * FROM (
       |  SELECT 1 AS round, a, b, cnt,
       |    (SELECT CAST(sum(freq * len(syms)) AS BIGINT) FROM s1) AS n_symbols FROM w1
       |  UNION ALL
       |  SELECT 2, a, b, cnt,
       |    (SELECT CAST(sum(freq * len(syms)) AS BIGINT) FROM s2) FROM w2
       |  UNION ALL
       |  SELECT 3, a, b, cnt,
       |    (SELECT CAST(sum(freq * len(syms)) AS BIGINT) FROM s3) FROM w3)
       |ORDER BY round""".stripMargin
  }) { (s, d) =>
    import org.apache.spark.sql.DataFrame
    val wf = Tables.documents(s, d)
      .select(explode(tokenize(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val s0 = wf.select(col("freq"), characterTokenize(col("word")).as("syms"))
    // one BPE round: (pair counts → 1-row winner → greedy left-to-right merge)
    def bpeRound(syms: DataFrame): (DataFrame, DataFrame) = {
      val pc = syms.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) as a, element_at(syms, i+1) as b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      val win = pc.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
      val merged = syms
        .crossJoin(broadcast(win.select(col("a").as("pa"), col("b").as("pb"))))
        .withColumn("syms", expr(
          """aggregate(syms, cast(array() as array<string>), (acc, x) ->
            |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = pa AND x = pb
            |    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(pa, pb)))
            |    ELSE concat(acc, array(x)) END)""".stripMargin))
        .select(col("freq"), col("syms"))
      (win, merged)
    }
    var syms = s0
    val rows = (1 to 3).map { r =>
      val (win, merged0) = bpeRound(syms)
      // PIN each round's merged symbol table: round r+1's pair counts, the
      // same round's stats aggregate, AND the final union all re-read it —
      // unpinned, round 3 re-derives rounds 1-2 from scratch under every
      // consumer (the sequential-dependency chain makes the recompute
      // quadratic in rounds). Tracked pin, released by clearPins().
      val merged = graft.ops.OrderedOps.pinned(merged0)
      val stats = merged.agg(sum(size(col("syms")) * col("freq")).as("n_symbols"))
      syms = merged
      win.withColumn("round", lit(r)).crossJoin(broadcast(stats))
        .select(col("round"), col("a"), col("b"), col("cnt"), col("n_symbols"))
    }
    rows.reduce(_ unionByName _).orderBy("round")
  }

  // Shared CTE chain for the BPE ENCODE pair (merge-table derivation +
  // rank-ordered application), spliced into both oracles below.
  private val bpeEncodeCtes =
    """wf AS (
      |  SELECT word, count(*) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE length(word) >= 2 GROUP BY word),
      |s0 AS (SELECT word, freq, string_split(word, '') AS syms FROM wf),
      |pc AS (SELECT ps.a AS a, ps.b AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
      |    SELECT freq, unnest(list_transform(range(1, len(syms)),
      |      i -> struct_pack(a := syms[i], b := syms[i+1]))) AS ps
      |    FROM s0 WHERE len(syms) >= 2)
      |  GROUP BY 1, 2),
      |merges AS (SELECT a, b,
      |    CAST(row_number() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS mrank
      |  FROM (SELECT * FROM pc ORDER BY cnt DESC, a, b LIMIT 24)),
      |enc AS (
      |  SELECT word, freq, syms, 0 AS r FROM s0
      |  UNION ALL
      |  SELECT e.word, e.freq,
      |    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
      |        list_transform(e.syms, x -> [x])),
      |      (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.a AND x[1] = m.b
      |        THEN list_append(acc[1:len(acc)-1], m.a || m.b)
      |        ELSE list_append(acc, x[1]) END) AS syms,
      |    e.r + 1 AS r
      |  FROM enc e JOIN merges m ON m.mrank = e.r + 1)""".stripMargin

  /** Merge-table derivation + rank-ordered application shared by the two
    * encode queries: top-24 pairs by corpus frequency become the ranked
    * table; each word folds over the table, one greedy left-to-right merge
    * pass per rank (the apply-in-creation-order discipline — equal to
    * classic BPE encoding when each merge's parts predate it, which a
    * frequency-ranked one-shot table satisfies for its own prefixes).
    * Returns (word, freq, enc: array<string>) over the DISTINCT vocabulary
    * — the fold is O(vocab), never O(corpus). */
  private def bpeEncodedVocab(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wf = Tables.documents(s, d)
      .select(explode(tokenize(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val s0 = wf.select(col("word"), col("freq"),
      characterTokenize(col("word")).as("syms"))
    val pc = s0.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) as a, element_at(syms, i+1) as b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
    // 24 rows: the documented small-relation Window exemption (like k-means
    // centroid collection); collected to ONE array row and broadcast
    val merges = pc.orderBy(col("cnt").desc, col("a"), col("b")).limit(24)
      .withColumn("mrank",
        row_number().over(Window.partitionBy(lit(0))
          .orderBy(col("cnt").desc, col("a"), col("b"))))
      .agg(sort_array(collect_list(struct(col("mrank"), col("a"), col("b"))))
        .as("ms"))
    s0.crossJoin(broadcast(merges))
      .withColumn("enc", expr(
        """aggregate(ms, syms, (acc, m) ->
          |  aggregate(acc, cast(array() as array<string>), (a2, x) ->
          |    CASE WHEN size(a2) > 0 AND element_at(a2, -1) = m.a AND x = m.b
          |      THEN concat(slice(a2, 1, size(a2) - 1), array(concat(m.a, m.b)))
          |      ELSE concat(a2, array(x)) END))""".stripMargin))
      .select(col("word"), col("freq"), col("enc"))
  }

  // --- BPE ENCODE (nvtext/byte_pair_encoding.hpp: cuDF's
  // nvtext::byte_pair_encoding applies a trained merge-pair table to
  // strings) -----------------------------------------------------------------
  // The SERVING side of the tokenizer loop (text_bpe_train is the learning
  // side): rank-ordered merge passes over the distinct vocabulary.
  register("text_bpe_encode",
    s"""WITH RECURSIVE $bpeEncodeCtes
       |SELECT word, freq, array_to_string(syms, ' ') AS tokens,
       |  CAST(len(syms) AS BIGINT) AS n_tokens
       |FROM enc WHERE r = 24 AND freq >= 5 ORDER BY word""".stripMargin) { (s, d) =>
    bpeEncodedVocab(s, d)
      .filter(col("freq") >= 5)
      .select(col("word"), col("freq"),
        concat_ws(" ", col("enc")).as("tokens"),
        size(col("enc")).cast(LongType).as("n_tokens"))
      .orderBy("word")
  }

  // --- BPE fertility: corpus token counts under the learned tokenizer ------
  // tokens-per-word by document — the metric that prices a tokenizer
  // against a corpus (fertility ≈ how many BPE tokens a word costs; budget
  // planning divides corpus token counts by it). Scale shape: the encoded
  // vocabulary (O(distinct words)) BROADCASTS into the corpus-side word
  // stream — the corpus pays one scan and one broadcast-join, no shuffle
  // except the per-doc aggregation. Words shorter than 2 chars count one
  // token by definition on both sides.
  register("text_bpe_fertility",
    s"""WITH RECURSIVE $bpeEncodeCtes,
       |wt AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_tokens
       |  FROM enc WHERE r = 24),
       |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents)
       |SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(COALESCE(wt.n_tokens, 1)) AS BIGINT) AS n_bpe_tokens,
       |  round(CAST(sum(COALESCE(wt.n_tokens, 1)) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE), 6) AS fertility
       |FROM dw LEFT JOIN wt ON dw.word = wt.word
       |GROUP BY dw.doc_id ORDER BY dw.doc_id""".stripMargin) { (s, d) =>
    val wt = bpeEncodedVocab(s, d)
      .select(col("word"), size(col("enc")).cast(LongType).as("n_tokens"))
    val dw = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokenize(col("text"))).as("word"))
    dw.join(broadcast(wt), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_tokens"), lit(1L))).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast(DoubleType) /
          col("n_words").cast(DoubleType), 6).as("fertility"))
      .orderBy("doc_id")
  }

  // --- fastText-style linear quality classifier ------------------------------
  // The model-based tier of quality filtering (fastText/CCNet-style): a
  // linear model over HASHED unigram features, mean-pooled, thresholded at
  // sigmoid(raw) >= 0.5 ⟺ raw >= 0. Weights here are a fixed literal table
  // (training happens offline; the serving operator is what a 100-TB
  // pipeline runs) — the per-row cost is one fold over the tokens, fully
  // scan-fused, zero shuffles. The weights are exact multiples of 0.1, so
  // the fold accumulates BIGINT tenths: raw = 0.1 + S/(10n)·10/10 =
  // (n + S_tenths)/(10n), an exact rational. The hashed projection is a
  // single correctly-rounded IEEE division plus an integer sign test — no
  // transcendentals, so the oracle is bit-exact (sigmoid would put a
  // libm-vs-JVM 1-ulp exp() divergence inside round(…, 6)).
  register("text_fasttext_score", {
    val wTenths = (0 until 32).map(i => (i * 37) % 21 - 10)
    val wSql = wTenths.mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id, len(toks) AS n,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(toks, tok -> CAST(($wSql)[CAST(${sqlPolyHash("tok")} % 32 AS INT) + 1] AS BIGINT))),
       |      (a, b) -> a + b) AS s_tenths
       |  FROM t)
       |SELECT doc_id,
       |  round(CAST(n + s_tenths AS DOUBLE) / CAST(10 * n AS DOUBLE), 6) AS raw_score,
       |  (n + s_tenths) >= 0 AS keep
       |FROM s ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    val wTenths = (0 until 32).map(i => ((i * 37) % 21 - 10).toLong)
    val weights = array(wTenths.map(lit): _*)
    Tables.documents(s, d)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
      .select(col("doc_id"),
        (size(col("toks")).cast(LongType) + aggregate(col("toks"), lit(0L),
          (acc, tok) => acc + element_at(weights, (polyHash(tok) % 32).cast(IntegerType) + 1)))
          .as("num"),
        (size(col("toks")).cast(LongType) * 10L).as("den"))
      .select(col("doc_id"),
        round(col("num").cast(DoubleType) / col("den").cast(DoubleType), 6).as("raw_score"),
        (col("num") >= 0).as("keep"))
      .orderBy("doc_id")
  }

  // --- Gopher structural quality rules (Rae et al. 2021 §A1.1) --------------
  // The word-level rule battery applied before any model-based scoring:
  // word-count bounds, mean-word-length band, alphabetic-word fraction, and
  // required-stopword count, combined into one keep decision. Complements
  // text_quality (uniq/stopword ratios) and text_repetition_metrics (dup
  // n-gram share) — together the three cover the full Gopher rule set that
  // is meaningful for single-line documents. Pure per-row projection fused
  // into the scan: zero shuffles at any corpus size.
  register("text_gopher_rules",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  len(toks) AS n_words,
      |  round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(toks, w -> length(w))), (a, b) -> a + b) AS DOUBLE)
      |    / len(toks), 6) AS mean_word_len,
      |  round(CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
      |    / len(toks), 6) AS alpha_word_frac,
      |  len(list_filter(['the', 'a', 'value', 'row', 'table'],
      |      sw -> list_contains(toks, sw))) AS n_req_stopwords,
      |  CAST(len(toks) BETWEEN 15 AND 120
      |    AND CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(toks, w -> length(w))), (a, b) -> a + b) AS DOUBLE)
      |      / len(toks) BETWEEN 2.5 AND 10
      |    AND CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
      |      / len(toks) >= 0.8
      |    AND len(list_filter(['the', 'a', 'value', 'row', 'table'],
      |        sw -> list_contains(toks, sw))) >= 2 AS BOOLEAN) AS keep
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val reqStopwords = Seq("the", "a", "value", "row", "table")
    val toks = col("toks")
    val meanLen = aggregate(toks, lit(0L), (a, w) => a + length(w))
      .cast(DoubleType) / size(toks)
    val alphaFrac = size(filter(toks, w => w.rlike("[a-z]")))
      .cast(DoubleType) / size(toks)
    val nStop = size(filter(array(reqStopwords.map(lit): _*),
      sw => array_contains(toks, sw)))
    Tables.documents(s, d)
      .select(col("doc_id"), tokenize(col("text")).as("toks"))
      // each interpreted HOF fold computed ONCE here, referenced by
      // column below — inlining them into both the output projection and
      // the keep predicate would evaluate every fold twice per row
      // (CollapseProject leaves multi-use non-cheap expressions alone,
      // so the two-step shape survives optimization)
      .select(col("doc_id"), size(toks).as("n_words"),
        meanLen.as("__mwl"), alphaFrac.as("__awf"),
        nStop.as("n_req_stopwords"))
      .select(col("doc_id"), col("n_words"),
        round(col("__mwl"), 6).as("mean_word_len"),
        round(col("__awf"), 6).as("alpha_word_frac"),
        col("n_req_stopwords"),
        (col("n_words").between(15, 120) &&
          col("__mwl").between(2.5, 10) &&
          col("__awf") >= 0.8 &&
          col("n_req_stopwords") >= 2).as("keep"))
      .orderBy("doc_id")
  }

  // --- sketch-accelerated heavy hitters: CMS prune + exact confirm ----------
  // Corpus-frequency heavy hitters (the n-gram blocklist / boilerplate-
  // detection primitive) without a full-vocabulary aggregation as the ONLY
  // plan. A plain groupBy(gram).count() shuffles one partial row per
  // distinct gram per partition and its reduce side is vocabulary-sized —
  // at web-corpus scale the n-gram vocabulary is billions of rows of
  // strings. The sketch discipline caps what must be exact: pass 1 folds
  // the stream into a Count-Min sketch (fixed (eps, δ) geometry ⇒ ~1 MB
  // regardless of vocabulary; tree-aggregated partial merges, ONE binary
  // row to the driver) together with the exact stream length; candidate
  // grams are the distinct grams whose sketch estimate clears the
  // frequency threshold — CMS only ever OVER-estimates, so this set
  // provably contains every true heavy hitter and is bounded by
  // total/threshold + the eps sliver (broadcast-safe by construction, here
  // ≤ ~2000 + eps·n/T rows whatever the data); pass 2 exact-counts the
  // candidates alone, so the reduce side is candidate-sized, not
  // vocabulary-sized. Output is EXACT (threshold re-applied on true
  // counts), which is what lets the hash-comparing oracle gate a
  // sketch-accelerated plan. The sketch probe is a Scala UDF — the one
  // non-codegen step — and runs on the DISTINCT-gram relation only, never
  // the corpus stream; SketchSpec pins the no-false-negative and
  // bounded-overcount guarantees the prune depends on.
  register("text_heavy_hitters_cms",
    """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT unnest(list_transform(range(1, len(t)),
      |        i -> t[i] || '_' || t[i+1])) AS gram
      |      FROM toks WHERE len(t) >= 2),
      |tot AS (SELECT count(*) AS n FROM g)
      |SELECT gram, count(*) AS cnt FROM g
      |GROUP BY gram HAVING count(*) >= (SELECT n FROM tot) / 2000.0
      |ORDER BY gram""".stripMargin) { (s, d) =>
    // toks is materialized as its own column before wordNgrams references
    // it: the lambda reads each element TWICE, and an inlined split(text)
    // expression would re-split the document per n-gram (measured 3 s →
    // 0.4 s per corpus pass at sf0.1; the same column-boundary CSE rule
    // TextFunctions documents at shingleFingerprints)
    // NOT widened (measured): parallelizing the CMS update costs a 32-way
    // merge of ~560 KB partial sketches + an exchange — warm 1.2 → 1.6 s.
    // The serial update is the cheaper evil at this sketch width.
    val grams = Tables.documents(s, d)
      .select(tokenize(col("text")).as("toks"))
      .select(explode(wordNgrams(col("toks"), 2)).as("gram"))
    val row = grams.agg(
      expr("count_min_sketch(gram, CAST(0.0001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("cms"),
      count(lit(1)).as("total")).head()
    val total = row.getAs[Long]("total")
    val threshold = total / 2000.0
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("cms")))
    val bcSketch = s.sparkContext.broadcast(cms)
    // probe with the gram's UTF-8 bytes: CountMinSketchAgg updates the
    // sketch with UTF8String bytes, so the byte-array probe path hashes
    // identically (asserted in SketchSpec).
    val est = udf((g: String) => bcSketch.value.estimateCount(
      g.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val candidates = grams.distinct().filter(est(col("gram")) >= threshold)
    grams.join(broadcast(candidates), Seq("gram"), "left_semi")
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy("gram")
  }
}
