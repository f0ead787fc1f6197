package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GF

/** String operator surface (SURVEY §2.8; reference cpp/src/strings = 15,674
  * LoC, python accessor core/column/string.py = 5,509 LoC).
  *
  * cuDF's regex dialect is close to Java's for the constructs used here;
  * the oracle side (DuckDB) uses RE2 — patterns are restricted to the
  * common subset and pinned by the hash gate.
  */
object StringQueries extends QueryPack {

  // --- case ops (case.hpp:42-77, capitalize.hpp) ----------------------------
  register("str_case",
    """SELECT p_partkey, lower(p_name) AS lower_v, upper(p_name) AS upper_v,
      |  array_to_string(list_transform(string_split(lower(p_name), ' '),
      |      w -> upper(w[1]) || w[2:]), ' ') AS title_v,
      |  array_to_string(list_transform(string_split(p_brand, ''),
      |      ch -> CASE WHEN ch = upper(ch) THEN lower(ch) ELSE upper(ch) END), '') AS swapcase_v
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        lower(col("p_name")).as("lower_v"),
        upper(col("p_name")).as("upper_v"),
        initcap(lower(col("p_name"))).as("title_v"),
        GF.swapcase(col("p_brand")).as("swapcase_v"))
      .orderBy("p_partkey")
  }

  // --- attributes (attributes.hpp count_characters/bytes/code_points) ------
  // code_points flattened to a CSV string in the final projection on BOTH
  // sides — the driver's pandas hash-compare can't sort array cells.
  register("str_attributes",
    """SELECT p_partkey, length(p_name) AS n_chars, strlen(p_name) AS n_bytes,
      |  array_to_string(list_transform(string_split(p_brand, ''), ch -> ascii(ch)), ',') AS code_points
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        GF.countCharacters(col("p_name")).as("n_chars"),
        GF.countBytes(col("p_name")).as("n_bytes"),
        array_join(transform(GF.codePoints(col("p_brand")), _.cast(StringType)), ",")
          .as("code_points"))
      .orderBy("p_partkey")
  }

  // --- pad / strip / zfill (padding.hpp, strip.hpp) -------------------------
  register("str_pad_strip",
    """SELECT p_partkey,
      |  lpad(p_brand, 12, '*') AS lpad_v, rpad(p_brand, 12, '*') AS rpad_v,
      |  lpad(CAST(p_size AS VARCHAR), 5, '0') AS zfill_v,
      |  trim('  ' || p_brand || '  ') AS strip_v,
      |  ltrim('  ' || p_brand) AS lstrip_v, rtrim(p_brand || '  ') AS rstrip_v
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("lpad_v"),
        rpad(col("p_brand"), 12, "*").as("rpad_v"),
        GF.zfill(col("p_size").cast(StringType), 5).as("zfill_v"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("strip_v"),
        ltrim(concat(lit("  "), col("p_brand"))).as("lstrip_v"),
        rtrim(concat(col("p_brand"), lit("  "))).as("rstrip_v"))
      .orderBy("p_partkey")
  }

  // --- find / contains / starts / ends (find.hpp) ---------------------------
  register("str_find",
    """SELECT p_partkey,
      |  instr(p_name, 'al') AS find_pos,
      |  contains(p_name, 'al') AS contains_v,
      |  starts_with(p_type, 'STANDARD') AS startswith_v,
      |  suffix(p_type, 'STEEL') AS endswith_v
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        instr(col("p_name"), "al").as("find_pos"),
        col("p_name").contains("al").as("contains_v"),
        col("p_type").startsWith("STANDARD").as("startswith_v"),
        col("p_type").endsWith("STEEL").as("endswith_v"))
      .orderBy("p_partkey")
  }

  // --- regex family (contains.hpp, extract.hpp, findall.hpp, replace_re.hpp)
  register("str_regex",
    """SELECT p_partkey,
      |  regexp_matches(p_name, '[aeiou]{2}') AS contains_re,
      |  regexp_full_match(p_brand, 'Brand#[0-9]+') AS matches_re,
      |  len(regexp_extract_all(p_name, '[aeiou]')) AS count_re,
      |  regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS extract_v,
      |  coalesce(array_to_string(regexp_extract_all(p_name, '[a-z]+a'), '|'), '') AS findall_v,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS replace_re
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        col("p_name").rlike("[aeiou]{2}").as("contains_re"),
        col("p_brand").rlike("^Brand#[0-9]+$").as("matches_re"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).as("count_re"),
        regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).as("extract_v"),
        array_join(regexp_extract_all(col("p_name"), lit("[a-z]+a"), lit(0)), "|")
          .as("findall_v"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("replace_re"))
      .orderBy("p_partkey")
  }

  // --- regex dialect corpus (cpp/src/strings/regex custom engine;
  //     contains.hpp:50 contains_re/matches_re dialect surface) -------------
  // Systematic sweep of the constructs where regex dialects diverge, pinned
  // across Java Pattern (Spark) and RE2 (DuckDB oracle) — the two engines a
  // migrating cuDF user actually hits. Each column isolates one construct:
  // negated classes, escaped metachars inside classes, \d and \w WIDTH
  // (pinned ASCII: Java's default and RE2 agree; Java only widens under
  // UNICODE_CHARACTER_CLASS, which this library never enables), alternation
  // under anchors, lazy vs greedy quantifiers, bounded repetition, inline
  // case-insensitive flag, \b word boundaries, and replace with
  // alternation. DOCUMENTED EXCLUSIONS (constructs with no cross-engine
  // meaning, SURVEY §7.4): backreferences INSIDE the pattern and
  // lookaround — RE2 rejects both by design, the reference's custom engine
  // supports neither (cpp/src/strings/regex), Java supports both;
  // replacement-side group refs differ ($1 Java vs \1 RE2) and are pinned
  // per-side here as in str_regex_backref.
  register("str_regex_dialect",
    """SELECT p_partkey,
      |  regexp_extract(p_name, '[^aeiou ]+') AS cls_negated,
      |  regexp_matches(p_name, '[a-d][.#-]?[l-p]') AS cls_meta,
      |  len(regexp_extract_all(p_brand, '\d')) AS digit_ascii_n,
      |  regexp_extract(p_type, '\w+') AS word_first,
      |  regexp_matches(p_name, '^(al|an|aq|bl)') AS alt_anchor_head,
      |  regexp_matches(p_name, '(ed|ry|le|te)$') AS alt_anchor_tail,
      |  regexp_extract(p_name, '^(.*?[aeiou])', 1) AS lazy_prefix,
      |  regexp_extract(p_name, '^(.*[aeiou])', 1) AS greedy_prefix,
      |  regexp_matches(p_name, '^[a-z]{4,6} ') AS bounded_rep,
      |  regexp_matches(p_name, '(?i)BLUE|PUFF') AS inline_ci,
      |  len(regexp_extract_all(p_name, '\bs[a-z]*')) AS boundary_words,
      |  regexp_replace(p_name, '(blue|red|green|white)', 'C', 'g') AS alt_replace
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "[^aeiou ]+", 0).as("cls_negated"),
        col("p_name").rlike("[a-d][.#-]?[l-p]").as("cls_meta"),
        size(regexp_extract_all(col("p_brand"), lit("\\d"), lit(0))).as("digit_ascii_n"),
        regexp_extract(col("p_type"), "\\w+", 0).as("word_first"),
        col("p_name").rlike("^(al|an|aq|bl)").as("alt_anchor_head"),
        col("p_name").rlike("(ed|ry|le|te)$").as("alt_anchor_tail"),
        regexp_extract(col("p_name"), "^(.*?[aeiou])", 1).as("lazy_prefix"),
        regexp_extract(col("p_name"), "^(.*[aeiou])", 1).as("greedy_prefix"),
        col("p_name").rlike("^[a-z]{4,6} ").as("bounded_rep"),
        col("p_name").rlike("(?i)BLUE|PUFF").as("inline_ci"),
        size(regexp_extract_all(col("p_name"), lit("\\bs[a-z]*"), lit(0))).as("boundary_words"),
        regexp_replace(col("p_name"), "(blue|red|green|white)", "C").as("alt_replace"))
      .orderBy("p_partkey")
  }

  // --- slice / replace / translate (substring.hpp, replace.hpp, translate.hpp)
  register("str_slice_replace",
    """SELECT p_partkey,
      |  substring(p_name, 3, 8) AS slice_v,
      |  left(p_name, 5) AS left_v, right(p_name, 5) AS right_v,
      |  replace(p_name, 'al', 'AL') AS replace_v,
      |  translate(p_name, 'aeiou', '12345') AS translate_v,
      |  reverse(p_brand) AS reverse_v,
      |  repeat(p_brand, 2) AS repeat_v
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        substring(col("p_name"), 3, 8).as("slice_v"),
        substring(col("p_name"), 1, 5).as("left_v"),
        expr("right(p_name, 5)").as("right_v"),
        regexp_replace(col("p_name"), "al", "AL").as("replace_v"),
        translate(col("p_name"), "aeiou", "12345").as("translate_v"),
        reverse(col("p_brand")).as("reverse_v"),
        repeat(col("p_brand"), 2).as("repeat_v"))
      .orderBy("p_partkey")
  }

  // --- split family (split.hpp, partition.hpp) ------------------------------
  register("str_split",
    """SELECT p_partkey,
      |  array_to_string(string_split(p_name, ' '), '|') AS tokens,
      |  string_split(p_name, ' ')[1] AS first_tok,
      |  string_split(p_name, ' ')[-1] AS last_tok,
      |  len(string_split(p_name, ' ')) AS n_tokens,
      |  string_split(p_name, ' ')[1] AS part_head,
      |  CASE WHEN instr(p_name, ' ') > 0 THEN ' ' ELSE '' END AS part_sep,
      |  CASE WHEN instr(p_name, ' ') > 0
      |       THEN substring(p_name, instr(p_name, ' ') + 1) ELSE '' END AS part_tail
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val toks = split(col("p_name"), " ")
    val p = GF.strPartition(col("p_name"), " ")
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        array_join(toks, "|").as("tokens"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        size(toks).as("n_tokens"),
        p.getField("head").as("part_head"),
        p.getField("sep").as("part_sep"),
        p.getField("tail").as("part_tail"))
      .orderBy("p_partkey")
  }

  // --- rsplit / rpartition (split.hpp rsplit, partition.hpp rpartition) -----
  // Right-anchored variants: rpartition splits on the LAST separator
  // (pandas: absent separator puts the whole string in the TAIL), rsplit
  // with maxsplit=2 keeps the right two tokens whole and joins the rest.
  // Pure per-row projection, scan-fused.
  register("str_rsplit_rpartition",
    """WITH t AS (SELECT p_partkey, p_name,
      |    instr(reverse(p_name), ' ') AS ridx,
      |    string_split(p_name, ' ') AS toks
      |  FROM part WHERE p_partkey <= 500)
      |SELECT p_partkey,
      |  CASE WHEN ridx > 0 THEN substring(p_name, 1, length(p_name) - ridx) ELSE '' END AS rpart_head,
      |  CASE WHEN ridx > 0 THEN ' ' ELSE '' END AS rpart_sep,
      |  CASE WHEN ridx > 0 THEN substring(p_name, length(p_name) - ridx + 2) ELSE p_name END AS rpart_tail,
      |  array_to_string(CASE WHEN len(toks) <= 3 THEN toks
      |    ELSE list_concat([array_to_string(toks[1:len(toks)-2], ' ')],
      |                     toks[len(toks)-1:len(toks)]) END, '|') AS rsplit2
      |FROM t ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val p = GF.strRPartition(col("p_name"), " ")
    val rsplit2 = expr(
      """case when size(toks) <= 3 then toks
        |else concat(array(array_join(slice(toks, 1, size(toks) - 2), ' ')),
        |            slice(toks, size(toks) - 1, 2)) end""".stripMargin)
    Tables.part(s, d)
      .filter(col("p_partkey") <= 500)
      .withColumn("toks", split(col("p_name"), " "))
      .select(col("p_partkey"),
        p.getField("head").as("rpart_head"),
        p.getField("sep").as("rpart_sep"),
        p.getField("tail").as("rpart_tail"),
        array_join(rsplit2, "|").as("rsplit2"))
      .orderBy("p_partkey")
  }

  // --- center / rfind / filter_characters (padding.hpp center side,
  // find.hpp:81 rfind, translate.hpp:95 filter_characters) -------------------
  // center follows pandas: pad to width 24, extra space goes RIGHT;
  // rfind returns the 1-based position of the LAST occurrence (0 = absent),
  // via the reverse trick — both engines lack a native rfind;
  // filter_characters keeps only letters (regex char-class complement).
  register("str_center_rfind",
    """SELECT p_partkey,
      |  lpad(rpad(p_name, CAST(length(p_name) + floor((24 - length(p_name)) / 2.0) AS INT), '.'),
      |       24, '.') AS center_v,
      |  CASE WHEN instr(reverse(p_name), 'a') = 0 THEN 0
      |       ELSE length(p_name) - instr(reverse(p_name), 'a') + 1 END AS rfind_a,
      |  regexp_replace(p_name, '[^A-Za-z]', '', 'g') AS letters_only
      |FROM part WHERE p_partkey <= 500 AND length(p_name) <= 24
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val nm = col("p_name")
    // pandas center: left pad = floor(total/2), remainder right
    val centered = lpad(
      rpad(nm, (length(nm) + floor((lit(24) - length(nm)) / 2.0).cast(IntegerType))
        .cast(IntegerType), lit(".")), 24, ".")
    Tables.part(s, d)
      .filter(col("p_partkey") <= 500 && length(nm) <= 24)
      .select(col("p_partkey"),
        centered.as("center_v"),
        when(instr(reverse(nm), "a") === 0, lit(0))
          .otherwise(length(nm) - instr(reverse(nm), "a") + 1).as("rfind_a"),
        regexp_replace(nm, "[^A-Za-z]", "").as("letters_only"))
      .orderBy("p_partkey")
  }

  // --- replace_with_backrefs (replace_re.hpp:87): captured groups in the
  // replacement. The PATTERN lives in the shared regex dialect; the
  // replacement syntax is engine-native ($2/$1 in Java, \2/\1 in RE2) — the
  // gate compares results, not spellings.
  register("str_replace_backrefs",
    """SELECT p_partkey,
      |  regexp_replace(p_name, '^([a-z]+) ([a-z]+)', '\2 \1') AS swapped,
      |  regexp_replace(p_name, '([a-z]+)$', '<\1>', 'g') AS tagged_last
      |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        regexp_replace(col("p_name"), "^([a-z]+) ([a-z]+)", "$2 $1").as("swapped"),
        regexp_replace(col("p_name"), "([a-z]+)$", "<$1>").as("tagged_last"))
      .orderBy("p_partkey")
  }

  // --- combine: concat, concat_ws, grouped join_strings (combine.hpp) -------
  register("str_combine",
    """SELECT n_nationkey,
      |  n_name || '-' || CAST(n_regionkey AS VARCHAR) AS concat_v,
      |  concat_ws('/', n_name, CAST(n_nationkey AS VARCHAR)) AS concat_ws_v
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        concat(col("n_name"), lit("-"), col("n_regionkey").cast(StringType)).as("concat_v"),
        concat_ws("/", col("n_name"), col("n_nationkey").cast(StringType)).as("concat_ws_v"))
      .orderBy("n_nationkey")
  }

  register("str_join_grouped",
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .groupBy(col("n_regionkey"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"))
      .orderBy("n_regionkey")
  }

  // --- char-class predicates (char_types.hpp:93; py isalpha… string.py) -----
  register("str_char_types",
    """SELECT p_partkey, t,
      |  regexp_full_match(t, '\p{L}+') AS isalpha_v,
      |  regexp_full_match(t, '[0-9]+') AS isdigit_v,
      |  regexp_full_match(t, '[\p{L}0-9]+') AS isalnum_v,
      |  t = upper(t) AND regexp_matches(t, '[A-Z]') AS isupper_v,
      |  t = lower(t) AND regexp_matches(t, '[a-z]') AS islower_v
      |FROM (SELECT p_partkey, string_split(p_name, ' ')[1] AS t FROM part
      |      WHERE p_partkey <= 1000)
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val t = col("t")
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"), element_at(split(col("p_name"), " "), 1).as("t"))
      .select(col("p_partkey"), t,
        t.rlike("^\\p{L}+$").as("isalpha_v"),
        t.rlike("^[0-9]+$").as("isdigit_v"),
        t.rlike("^[\\p{L}0-9]+$").as("isalnum_v"),
        (t === upper(t) && t.rlike("[A-Z]")).as("isupper_v"),
        (t === lower(t) && t.rlike("[a-z]")).as("islower_v"))
      .orderBy("p_partkey")
  }

  // --- get_json_object + JSONPath (json.hpp:116) on events.props ------------
  register("str_json",
    """SELECT event_id, props->>'k' AS k_value,
      |  CAST(props->>'k' AS BIGINT) AS k_long
      |FROM events WHERE event_id <= 2000 ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") <= 2000)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_value"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_long"))
      .orderBy("event_id")
  }

  // --- convert: ipv4 ↔ int (convert_ipv4.hpp:53,81) -------------------------
  register("str_convert_ipv4",
    """WITH t AS (SELECT p_partkey, (p_partkey * 2654435761) % 4294967296 AS v
      |           FROM part WHERE p_partkey <= 1000)
      |SELECT p_partkey,
      |  CAST(v // 16777216 % 256 AS VARCHAR) || '.' || CAST(v // 65536 % 256 AS VARCHAR)
      |    || '.' || CAST(v // 256 % 256 AS VARCHAR) || '.' || CAST(v % 256 AS VARCHAR) AS ip,
      |  v AS ip_int_roundtrip
      |FROM t ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val v = (col("p_partkey") * 2654435761L) % 4294967296L
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .withColumn("ip", GF.intToIpv4(v))
      .select(col("p_partkey"), col("ip"),
        GF.ipv4ToInt(col("ip")).as("ip_int_roundtrip"))
      .orderBy("p_partkey")
  }

  // --- convert: url encode/decode + bool (convert_urls.hpp:44,62;
  //     convert_booleans.hpp:46). Inputs restricted to [A-Z ] so the oracle
  //     can mirror form-encoding with a space→'+' replace. -------------------
  register("str_convert_url_bool",
    """SELECT n_nationkey,
      |  replace(n_name || ' ' || CAST(n_regionkey AS VARCHAR), ' ', '+') AS url_enc,
      |  n_name || ' ' || CAST(n_regionkey AS VARCHAR) AS url_dec_roundtrip,
      |  CAST(CASE WHEN n_regionkey > 2 THEN 'true' ELSE 'false' END AS BOOLEAN) AS bool_v,
      |  CAST(NULL AS BOOLEAN) AS bool_invalid
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    val raw = concat(col("n_name"), lit(" "), col("n_regionkey").cast(StringType))
    Tables.nation(s, d)
      .withColumn("url_enc", url_encode(raw))
      .select(col("n_nationkey"),
        col("url_enc"),
        url_decode(col("url_enc")).as("url_dec_roundtrip"),
        GF.strToBool(when(col("n_regionkey") > 2, "true").otherwise("false")).as("bool_v"),
        GF.strToBool(lit("maybe")).as("bool_invalid"))
      .orderBy("n_nationkey")
  }

  // --- repeat_strings with per-row counts (strings/repeat_strings.hpp:54) ---
  register("str_repeat",
    """SELECT p_partkey, repeat(p_brand, 1 + p_size % 3) AS rep_v,
      |  repeat(p_brand, 0) AS rep_zero
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        expr("repeat(p_brand, 1 + p_size % 3)").as("rep_v"),
        expr("repeat(p_brand, 0)").as("rep_zero"))
      .orderBy("p_partkey")
  }

  // --- convert: numeric↔string, hex (convert_integers.hpp:158) --------------
  register("str_convert",
    """SELECT p_partkey,
      |  CAST(CAST(p_size AS VARCHAR) AS INT) AS int_roundtrip,
      |  upper(to_hex(p_size)) AS to_hex_v,
      |  CAST(CAST('0x' || to_hex(p_size) AS UBIGINT) AS BIGINT) AS from_hex_v,
      |  ascii(p_brand) AS first_code
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        col("p_size").cast(StringType).cast(IntegerType).as("int_roundtrip"),
        hex(col("p_size")).as("to_hex_v"),
        conv(hex(col("p_size")), 16, 10).cast(LongType).as("from_hex_v"),
        ascii(col("p_brand")).as("first_code"))
      .orderBy("p_partkey")
  }

  // --- wrap (strings/wrap.hpp:63): greedy wrap at width by replacing the ----
  // space before the overflow with a newline. A single higher-order fold over
  // the token array — per-row, no shuffle. The oracle folds the same
  // recurrence with a "len|text" string accumulator (DuckDB's list_reduce
  // keeps the accumulator element-typed); '|' never occurs in p_name.
  register("str_wrap",
    """SELECT p_partkey,
      |  substring(acc, instr(acc, '|') + 1) AS wrapped
      |FROM (SELECT p_partkey,
      |  list_reduce(list_prepend('0|', string_split(p_name, ' ')), (acc, t) ->
      |    CASE WHEN instr(acc, '|') = len(acc)
      |           THEN concat(CAST(len(t) AS VARCHAR), '|', t)
      |         WHEN CAST(substring(acc, 1, instr(acc, '|') - 1) AS INT) + 1 + len(t) > 15
      |           THEN concat(CAST(len(t) AS VARCHAR), '|',
      |                       substring(acc, instr(acc, '|') + 1), chr(10), t)
      |         ELSE concat(CAST(CAST(substring(acc, 1, instr(acc, '|') - 1) AS INT)
      |                            + 1 + len(t) AS VARCHAR), '|',
      |                     substring(acc, instr(acc, '|') + 1), ' ', t) END) AS acc
      |  FROM part WHERE p_partkey <= 500) ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val width = 15
    val wrapped = aggregate(
      split(col("p_name"), " "),
      struct(lit("").as("s"), lit(0).as("n")),
      (acc, t) => {
        val joined = acc.getField("n") + 1 + length(t)
        when(acc.getField("n") === 0, struct(t.as("s"), length(t).as("n")))
          .when(joined > width,
            struct(concat(acc.getField("s"), lit("\n"), t).as("s"), length(t).as("n")))
          .otherwise(
            struct(concat(acc.getField("s"), lit(" "), t).as("s"), joined.as("n")))
      },
      acc => acc.getField("s"))
    Tables.part(s, d)
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"), wrapped.as("wrapped"))
      .orderBy("p_partkey")
  }

  // --- find_multiple (strings/find_multiple.hpp:52): first-match character --
  // position for each of several targets, -1 when absent (instr is 1-based,
  // 0 on miss — minus 1 gives cuDF's convention directly).
  register("str_find_multiple",
    """SELECT p_partkey,
      |  array_to_string(list_transform(['an', 're', 'ous', 'zzz'],
      |    t -> CAST(instr(p_name, t) - 1 AS VARCHAR)), ',') AS find_pos
      |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val targets = Seq("an", "re", "ous", "zzz")
    Tables.part(s, d)
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        array_join(array(targets.map(t =>
          (instr(col("p_name"), t) - 1).cast(StringType)): _*), ",").as("find_pos"))
      .orderBy("p_partkey")
  }

  // --- to_numeric(errors="coerce") (core/tools/numeric.py:23) ---------------
  // Messy inputs synthesized per row; coerce = try_cast → NULL on failure,
  // downcast probe = integer try_cast failing on fractional text.
  register("str_to_numeric",
    """SELECT p_partkey, raw,
      |  TRY_CAST(trim(raw) AS DOUBLE) AS as_double,
      |  CASE WHEN instr(raw, '.') > 0 THEN NULL
      |       ELSE TRY_CAST(trim(raw) AS INT) END AS as_int
      |FROM (SELECT p_partkey,
      |  CASE p_partkey % 4 WHEN 0 THEN CAST(p_size AS VARCHAR)
      |    WHEN 1 THEN concat(' ', CAST(p_size AS VARCHAR), ' ')
      |    WHEN 2 THEN concat(CAST(p_size AS VARCHAR), '.5')
      |    ELSE concat('x', CAST(p_size AS VARCHAR)) END AS raw
      |  FROM part WHERE p_partkey <= 1000) ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        when(col("p_partkey") % 4 === 0, col("p_size").cast(StringType))
          .when(col("p_partkey") % 4 === 1,
            concat(lit(" "), col("p_size").cast(StringType), lit(" ")))
          .when(col("p_partkey") % 4 === 2,
            concat(col("p_size").cast(StringType), lit(".5")))
          .otherwise(concat(lit("x"), col("p_size").cast(StringType))).as("raw"))
      .select(col("p_partkey"), col("raw"),
        expr("try_cast(trim(raw) AS DOUBLE)").as("as_double"),
        // DuckDB's string→int cast rounds fractional text where Spark's
        // returns NULL; pandas to_numeric(downcast=) keeps only lossless
        // integers — pinned explicitly on both sides.
        when(instr(col("raw"), ".") > 0, lit(null).cast(IntegerType))
          .otherwise(expr("try_cast(trim(raw) AS INT)")).as("as_int"))
      .orderBy("p_partkey")
  }
}
