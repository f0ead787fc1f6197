package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.text.TextFunctions._

/** End-to-end pretraining-corpus preparation: the composite pipeline every
  * LLM data engine runs nightly, expressed as ONE declarative plan so
  * Catalyst can fuse the stages (quality scoring and digesting happen in the
  * same scan; nothing materializes between stages).
  *
  * Stage shapes at 100 TB:
  *  1. quality gate — per-row expressions fused into the parquet scan.
  *  2. exact dedup — one shuffle of (digest, id, n_tokens); the survivor
  *     row rides the aggregation itself via min_by (map-side-combinable,
  *     window-free, no join-back).
  *  3. decontamination — benchmark shingle set is tiny ⇒ broadcast join;
  *     the corpus side never shuffles for this stage.
  * The only full shuffle in the whole pipeline is the dedup digest — which
  * is the information-theoretic minimum for exact dedup.
  */
object PipelineQueries extends QueryPack {

  private def sqlPolyHash(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), ch -> CAST(ascii(ch) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % 1000000007)"

  register("pipeline_corpus_prep",
    s"""WITH corpus AS (SELECT doc_id, text, string_split(text, ' ') AS toks
       |    FROM documents WHERE doc_id % 97 <> 0),
       |q AS (SELECT doc_id, text, len(toks) AS n_tokens FROM corpus
       |      WHERE len(toks) BETWEEN 20 AND 90
       |        AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.2),
       |dg AS (SELECT doc_id, n_tokens, ${sqlPolyHash("text")} AS digest FROM q),
       |keep AS (SELECT digest, min(doc_id) AS doc_id FROM dg GROUP BY digest),
       |kd AS (SELECT d.doc_id, d.digest, d.n_tokens
       |       FROM dg d JOIN keep k ON d.digest = k.digest AND d.doc_id = k.doc_id),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
       |         i -> t[i] || '_' || t[i+1] || '_' || t[i+2])) AS shingles
       |       FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       |       WHERE len(t) >= 3),
       |bg AS (SELECT DISTINCT unnest(shingles) AS g FROM sh WHERE doc_id % 97 = 0),
       |cont AS (SELECT s.doc_id
       |         FROM (SELECT doc_id, unnest(shingles) AS g FROM sh WHERE doc_id % 97 <> 0) s
       |         JOIN bg USING (g) GROUP BY s.doc_id HAVING count(*) >= 3)
       |SELECT kd.doc_id, kd.digest, kd.n_tokens
       |FROM kd LEFT JOIN cont ON kd.doc_id = cont.doc_id
       |WHERE cont.doc_id IS NULL
       |ORDER BY kd.doc_id""".stripMargin) { (s, d) =>
    val toks = tokenize(col("text"))
    val uniqRatio = size(array_distinct(toks)).cast(DoubleType) / size(toks)
    // stage 1: quality gate, fused with the scan (predicate on expressions)
    val q = Tables.documents(s, d)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text"), size(toks).as("n_tokens"), uniqRatio.as("uniq"))
      .filter(col("n_tokens").between(20, 90) && col("uniq") > 0.2)
    // stage 2: exact dedup — min_by carries the survivor's payload through
    // the digest aggregation itself, so dedup costs exactly ONE corpus-scale
    // shuffle (a groupBy-min + join-back would cost three: the aggregate
    // plus both sides of the survivor join)
    val dg = q.select(col("doc_id"), col("n_tokens"), polyHash(col("text")).as("digest"))
    val kd = dg.groupBy(col("digest"))
      .agg(min_by(struct(col("doc_id"), col("n_tokens")), col("doc_id")).as("s"))
      .select(col("s.doc_id").as("doc_id"), col("digest"), col("s.n_tokens").as("n_tokens"))
    // stage 3: decontamination — broadcast the benchmark shingle set and
    // anti-join the survivors against docs with >= 3 shared shingles
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) >= 1)
    val benchG = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("g")).distinct()
    val cont = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(benchG), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= 3)
      .select("doc_id")
    kd.join(broadcast(cont), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("digest"), col("n_tokens"))
      .orderBy("doc_id")
  }

  // --- domain-mixture sampling to per-source token budgets -----------------
  // The training-mix assembly step: each source (domain) contributes a
  // reproducible hash-ordered prefix of its documents until that source's
  // token budget is exhausted (weights: src0 gets 2× the budget of every
  // other source). Hash order makes the sample uniform AND stable across
  // reruns/backfills — the standard reproducible-mixture construction.
  //
  // Scale design — the naive plan (one window per source) funnels each
  // domain through a single task; a 40-TB common-crawl domain would be one
  // partition. Instead, two-phase prefix sums (the OrderedOps construction
  // applied per group):
  //   1. hkey buckets (top 8 bits) → per-(source, bucket) token sums →
  //      running bucket offsets; this relation is (sources × 256) rows —
  //      broadcast, never shuffled wide.
  //   2. buckets whose offset already exceeds the budget are dropped BEFORE
  //      the row-level window — the corpus past the cutoff never windows at
  //      all (at a 1% sampling rate, ~99% of rows skip phase 2); survivors
  //      window within (source, bucket) — 256-way parallel per domain.
  register("pipeline_domain_mix",
    s"""WITH t AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
       |    ${sqlPolyHash("CAST(doc_id AS VARCHAR)")} AS hkey FROM documents),
       |c AS (SELECT doc_id, source, n_tok,
       |    sum(n_tok) OVER (PARTITION BY source ORDER BY hkey, doc_id
       |                     ROWS UNBOUNDED PRECEDING) AS cum FROM t)
       |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok, CAST(cum AS BIGINT) AS cum_tokens
       |FROM c WHERE cum <= CASE WHEN source = 'src0' THEN 1200 ELSE 600 END
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(tokenize(col("text"))).cast(LongType).as("n_tok"),
        polyHash(col("doc_id").cast(StringType)).as("hkey"))
    graft.ops.DomainMix
      .budgetPrefix(t, "source", "n_tok", "hkey", "doc_id", "cum_tokens",
        src => when(src === "src0", 1200L).otherwise(600L))
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tokens"))
      .orderBy("doc_id")
  }

  // --- capstone composite: quality gate → exact dedup → domain-mix budget ---
  // The full training-mix assembly as ONE declarative plan: the quality
  // gate fuses into the scan, dedup is the single corpus-scale digest
  // shuffle with the survivor riding min_by, and the mixture prefix runs
  // DomainMix's two-phase bucketed construction on the survivors. Stages
  // compose lazily — nothing materializes between them, and Catalyst sees
  // the whole pipeline when pruning columns back to the scan.
  register("pipeline_training_mix",
    s"""WITH q AS (SELECT doc_id, source, text, len(string_split(text, ' ')) AS n_tok
       |    FROM documents WHERE len(string_split(text, ' ')) BETWEEN 20 AND 90),
       |dg AS (SELECT doc_id, source, n_tok, ${sqlPolyHash("text")} AS digest FROM q),
       |keep AS (SELECT digest, min(doc_id) AS doc_id FROM dg GROUP BY digest),
       |kd AS (SELECT d.doc_id, d.source, d.n_tok,
       |    ${sqlPolyHash("CAST(d.doc_id AS VARCHAR)")} AS hkey
       |  FROM dg d JOIN keep k ON d.digest = k.digest AND d.doc_id = k.doc_id),
       |c AS (SELECT doc_id, source, n_tok,
       |    sum(n_tok) OVER (PARTITION BY source ORDER BY hkey, doc_id
       |                     ROWS UNBOUNDED PRECEDING) AS cum FROM kd)
       |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok, CAST(cum AS BIGINT) AS cum_tokens
       |FROM c WHERE cum <= 400
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = tokenize(col("text"))
    val q = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        size(toks).cast(LongType).as("n_tok"))
      .filter(col("n_tok").between(20, 90))
    val kd = q
      .select(col("doc_id"), col("source"), col("n_tok"), polyHash(col("text")).as("digest"))
      .groupBy(col("digest"))
      .agg(min_by(struct(col("doc_id"), col("source"), col("n_tok")), col("doc_id")).as("s"))
      .select(col("s.doc_id").as("doc_id"), col("s.source").as("source"),
        col("s.n_tok").as("n_tok"))
      .withColumn("hkey", polyHash(col("doc_id").cast(StringType)))
    graft.ops.DomainMix
      .budgetPrefix(kd, "source", "n_tok", "hkey", "doc_id", "cum_tokens",
        _ => lit(400L))
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tokens"))
      .orderBy("doc_id")
  }

  // --- per-epoch corpus reshuffle + shard assignment ------------------------
  // The "shuffle the corpus differently every epoch" step of training-data
  // assembly: each epoch is an independent deterministic permutation of the
  // whole corpus (shuffle key = salted content-free hash, so the order is
  // reproducible from (epoch, doc_id) alone and needs no stored state), and
  // each permutation is cut into shard files by position. Scale shape: the
  // permutation is realized by OrderedOps.withGlobalRowNumber's two-phase
  // numbering — range-partition on the hash key, per-partition local
  // row_number, one broadcast prefix of per-partition counts — so a 100-TB
  // corpus re-orders with ONE range shuffle per epoch-set and no
  // single-task window anywhere. Writing `partitionBy(epoch, shard)` on
  // the result is then an append-only file layout job. The epoch count
  // multiplies rows linearly (here 2), exactly like the physical copies
  // training makes anyway.
  register("pipeline_epoch_shuffle",
    s"""WITH e AS (SELECT doc_id, unnest([0, 1]) AS epoch FROM documents),
       |k AS (SELECT epoch, doc_id,
       |        ${sqlPolyHash("'ep' || epoch || '_' || doc_id")} AS key FROM e),
       |r AS (SELECT epoch, doc_id, key,
       |        row_number() OVER (PARTITION BY epoch ORDER BY key, doc_id) AS pos
       |      FROM k)
       |SELECT epoch, doc_id, CAST(pos AS BIGINT) AS pos,
       |  CAST((pos - 1) % 8 AS BIGINT) AS shard
       |FROM r ORDER BY epoch, pos""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val perEpoch = docs.count() // one count job; scalar, not collected data
    val keyed = docs
      .select(col("doc_id"), explode(array(lit(0), lit(1))).as("epoch"))
      .withColumn("key", polyHash(concat(lit("ep"), col("epoch").cast(StringType),
        lit("_"), col("doc_id").cast(StringType))))
    graft.ops.OrderedOps
      .withGlobalRowNumber(keyed, "gpos", Seq(col("epoch"), col("key"), col("doc_id")))
      .select(col("epoch"), col("doc_id"),
        (col("gpos") - col("epoch") * lit(perEpoch)).as("pos"),
        ((col("gpos") - col("epoch") * lit(perEpoch) - 1) % 8).as("shard"))
      .orderBy("epoch", "pos")
  }
}
