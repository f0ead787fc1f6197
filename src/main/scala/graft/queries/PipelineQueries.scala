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
}
