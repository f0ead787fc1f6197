package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: runs the dedup/ANN family at sf0.1 and at a synthetic
  * 10× corpus ("sf1"), printing per-query seconds — the empirical check
  * that the claimed linear-in-N candidate bounds hold (≤ ~10× wall-time at
  * 10× rows). Results are recorded in SCALE.md.
  *
  * The 10× corpus is NOT ten verbatim copies: duplicating rows would
  * multiply the near-dup rate tenfold and turn the rehearsal into a
  * different (pathological) workload. Instead each copy k applies a
  * per-copy CHARACTER BIJECTION (alphabet rotated by k) to the text — a
  * bijective map preserves every within-copy relationship exactly (exact
  * duplicates stay exact, shingle-Jaccard similarities are invariant,
  * token/shingle counts unchanged) while making cross-copy text disjoint
  * at the vocabulary level, so the per-document near-dup rate of the
  * scaled corpus matches sf0.1. Embeddings rotate dimensions cyclically
  * per copy (an isometry — within-copy cosine structure invariant).
  *
  * Usage: runMain graft.ScaleRehearsal [outDir]
  *   builds <outDir>/sf1/{documents,embeddings}.parquet from
  *   /root/testdata/sf0.1, then times the family at both scales.
  */
object ScaleRehearsal {

  val Family: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "dedup_span_ngrams", "dedup_simhash",
    "dedup_connected_components", "sim_lsh_buckets",
    // text-analysis tier: scan-fused or single-shuffle — expected ~linear
    "text_lang_id", "text_quality", "text_fasttext_score",
    "text_fingerprint", "text_gopher_rules", "text_token_budget_pack")

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  def buildScaled(spark: SparkSession, srcDir: String, outDir: String,
                  copies: Int): Unit = {
    val docs = Tables.documents(spark, srcDir)
    val embs = Tables.embeddings(spark, srcDir)
    val docN = docs.count()
    val embN = embs.count()
    val scaledDocs = (0 until copies).map { k =>
      val rot = alpha.drop(k % 26) + alpha.take(k % 26)
      docs.select(
        (col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
        translate(col("text"), alpha, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    val dim = embs.select(size(col("embedding"))).first().getInt(0)
    val scaledEmbs = (0 until copies).map { k =>
      val shift = k % dim
      // cyclic dimension rotation: slice+concat, an exact isometry
      embs.select(
        (col("vec_id") + lit(k * 10_000_000L)).as("vec_id"),
        concat(
          slice(col("embedding"), shift + 1, dim - shift),
          slice(col("embedding"), 1, shift)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    scaledDocs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaledEmbs.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[scale] built ${docN * copies} docs / ${embN * copies} embeddings at $outDir")
  }

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val s = (System.nanoTime() - t0) / 1e9
    graft.ops.OrderedOps.clearPins()
    s
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/scale")
    val src = "/root/testdata/sf0.1"
    val sf1 = s"$out/sf1"
    val spark = GraftSession.build("graft-scale")
    spark.sparkContext.setLogLevel("WARN")
    buildScaled(spark, src, sf1, copies = 10)
    // warmup: absorb JIT/codegen on one family member per scale
    time(spark, Family.head, src)
    time(spark, Family.head, sf1)
    val rows = Family.map { q =>
      val t01 = time(spark, q, src)
      val t1 = time(spark, q, sf1)
      println(f"""{"query":"$q","sf01_sec":$t01%.2f,"sf1_sec":$t1%.2f,"ratio":${t1 / t01}%.2f}""")
      (q, t01, t1)
    }
    val tot01 = rows.map(_._2).sum
    val tot1 = rows.map(_._3).sum
    println(f"""{"total_sf01_sec":$tot01%.2f,"total_sf1_sec":$tot1%.2f,"ratio":${tot1 / tot01}%.2f}""")
    spark.stop()
  }
}
