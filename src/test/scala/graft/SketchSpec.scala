package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the probabilistic-sketch guarantees that the sketch-accelerated
  * queries depend on for EXACTNESS. Both `dedup_contamination_bloom` and
  * `text_heavy_hitters_cms` pass the hash-comparing oracle only because
  * sketches are used strictly as one-sided prunes:
  *
  *  - Bloom: `might_contain` has NO false negatives, so the pruned corpus
  *    stream still contains every truly-contaminated (doc, shingle) pair;
  *    the exact-confirm join removes false positives.
  *  - Count-Min: estimates only ever OVER-count, so the candidate set
  *    contains every true heavy hitter; the exact recount removes the
  *    overcounted tail.
  *
  * These invariants are mathematical properties of the sketches, but the
  * IMPLEMENTATION detail they hinge on here is byte-path consistency: the
  * aggregate side updates with UTF8String bytes while the probe side hashes
  * driver-supplied values, and a mismatch would silently produce false
  * negatives (breaking exactness, not just accuracy). That cross-path
  * agreement is what this suite pins.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("bloom prune keeps every truly-overlapping pair (no false negatives)") {
    // the bloom-pruned result must equal the unpruned exact plan — on the
    // SAME slice/threshold parameters as the registered query
    import graft.text.TextFunctions.shingles
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) >= 1)
    val bench = docs.filter(col("doc_id") % 89 === 0)
      .select(explode(col("sh")).as("g")).distinct()
    val exact = docs.filter(col("doc_id") % 89 =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(bench, Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= 2)
    val pruned = SparkEntry.queries("dedup_contamination_bloom")(spark, sf)
    assert(pruned.exceptAll(exact).count() == 0 &&
      exact.exceptAll(pruned).count() == 0,
      "bloom-pruned plan diverged from the exact plan")
  }

  test("bloom query plans the might_contain prune and only equi-joins") {
    val p = SparkEntry.queries("dedup_contamination_bloom")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"sketch prune missing from plan:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("CMS aggregate bytes and byte-array probes hash identically") {
    // agg side: Spark's count_min_sketch over a string column (UTF8String
    // bytes); probe side: java String UTF-8 bytes. Exact counts on a
    // known-cardinality relation — any byte-path mismatch shows up as a
    // wrong (almost always zero) estimate.
    import spark.implicits._
    val items = Seq.tabulate(300)(i => s"tok_${i % 30}").toDF("t")
    val bytes = items
      .agg(expr("count_min_sketch(t, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    for (i <- 0 until 30) {
      val est = cms.estimateCount(
        s"tok_$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(est >= 10L, s"tok_$i under-counted: $est (byte-path mismatch?)")
      // 30 distinct items, eps 0.001 over 300 updates → overcount < 1
      assert(est <= 11L, s"tok_$i grossly over-counted: $est")
    }
    assert(cms.estimateCount("absent".getBytes(
      java.nio.charset.StandardCharsets.UTF_8)) <= 1L)
  }

  test("CMS heavy-hitter candidates contain every exact heavy hitter") {
    import graft.text.TextFunctions.{tokenize, wordNgrams}
    val grams = Tables.documents(spark, sf)
      .select(explode(wordNgrams(tokenize(col("text")), 2)).as("gram"))
    val total = grams.count()
    val threshold = total / 2000.0
    val exactHeavy = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
    val result = SparkEntry.queries("text_heavy_hitters_cms")(spark, sf)
    // the registered query's output IS the exact heavy-hitter set — the
    // sketch can only have widened the candidate pool, never narrowed it
    assert(result.exceptAll(exactHeavy).count() == 0 &&
      exactHeavy.exceptAll(result).count() == 0,
      "CMS-pruned heavy hitters diverged from the exact set")
  }
}
