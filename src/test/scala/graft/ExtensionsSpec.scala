package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextFunctions

/** The injected Catalyst optimizer rule (JaccardThresholdPruning via
  * SparkSessionExtensions) must rewrite the plan AND leave results
  * unchanged. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // parquet-backed (a LocalRelation would be fully constant-folded by the
  // optimizer before the rule could be observed)
  private def jacDf = Tables.documents(spark, TestSpark.sfDir)
    .select(col("doc_id"),
      split(col("text"), " ").as("a"),
      split(substring(col("text"), 1, 60), " ").as("b"))

  test("rule injects the size-ratio prefilter into jaccard >= t filters") {
    val plan = jacDf
      .filter(TextFunctions.jaccard(col("a"), col("b")) >= 0.5)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("size("), plan)
    assert(plan.contains("graft_jaccard"), plan)
  }

  test("rewritten filter returns exactly the rows of the unrewritten predicate") {
    val fast = jacDf
      .filter(TextFunctions.jaccard(col("a"), col("b")) >= 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // reference predicate with no JaccardSim (rule can't touch it)
    val ref = jacDf
      .filter(size(array_intersect(col("a"), col("b"))).cast("double")
        / size(array_union(col("a"), col("b"))) >= 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(fast == ref && fast.nonEmpty)
  }

  test("rule is fixpoint-stable (applies once, marked prefiltered)") {
    val optimized = jacDf
      .filter(TextFunctions.jaccard(col("a"), col("b")) >= 0.5)
      .queryExecution.optimizedPlan
    val s = optimized.toString
    // exactly one jaccard evaluation and 4 size probes (2 conjuncts × 2
    // sides) — re-application would double both
    assert("graft_jaccard".r.findAllIn(s).size == 1, s)
    assert("size\\(".r.findAllIn(s).size == 4, s)
  }

  test("dedup_lsh_verified still matches with the rule active (spot check)") {
    val rows = SparkEntry.queries("dedup_lsh_verified")(spark, TestSpark.sfDir).count()
    assert(rows >= 0) // smoke: plan executes with the injected rule
  }

  test("injected SQL functions resolve and agree with the column builders") {
    import spark.implicits._
    Seq(("the quick brown fox jumps over", Seq(0.1, 0.2, 0.3), Seq(0.3, 0.2, 0.1)))
      .toDF("s", "va", "vb").createOrReplaceTempView("ext_fn_probe")
    val r = spark.sql(
      """SELECT graft_cosine(va, vb) AS c,
        |  graft_jaccard(split(s, ' '), slice(split(s, ' '), 1, 3)) AS j,
        |  graft_polyhash(s) AS h,
        |  graft_shingles(s, 3) AS sh,
        |  graft_shingle_hashes(s, 3) AS shh,
        |  graft_span_hashes(s, 3) AS sph,
        |  graft_simhash(split(s, ' '), 16) AS sim
        |FROM ext_fn_probe""".stripMargin).head
    val ref = spark.table("ext_fn_probe").select(
      graft.functions.GF.cosine(col("va"), col("vb")),
      TextFunctions.jaccard(split(col("s"), " "), slice(split(col("s"), " "), 1, 3)),
      TextFunctions.polyHash(col("s")),
      TextFunctions.shingles(col("s")),
      TextFunctions.shingleHashes(col("s")),
      TextFunctions.spanHashes(col("s"), 3),
      TextFunctions.simhash(split(col("s"), " "), 16)).head
    assert(r.getDouble(0) == ref.getDouble(0))
    assert(r.getDouble(1) == ref.getDouble(1))
    assert(r.getLong(2) == ref.getLong(2))
    assert(r.getSeq[String](3) == ref.getSeq[String](3))
    assert(r.getSeq[Long](4) == ref.getSeq[Long](4))
    assert(r.getSeq[Long](5) == ref.getSeq[Long](5))
    assert(r.getLong(6) == ref.getLong(6))
  }
}
