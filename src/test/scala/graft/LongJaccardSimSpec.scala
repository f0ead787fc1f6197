package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{LongJaccardSim, LongJaccardSimImpl}
import graft.text.TextFunctions

/** The LSH verify kernel: [[LongJaccardSim]] vs the
  * array_intersect/array_distinct(concat) builtin form it replaces —
  * value equivalence (fuzzed), threshold early-exit semantics, the
  * strictly-ascending input contract, the SQL registration's defensive
  * normalization, and the optimizer rule that hands a filter's threshold
  * to the kernel. */
class LongJaccardSimSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(17)
  private def randSet(maxLen: Int): Array[Long] = {
    val n = rnd.nextInt(maxLen + 1)
    val s = scala.collection.mutable.SortedSet.empty[Long]
    while (s.size < n) s += rnd.nextInt(maxLen * 3).toLong
    s.toArray
  }

  private def refJaccard(a: Array[Long], b: Array[Long]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val u = (sa ++ sb).size
    if (u == 0) 0.0 else (sa & sb).size.toDouble / u
  }

  private def kernel(a: Array[Long], b: Array[Long], t: Double): Double =
    LongJaccardSimImpl.jaccard(
      new GenericArrayData(a.map(_.asInstanceOf[Any])),
      new GenericArrayData(b.map(_.asInstanceOf[Any])), t)

  test("kernel matches the set reference with pruning disabled (fuzz)") {
    for (_ <- 1 to 2000) {
      val a = randSet(40); val b = randSet(40)
      val got = kernel(a, b, Double.NegativeInfinity)
      assert(got == refJaccard(a, b),
        s"a=${a.mkString(",")} b=${b.mkString(",")}")
    }
    // long arrays cross the 32-step early-exit cadence even when exact
    for (_ <- 1 to 200) {
      val a = randSet(400); val b = randSet(400)
      assert(kernel(a, b, Double.NegativeInfinity) == refJaccard(a, b))
    }
  }

  test("threshold: exact at-or-above, any value strictly below when pruned") {
    for (_ <- 1 to 2000) {
      val a = randSet(120); val b = randSet(120)
      val t = rnd.nextInt(10) / 10.0 + 0.05
      val exact = refJaccard(a, b)
      val got = kernel(a, b, t)
      if (exact >= t) assert(got == exact, s"t=$t exact=$exact got=$got")
      else assert(got < t, s"t=$t exact=$exact got=$got")
    }
  }

  test("edges: empty/empty -> 0.0; empty/non-empty; identical arrays") {
    assert(kernel(Array.empty, Array.empty, Double.NegativeInfinity) == 0.0)
    assert(kernel(Array.empty, Array(1L, 2L), Double.NegativeInfinity) == 0.0)
    assert(kernel(Array.empty, Array(1L, 2L), 0.2) < 0.2)
    val a = randSet(50) ++ Array(999999L) // non-empty for sure
    assert(kernel(a.distinct.sorted, a.distinct.sorted,
      Double.NegativeInfinity) == 1.0)
  }

  test("ordering violations on the visited prefix throw with guidance") {
    val e1 = intercept[IllegalArgumentException] {
      kernel(Array(5L, 3L, 7L), Array(3L, 5L, 7L), Double.NegativeInfinity)
    }
    assert(e1.getMessage.contains("strictly ascending"))
    // duplicates violate strictness too (a sorted-but-not-distinct array
    // would silently undercount the union)
    intercept[IllegalArgumentException] {
      kernel(Array(3L, 3L, 7L), Array(3L, 7L), Double.NegativeInfinity)
    }
  }

  test("DataFrame path matches the builtin form on shingle hashes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "a completely different document about spark engines"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "")).toDF("doc_id", "text")
    val h = docs.select(col("doc_id"),
      array_sort(TextFunctions.shingleHashes(col("text"))).as("h"))
    val pairs = h.select(col("doc_id").as("d1"), col("h").as("h1"))
      .crossJoin(h.select(col("doc_id").as("d2"), col("h").as("h2")))
      .filter(col("d1") < col("d2"))
    val builtin = pairs.withColumn("j",
      size(array_intersect(col("h1"), col("h2"))).cast("double") /
        size(array_distinct(concat(col("h1"), col("h2")))))
      .filter(col("j") >= 0.2)
      .select("d1", "d2", "j").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val kernelRows = pairs.withColumn("j",
      TextFunctions.jaccardHashes(col("h1"), col("h2"), 0.2))
      .filter(col("j") >= 0.2)
      .select("d1", "d2", "j").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(kernelRows == builtin)
    assert(kernelRows.exists { case (d1, d2, j) => d1 == 1L && d2 == 4L && j == 1.0 })
  }

  test("SQL function is total: unsorted, duplicated, null-bearing inputs") {
    val r = spark.sql(
      """SELECT graft_jaccard_hashes(array(7L, 3L, 5L, 3L, NULL),
        |                            array(3L, 5L, 9L)) AS j""".stripMargin)
      .head().getDouble(0)
    // {3,5,7} vs {3,5,9}: inter 2, union 4
    assert(r == 0.5)
    val thr = spark.sql(
      """SELECT graft_jaccard_hashes(array(1L, 2L, 3L, 4L),
        |                            array(9L, 10L), 0.5) AS j""".stripMargin)
      .head().getDouble(0)
    assert(thr < 0.5)
  }

  test("optimizer rule hands a filter's literal threshold to the kernel") {
    // spark.range, not a local Seq: ConvertToLocalRelation would eagerly
    // evaluate a LocalRelation-rooted plan and leave nothing to inspect
    val df = spark.range(1)
      .select(array(col("id") + 1, col("id") + 2, col("id") + 3).as("a"),
        array(col("id") + 2, col("id") + 3, col("id") + 4).as("b"))
      .withColumn("j", TextFunctions.jaccardHashes(col("a"), col("b")))
      .filter(col("j") >= 0.4)
    val thresholds = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case LongJaccardSim(_, _, t) => t })
    }.flatten
    assert(thresholds.contains(0.4),
      s"expected a thresholded kernel in the filter, got $thresholds")
    // and the result is still the exact value (0.5 >= 0.4 survives)
    assert(df.select("j").head().getDouble(0) == 0.5)
  }
}
