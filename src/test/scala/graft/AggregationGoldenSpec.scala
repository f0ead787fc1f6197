package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins exact HLL++ sketch outputs against the fixed sf0.001 fixture.
  *
  * The registry query `agg_approx_distinct` gates only an error band (so
  * its oracle is valid at any scale factor); this spec retains full
  * regression power — any change to Spark's HLL++ parameters, merge, or
  * our rsd setting flips these exact values.
  */
class AggregationGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct sketch values are stable on the sf0.001 fixture") {
    val rows = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("apx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("apx_orders"))
      .orderBy("l_returnflag")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val flags = rows.map(_._1)
    assert(flags == Seq("A", "N", "R"), s"unexpected groups: $flags")
    // exact-count sanity: sketch within the 2%-rsd design margin (5% band)
    val exact = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    rows.zip(exact).foreach { case ((f, ap, ao), (ep, eo)) =>
      assert(math.abs(ap - ep) <= ep * 0.05, s"$f apx_parts $ap vs exact $ep")
      assert(math.abs(ao - eo) <= eo * 0.05, s"$f apx_orders $ao vs exact $eo")
    }
    // golden pin (regenerate ONLY if testdata/sf0.001 itself regenerates):
    // computed once from this fixture; see scaladoc for why these exist.
    val golden = AggregationGoldenSpec.Golden
    assert(rows == golden, s"sketch drift: $rows != $golden")
  }
}

object AggregationGoldenSpec {
  /** (l_returnflag, apx_parts, apx_orders) at sf0.001, rsd = 0.02. */
  val Golden: Seq[(String, Long, Long)] = Seq(
    ("A", 199L, 1074L), ("N", 199L, 1115L), ("R", 199L, 1083L))
}
