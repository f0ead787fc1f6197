package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null/NaN JOIN-KEY semantics pinned against the reference's enums
  * (types.hpp:144-153 null_equality {EQUAL, UNEQUAL} / nan_equality
  * {ALL_EQUAL, UNEQUAL}; join null paths exercised by test_joining.py).
  *
  * The port's contract (SURVEY §1.3/§2.3):
  *  - default equi-join = null_equality::UNEQUAL — null keys match nothing,
  *    on either side;
  *  - `<=>` (null-safe equal) = null_equality::EQUAL — null keys join each
  *    other;
  *  - outer joins keep null-key rows as unmatched (null payload);
  *  - NaN keys behave as nan_equality::ALL_EQUAL — Spark treats NaN as a
  *    normal, self-equal value in join/group keys (NOT IEEE semantics).
  */
class JoinSemanticsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def left = {
    import spark.implicits._
    Seq((Some(1), "l1"), (Some(2), "l2"), (None, "lnull")).toDF("k", "lv")
  }
  private def right = {
    import spark.implicits._
    Seq((Some(2), "r2"), (Some(3), "r3"), (None, "rnull")).toDF("k", "rv")
  }

  test("default equi-join: null keys match nothing (null_equality::UNEQUAL)") {
    val (l, r) = (left, right)
    val got = l.join(r, l("k") === r("k"))
      .select(l("k"), col("lv"), col("rv")).collect()
    assert(got.map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet ==
      Set((2, "l2", "r2")))
  }

  test("null-safe <=> joins null keys to each other (null_equality::EQUAL)") {
    val (l, r) = (left, right)
    val got = l.join(r, l("k") <=> r("k"))
      .select(col("lv"), col("rv")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("l2", "r2"), ("lnull", "rnull")))
  }

  test("left join keeps the null-key left row unmatched") {
    val (l, r) = (left, right)
    val got = l.join(r, l("k") === r("k"), "left")
      .select(col("lv"), col("rv")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(("l1", None), ("l2", Some("r2")), ("lnull", None)))
  }

  test("NaN keys are self-equal in joins and grouping (nan_equality::ALL_EQUAL)") {
    import spark.implicits._
    val a = Seq((Double.NaN, "a_nan"), (1.0, "a_1")).toDF("k", "av")
    val b = Seq((Double.NaN, "b_nan"), (2.0, "b_2")).toDF("k", "bv")
    val joined = a.join(b, a("k") === b("k"))
      .select(col("av"), col("bv")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(joined == Set(("a_nan", "b_nan")))
    // and NaN forms ONE group
    val groups = Seq(Double.NaN, Double.NaN, 5.0).toDF("k")
      .groupBy("k").count().collect().map(_.getLong(1)).sorted.toSeq
    assert(groups == Seq(1L, 2L))
  }

  test("nearest as-of join: backward wins exact-distance ties (pandas rule)") {
    import spark.implicits._
    // left at t=10; right at t=5 (dist 5), t=15 (dist 5), and t=10 (dist 0)
    // for a second key. Equidistant → the EARLIER (backward) row must win;
    // an exact-time right row matches with distance 0.
    val left = Seq(("a", 10L, 1L), ("b", 10L, 2L)).toDF("k", "t", "lid")
    val right = Seq(("a", 5L, 100L), ("a", 15L, 200L), ("b", 10L, 300L))
      .toDF("k", "t", "rid")
    val got = graft.ops.AsOfJoin
      .nearest(left, right, keyCol = "k", tCol = "t", payload = Seq("rid"))
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got == Map("a" -> 100L, "b" -> 300L))
    // forward direction on the same fixture takes the later row for a
    val fwd = graft.ops.AsOfJoin
      .forward(left, right, keyCol = "k", tCol = "t", payload = Seq("rid"))
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(fwd == Map("a" -> 200L, "b" -> 300L))
  }
}
