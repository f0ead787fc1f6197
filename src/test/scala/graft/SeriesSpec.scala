package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.frame.{GdfSeries, MultiIndexFrame}

/** Pins the pandas-semantics corners of the Series / MultiIndex facades that
  * the batch oracle can't isolate: fill-BEFORE-op, both-sides-null with a
  * fill value, scalar ops skipping alignment, combine_first precedence, and
  * the dynamic unstack/stack column discovery.
  * Reference behaviors: core/series.py:1331 (_binaryop + fill_value),
  * tests/test_binops.py, core/reshape.py:843,924, tests/test_multiindex.py.
  */
class SeriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.Row

  private def series(pairs: Seq[(Int, java.lang.Double)], name: String): GdfSeries = {
    import spark.implicits._
    GdfSeries(pairs.toDF("k", name), "k", name)
  }

  private def toMap(s: GdfSeries): Map[Int, Option[Double]] =
    s.toDF.collect().map { r =>
      r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }.toMap

  test("aligned add without fill: one-sided labels yield null") {
    val a = series(Seq(1 -> 10.0, 2 -> 20.0), "a")
    val b = series(Seq(2 -> 200.0, 3 -> 300.0), "b")
    assert(toMap(a.add(b, "out")) ==
      Map(1 -> None, 2 -> Some(220.0), 3 -> None))
  }

  test("fill_value is applied BEFORE the op (sub is order-sensitive)") {
    val a = series(Seq(1 -> 10.0), "a")
    val b = series(Seq(2 -> 20.0), "b")
    // pandas: a.sub(b, fill_value=0) → {1: 10-0=10, 2: 0-20=-20}
    assert(toMap(a.sub(b, "out", fill = Some(lit(0.0)))) ==
      Map(1 -> Some(10.0), 2 -> Some(-20.0)))
  }

  test("label NaN on BOTH sides stays null even with fill_value") {
    val a = series(Seq(1 -> (10.0: java.lang.Double), 3 -> (null: java.lang.Double)), "a")
    val b = series(Seq(1 -> (1.0: java.lang.Double), 2 -> (2.0: java.lang.Double)), "b")
    // label 3: present only on a, with a null VALUE → both join sides null →
    // stays null despite fill (pandas: NaN + missing = NaN even w/ fill_value)
    assert(toMap(a.add(b, "out", fill = Some(lit(0.0)))) ==
      Map(1 -> Some(11.0), 2 -> Some(2.0), 3 -> None))
  }

  test("map with a Series arg: values looked up in the dict index, misses → null") {
    import spark.implicits._
    // values (not labels!) are the lookup keys; label set stays the caller's
    val s = GdfSeries(Seq((1, 10), (2, 20), (3, 99)).toDF("k", "v"), "k", "v")
    val dict = GdfSeries(Seq((10, 100.0), (20, 200.0)).toDF("dk", "dv"), "dk", "dv")
    val got = s.map(dict, "mapped").toDF.collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(1 -> Some(100.0), 2 -> Some(200.0), 3 -> None))
  }

  test("map with a duplicate dict index raises instead of multiplying rows") {
    import spark.implicits._
    val s = GdfSeries(Seq((1, 10), (2, 20)).toDF("k", "v"), "k", "v")
    val dupDict = GdfSeries(
      Seq((10, 100.0), (10, 101.0), (20, 200.0)).toDF("dk", "dv"), "dk", "dv")
    val e = intercept[Exception] {
      s.map(dupDict, "mapped").toDF.collect()
    }
    // pandas InvalidIndexError analogue: the plan's raise_error fires with
    // the offending label named
    assert(e.getMessage.contains("not unique") ||
      Option(e.getCause).exists(_.getMessage.contains("not unique")))
  }

  test("scalar binop is a plain projection — labels untouched, no join") {
    val a = series(Seq(1 -> 10.0, 2 -> 20.0), "a")
    val out = a.mapValue("out")(_ * 2)
    assert(toMap(out) == Map(1 -> Some(20.0), 2 -> Some(40.0)))
    // no Join node in the plan
    val plan = out.df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"scalar op must not align:\n$plan")
  }

  test("combine_first: left wins where present, right fills gaps and nulls") {
    val a = series(Seq(1 -> (null: java.lang.Double), 2 -> (20.0: java.lang.Double)), "a")
    val b = series(Seq(1 -> (1.0: java.lang.Double), 3 -> (3.0: java.lang.Double)), "b")
    assert(toMap(a.combineFirst(b, "out")) ==
      Map(1 -> Some(1.0), 2 -> Some(20.0), 3 -> Some(3.0)))
  }

  test("div promotes to double; mod follows python sign") {
    val a = series(Seq(1 -> 7.0), "a")
    val b = series(Seq(1 -> 2.0), "b")
    assert(toMap(a.div(b, "out")) == Map(1 -> Some(3.5)))
    val c = series(Seq(1 -> -7.0), "c")
    assert(toMap(c.mod(b, "out")) == Map(1 -> Some(1.0))) // python −7 % 2 = 1
  }

  test("unstack discovers pivot values from the data; stack reverses it") {
    import spark.implicits._
    val df = Seq(
      ("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0) // (y,q) missing
    ).toDF("r", "c", "v")
    val un = MultiIndexFrame(df, Seq("r", "c")).unstack("c", "v")
    assert(un.df.columns.sorted.toSeq == Seq("p", "q", "r")) // q discovered
    assert(un.levels == Seq("r"))
    val back = un.stack("c", "v").df.filter(col("v").isNotNull)
    val got = back.select("r", "c", "v").as[(String, String, Double)]
      .collect().toSet
    assert(got == Set(("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0)))
  }

  test("swapLevel is metadata-only: same rows, reordered level list") {
    import spark.implicits._
    val mi = MultiIndexFrame(Seq((1, "a", 9.0)).toDF("l1", "l2", "v"), Seq("l1", "l2"))
    val sw = mi.swapLevel(0, 1)
    assert(sw.levels == Seq("l2", "l1"))
    assert(sw.df eq mi.df) // no new plan at all
  }

  test("xs filters one level and drops it") {
    import spark.implicits._
    val mi = MultiIndexFrame(
      Seq((1, "a", 9.0), (2, "b", 8.0)).toDF("l1", "l2", "v"), Seq("l1", "l2"))
    val x = mi.xs("a", "l2")
    assert(x.levels == Seq("l1"))
    assert(x.df.collect().toSeq == Seq(Row(1, 9.0)))
  }

  test("aggDict flattens two-level names; selectOuter selects by outer level") {
    import spark.implicits._
    val mi = MultiIndexFrame(
      Seq((1, 10.0, 5L), (1, 20.0, 6L), (2, 30.0, 7L)).toDF("g", "x", "y"),
      Seq("g"))
    val out = mi.aggDict(Seq(0), Seq("x" -> Seq("sum", "max"), "y" -> Seq("min")))
    assert(out.df.columns.sorted.toSeq == Seq("g", "x_max", "x_sum", "y_min"))
    val sel = out.selectOuter("x")
    assert(sel.df.columns.sorted.toSeq == Seq("g", "x_max", "x_sum"))
  }
}
