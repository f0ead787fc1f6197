package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QueryLocals

/** Pins the @local substitution surface (reference utils/queryutils.py:38):
  * literal rendering per type, escaping, IN-lists, and the fail-fast paths
  * the oracle query can't exercise. */
class QueryLocalsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("locals bind as literals: numerics, strings with quotes, IN-lists") {
    import spark.implicits._
    val df = Seq((1L, "a'b", 1.5), (2L, "cd", 9.0), (3L, "a'b", -2.0))
      .toDF("id", "s", "v")
    val got = df.filter(QueryLocals.queryExpr(
      "s == @needle and v > @lo and id in @ids",
      Map("needle" -> "a'b", "lo" -> 0.0, "ids" -> Seq(1L, 3L))))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("date and timestamp locals render as typed literals") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-03-01")),
      (2L, java.sql.Date.valueOf("2024-05-01"))).toDF("id", "d")
    val got = df.filter(QueryLocals.queryExpr(
      "d >= @cut", Map("cut" -> java.sql.Date.valueOf("2024-04-01"))))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
  }

  test("backslashes in string locals survive Spark's escape processing") {
    import spark.implicits._
    val df = Seq((1L, "a\\tb"), (2L, "a\tb"), (3L, "end\\")).toDF("id", "s")
    // "a\tb" with a LITERAL backslash-t must match row 1, not the tab row
    val got = df.filter(QueryLocals.queryExpr(
      "s == @lit", Map("lit" -> "a\\tb"))).select("id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L))
    // a value ENDING in a backslash must not swallow the closing quote
    val tail = df.filter(QueryLocals.queryExpr(
      "s == @lit", Map("lit" -> "end\\"))).select("id").collect().map(_.getLong(0))
    assert(tail.toSeq == Seq(3L))
  }

  test("@ inside a quoted string is query text, not a local reference") {
    import spark.implicits._
    val df = Seq((1L, "alice@example.com"), (2L, "bob@other.org")).toDF("id", "email")
    // @example must NOT resolve (it is inside the literal); @dom must
    val got = df.filter(QueryLocals.queryExpr(
      "email == 'alice@example.com' or email == @dom",
      Map("dom" -> "bob@other.org"))).select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("unknown @name fails fast naming the available bindings") {
    val e = intercept[IllegalArgumentException] {
      QueryLocals.queryExpr("x > @missing", Map("present" -> 1))
    }
    assert(e.getMessage.contains("@missing") && e.getMessage.contains("present"))
  }

  test("random adversarial strings roundtrip the literal rendering exactly") {
    import spark.implicits._
    // strings drawn from the characters that break naive escaping:
    // backslashes, quotes, @, %, _, newlines/tabs, unicode
    val hostile = Gen.listOf(Gen.oneOf(
      Gen.const("\\"), Gen.const("'"), Gen.const("@"), Gen.const("%"),
      Gen.const("_"), Gen.const("\n"), Gen.const("\t"), Gen.const("🙂"),
      Gen.alphaNumChar.map(_.toString))).map(_.mkString)
    val values = Gen.listOfN(60, hostile)
      .pureApply(Gen.Parameters.default, Seed(11L)).distinct
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "s")
    values.zipWithIndex.foreach { case (v, i) =>
      val got = df.filter(QueryLocals.queryExpr("s == @needle", Map("needle" -> v)))
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got == Seq(i.toLong), s"value ${v.map(_.toInt)} did not roundtrip")
    }
  }

  test("empty IN-list and non-finite doubles are rejected") {
    intercept[IllegalArgumentException] {
      QueryLocals.queryExpr("x in @xs", Map("xs" -> Seq.empty[Int]))
    }
    intercept[IllegalArgumentException] {
      QueryLocals.queryExpr("x > @nan", Map("nan" -> Double.NaN))
    }
  }

  test("null element in an IN-list collection is rejected loudly") {
    // SQL three-valued logic: `x IN (1, NULL)` is never TRUE for x != 1 and
    // `NOT IN` returns no rows — silently diverging from pandas `in @list`
    // with None. The divergence must be an error, like the empty list.
    val e = intercept[IllegalArgumentException] {
      QueryLocals.queryExpr("x in @xs", Map("xs" -> Seq("a", null, "b")))
    }
    assert(e.getMessage.contains("@xs") && e.getMessage.contains("null"))
  }
}
