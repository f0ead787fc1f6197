package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GF

/** Null/NaN-policy and convert-function coverage (SURVEY §1.3: null ≠ NaN;
  * cudf nan_policy / null_policy distinctions) over synthetic edge frames —
  * the cases the parquet corpus doesn't contain.
  */
class GFSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("pymod follows divisor sign (python), % follows dividend (C)") {
    import spark.implicits._
    val r = Seq((-7, 3), (7, -3), (-7, -3), (7, 3)).toDF("a", "b")
      .select(GF.pymod(col("a"), col("b")).as("py"), (col("a") % col("b")).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(r == Seq((2, -1), (-2, 1), (-1, -1), (1, 1)))
  }

  test("NaN is a value, null is absence (nan_policy NAN_IS_VALID)") {
    import spark.implicits._
    val df = Seq(Some(1.0), Some(Double.NaN), None).toDF("x")
    val got = df.select(
      col("x").isNull.as("is_null"),
      isnan(coalesce(col("x"), lit(0.0))).as("is_nan"),
      count(col("x")).over().as("count_valid")).collect()
    assert(got.map(_.getBoolean(0)).toSeq == Seq(false, false, true))
    assert(got.map(_.getBoolean(1)).toSeq == Seq(false, true, false))
    // count skips null but COUNTS NaN (null_policy EXCLUDE applies to nulls only)
    assert(got.head.getLong(2) == 2L)
  }

  test("nullMax/nullMin skip nulls like cudf NULL_MAX/NULL_MIN") {
    import spark.implicits._
    val r = Seq((Some(1.0), None: Option[Double]), (None, None), (Some(1.0), Some(2.0)))
      .toDF("a", "b")
      .select(GF.nullMax(col("a"), col("b")).as("mx"), GF.nullMin(col("a"), col("b")).as("mn"))
      .collect()
    assert(r(0).getDouble(0) == 1.0 && r(0).getDouble(1) == 1.0)
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
    assert(r(2).getDouble(0) == 2.0 && r(2).getDouble(1) == 1.0)
  }

  test("zfill is sign-aware") {
    import spark.implicits._
    val r = Seq("-42", "7").toDF("s")
      .select(GF.zfill(col("s"), 6).as("z")).collect().map(_.getString(0)).toSeq
    assert(r == Seq("-00042", "000007"))
  }

  test("ipv4 int → string → int roundtrips across the uint32 range") {
    import spark.implicits._
    val vals = Seq(0L, 1L, 255L, 256L, 16777215L, 16777216L, 4294967295L)
    val r = vals.toDF("v")
      .select(GF.ipv4ToInt(GF.intToIpv4(col("v"))).as("rt"))
      .collect().map(_.getLong(0)).toSeq
    assert(r == vals)
    val ip = Seq(3232235777L).toDF("v").select(GF.intToIpv4(col("v"))).collect()(0).getString(0)
    assert(ip == "192.168.1.1")
  }

  test("strToBool maps token sets and rejects unknowns as null") {
    import spark.implicits._
    val r = Seq("true", "FALSE", "1", "no", "maybe").toDF("s")
      .select(GF.strToBool(col("s")).as("b")).collect()
      .map(row => if (row.isNullAt(0)) None else Some(row.getBoolean(0))).toSeq
    assert(r == Seq(Some(true), Some(false), Some(true), Some(false), None))
  }

  test("clip handles bounds and empty frames") {
    import spark.implicits._
    val r = Seq(0.5, 3.0, 10.0).toDF("x")
      .select(GF.clip(col("x"), lit(1.0), lit(5.0)).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(r == Seq(1.0, 3.0, 5.0))
    assert(Seq.empty[Double].toDF("x")
      .select(GF.clip(col("x"), lit(1.0), lit(5.0))).count() == 0)
  }
}
