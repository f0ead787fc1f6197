package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.GraftIO
import graft.io.GraftIO.CsvOptions

/** IO option-mapping edge cases the oracle queries don't pin: null vs
  * empty-string round-tripping (cuDF distinguishes them; csv.hpp na_values
  * vs empty fields) and schema'd JSON types. */
class IoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String) = s"${sys.props("java.io.tmpdir")}/graft_io_test/$n"

  test("CSV roundtrip distinguishes null from empty string") {
    import spark.implicits._
    val src = Seq((1, Some("x")), (2, Some("")), (3, None))
      .toDF("id", "s")
    val path = tmp("null_vs_empty")
    src.write.mode("overwrite")
      .option("header", true).option("nullValue", "\\N").option("emptyValue", "\"\"")
      .csv(path)
    val back = spark.read
      .option("header", true).option("nullValue", "\\N").option("emptyValue", "")
      .schema(StructType(Seq(StructField("id", IntegerType), StructField("s", StringType))))
      .csv(path)
      .orderBy("id")
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getString(1))))
    assert(back.toSeq == Seq((1, Some("x")), (2, Some("")), (3, None)))
  }

  test("CSV reader honors usecols projection and explicit dtype") {
    val src = Tables.nation(spark, TestSpark.sfDir)
    val path = tmp("usecols")
    GraftIO.writeCsv(src, path, header = true)
    val back = GraftIO.readCsv(spark, path, CsvOptions(
      header = true,
      usecols = Seq("n_nationkey", "n_name"),
      dtype = Some(StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType))))))
    assert(back.columns.toSeq == Seq("n_nationkey", "n_name"))
    assert(back.schema("n_nationkey").dataType == IntegerType)
    assert(back.count() == src.count())
  }

  test("JSON-lines roundtrip preserves schema'd types") {
    import spark.implicits._
    val src = Seq((1L, 1.5, "a"), (2L, -0.25, "b")).toDF("l", "d", "s")
    val path = tmp("json_types")
    GraftIO.writeJson(src, path)
    val back = GraftIO.readJson(spark, path, Some(StructType(Seq(
      StructField("l", LongType), StructField("d", DoubleType),
      StructField("s", StringType)))))
      .orderBy("l").as[(Long, Double, String)].collect().toSeq
    assert(back == Seq((1L, 1.5, "a"), (2L, -0.25, "b")))
  }
}
