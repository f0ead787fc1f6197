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

  /** Parquet footer schema of the first part file under `dir`. */
  private def footerSchema(dir: String): org.apache.parquet.schema.MessageType = {
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .minBy(_.getName)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getPath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getFooter.getFileMetaData.getSchema
    finally reader.close()
  }

  // getType(String) is overload-ambiguous from Scala (MessageType varargs vs
  // GroupType single-arg) — go through the field index instead
  private def field(g: org.apache.parquet.schema.GroupType, name: String) =
    g.getFields.get(g.getFieldIndex(name))

  test("foreign-format fixtures really carry the legacy physical types") {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    // materialize the io edge fixtures at the smoke SF
    for (q <- Seq("io_parquet_int96", "io_parquet_legacy_decimal",
        "io_parquet_legacy_nested", "io_parquet_rebase_julian"))
      SparkEntry.queries(q)(spark, TestSpark.sfDir).write
        .format("noop").mode("overwrite").save()
    def fix(n: String) = graft.queries.IoQueries.fixturePath(n, TestSpark.sfDir)

    // INT96 physical timestamps — not the modern INT64 micros
    val int96 = footerSchema(fix("parquet_int96"))
    assert(field(int96, "o_orderdate").asPrimitiveType()
      .getPrimitiveTypeName == INT96)

    // legacy decimals — FIXED_LEN_BYTE_ARRAY even at precision 9 (the
    // modern writer would emit INT32 there)
    val dec = footerSchema(fix("parquet_legacy_decimal"))
    assert(field(dec, "price_d9").asPrimitiveType()
      .getPrimitiveTypeName == FIXED_LEN_BYTE_ARRAY)
    assert(field(dec, "price_d20").asPrimitiveType()
      .getPrimitiveTypeName == FIXED_LEN_BYTE_ARRAY)

    // legacy 2-level list: the struct elements sit directly in a repeated
    // group named "array" (modern 3-level wraps an "element" inside "list")
    val nested = footerSchema(fix("parquet_legacy_nested"))
    val lines = field(nested, "lines").asGroupType()
    assert(lines.getFieldName(0) == "array",
      s"expected legacy 2-level array group, got ${nested}")
    assert(field(lines, "array").isRepetition(
      org.apache.parquet.schema.Type.Repetition.REPEATED))

    // Julian rebase: the LEGACY write mode stamps the file-level marker the
    // reader keys its rebase decision on
    val rebaseMeta = footerMeta(fix("parquet_rebase_julian"))
    assert(rebaseMeta.containsKey("org.apache.spark.legacyDateTime"),
      s"expected legacy-datetime rebase marker, got keys ${rebaseMeta.keySet()}")
  }

  test("unsigned fixture carries UINT annotations and widens on read") {
    import org.apache.spark.sql.types._
    SparkEntry.queries("io_parquet_unsigned")(spark, TestSpark.sfDir)
      .write.format("noop").mode("overwrite").save()
    val fix = graft.queries.IoQueries.fixturePath("parquet_unsigned", TestSpark.sfDir)
    // footer: the logical annotations really are unsigned (no Spark writer
    // produces these)
    val sch = footerSchema(fix)
    def intAnn(name: String) =
      field(sch, name).getLogicalTypeAnnotation
        .asInstanceOf[org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation]
    for ((n, w) <- Seq("u8" -> 8, "u16" -> 16, "u32" -> 32, "u64" -> 64)) {
      assert(!intAnn(n).isSigned, s"$n should be unsigned")
      assert(intAnn(n).getBitWidth == w)
    }
    // read-side widening (SURVEY §1.2): each type one step wider than its
    // bit width so the full unsigned range fits
    val st = spark.read.parquet(fix).schema
    assert(st("u8").dataType == ShortType)
    assert(st("u16").dataType == IntegerType)
    assert(st("u32").dataType == LongType)
    assert(st("u64").dataType == DecimalType(20, 0))
    // sign-edge values surface as positive unsigned, not negative signed
    val mm = spark.read.parquet(fix)
      .selectExpr("min(u32)", "max(u32)", "min(u64)").collect()(0)
    assert(mm.getLong(0) >= 0L && mm.getLong(1) > Int.MaxValue.toLong,
      s"u32 range should cross 2^31: ${mm.getLong(0)}..${mm.getLong(1)}")
    assert(mm.getDecimal(2).signum() >= 0, "u64 must never read negative")
  }

  /** Key-value metadata of the first part file under `dir`. */
  private def footerMeta(dir: String): java.util.Map[String, String] = {
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .minBy(_.getName)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getPath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getFooter.getFileMetaData.getKeyValueMetaData
    finally reader.close()
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
