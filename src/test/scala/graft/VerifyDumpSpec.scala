package graft

import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two sides of the r13 timestamp regression so the class of
  * miss (Verify dumps drifting tz-aware while the local gate silently
  * normalizes) cannot recur:
  *
  *   1. A result dumped through Verify's exact write path reads back
  *      tz-NAIVE — Spark's INT96 default, no UTC-adjusted annotation —
  *      because the driver's DuckDB compare does NOT strip timezones
  *      and its oracle produces naive timestamps.
  *   2. The parquet TABLE tier's parts still carry annotated int64
  *      micros (the config MOVED into GraftParquet.withOutputMicros;
  *      it must not vanish — footer stats on INT96 are unusable).
  */
class VerifyDumpSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_verifydump_test/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }

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

  test("Verify's result dump of a timestamp-bearing query reads back " +
       "tz-naive (INT96 default; no UTC-adjusted annotation anywhere)") {
    val out = tmp("dt_epoch_dump")
    // the EXACT Verify.main dump shape: queries(name)(spark, sf) →
    // coalesce(1) → write.parquet — through the shared GraftSession, so
    // any future session-wide writer config would trip this first
    SparkEntry.queries("dt_epoch")(spark, TestSpark.sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val schema = footerSchema(out)
    import scala.jdk.CollectionConverters._
    val prims = schema.getFields.asScala.map(_.asPrimitiveType())
    // the dump must actually cover a timestamp output...
    assert(prims.exists(_.getPrimitiveTypeName == PrimitiveTypeName.INT96),
      s"dt_epoch dump carries no INT96 timestamp column: $schema")
    // ...and NOTHING may be annotated UTC-adjusted (what pandas/pyarrow
    // read back as timestamp[us, tz=UTC] vs the oracle's naive type)
    prims.foreach { p =>
      p.getLogicalTypeAnnotation match {
        case ts: TimestampLogicalTypeAnnotation =>
          assert(!ts.isAdjustedToUTC,
            s"Verify dump column ${p.getName} is UTC-adjusted — the " +
              "driver's schema compare fails this vs the naive oracle")
        case _ =>
      }
    }
  }

  test("parquet table parts carry annotated int64 micros " +
       "(flat and partitioned writers)") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456")),
      (2L, "b", java.sql.Timestamp.valueOf("2024-03-02 11:00:00.0")))
      .toDF("id", "grp", "ts")

    def assertMicros(dir: String): Unit = {
      // getType(String) is overload-ambiguous from Scala (varargs twin)
      val s = footerSchema(dir)
      val f = s.getFields.get(s.getFieldIndex("ts")).asPrimitiveType()
      assert(f.getPrimitiveTypeName == PrimitiveTypeName.INT64,
        s"table part ts is ${f.getPrimitiveTypeName}, want INT64 micros")
      f.getLogicalTypeAnnotation match {
        case ts: TimestampLogicalTypeAnnotation =>
          assert(ts.getUnit ==
            org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS)
        case other => fail(s"table part ts annotation is $other")
      }
    }

    val flat = tmp("table_flat")
    graft.io.ParquetTable.write(df, flat)
    assertMicros(flat)

    val parted = tmp("table_parted")
    graft.io.ParquetTable.write(df, parted, partitionBy = Seq("grp"))
    assertMicros(s"$parted/grp=a")

    // and the pin never touches the caller's session at all (it rides a
    // cloned session, so concurrent writers can never observe it either)
    assert(spark.conf.getOption("spark.sql.parquet.outputTimestampType")
      .forall(_ == "INT96"))
  }
}
