package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.OrcFile
import org.scalatest.funsuite.AnyFunSuite

/** Pins that the foreign ORC fixtures (io_orc_foreign_*) really carry the
  * foreign structures the queries claim to decode — multiple stripes,
  * RLEv2 (DIRECT_V2) column encodings, a non-UTC stripe writer timezone —
  * so the green oracle rows are provably exercising those reader branches,
  * not a single-stripe happy path. Mirrors IoSpec's parquet footer
  * assertions; reference fixtures:
  * python/cudf/cudf/tests/data/orc/TestOrcFile.{decimal,gmt,RLEv2}.orc. */
class OrcForeignSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def fix(n: String) = graft.queries.IoQueries.fixturePath(n, TestSpark.sfDir)

  private def materialize(): Unit =
    for (q <- Seq("io_orc_foreign_decimal", "io_orc_foreign_rlev2",
        "io_orc_foreign_timezone", "io_orc_foreign_bool"))
      SparkEntry.queries(q)(spark, TestSpark.sfDir).write
        .format("noop").mode("overwrite").save()

  private def orcReader(dir: String) = {
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).minBy(_.getName)
    OrcFile.createReader(new Path(part.getPath),
      OrcFile.readerOptions(new Configuration()))
  }

  test("decimal fixture: ORC DECIMAL columns across >1 stripe") {
    materialize()
    val r = orcReader(fix("orc_foreign_decimal"))
    try {
      val schema = r.getSchema.toString
      assert(schema.contains("decimal(9,2)") && schema.contains("decimal(20,4)"),
        s"expected ORC-level decimals, got $schema")
      assert(r.getStripes.size() >= 2,
        s"expected a multi-stripe file, got ${r.getStripes.size()} stripe(s)")
      assert(r.getNumberOfRows > 1000)
    } finally r.close()
  }

  test("rlev2 fixture: every integer column uses DIRECT_V2 encoding") {
    materialize()
    val r = orcReader(fix("orc_foreign_rlev2"))
    try {
      val rr = r.rows().asInstanceOf[org.apache.orc.impl.RecordReaderImpl]
      try {
        val sf = rr.readStripeFooter(r.getStripes.get(0))
        val kinds = sf.getColumnsList.asScala.map(_.getKind).toSeq
        // col 0 is the struct root; 1..4 are the bigint columns
        assert(kinds.drop(1).forall(
          _ == org.apache.orc.OrcProto.ColumnEncoding.Kind.DIRECT_V2),
          s"expected RLEv2 (DIRECT_V2) everywhere, got $kinds")
      } finally rr.close()
    } finally r.close()
  }

  test("bool fixture: null-bearing booleans across >1 stripe") {
    materialize()
    val r = orcReader(fix("orc_foreign_bool"))
    try {
      assert(r.getSchema.toString.contains("boolean"))
      assert(r.getStripes.size() >= 2,
        s"need the present stream to cross a stripe boundary, got ${r.getStripes.size()}")
      // the nullable column really carries nulls (footer stats see fewer
      // values than rows)
      val stats = r.getStatistics
      assert(stats(3).getNumberOfValues < r.getNumberOfRows,
        s"bn should have nulls: ${stats(3).getNumberOfValues} of ${r.getNumberOfRows}")
    } finally r.close()
  }

  test("timezone fixture: stripe footer records the foreign writer zone") {
    materialize()
    val r = orcReader(fix("orc_foreign_timezone"))
    try {
      val rr = r.rows().asInstanceOf[org.apache.orc.impl.RecordReaderImpl]
      try {
        val sf = rr.readStripeFooter(r.getStripes.get(0))
        assert(sf.getWriterTimezone == "America/Los_Angeles",
          s"expected a foreign stripe timezone, got '${sf.getWriterTimezone}'")
      } finally rr.close()
      // wall-clock semantics: raw read shifts by the LA offset; the
      // to_utc_timestamp consumer pattern (what the registered query
      // does) recovers every original instant across PST and PDT rows
      import org.apache.spark.sql.functions.{col, expr, to_utc_timestamp}
      val recovered = spark.read.orc(fix("orc_foreign_timezone"))
        .select(col("o_orderkey"),
          to_utc_timestamp(col("ts"), "America/Los_Angeles").as("ts"))
      val expected = Tables.orders(spark, TestSpark.sfDir)
        .filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          expr("timestampadd(SECOND, CAST(o_orderkey % 21600 AS INT), CAST(o_orderdate AS TIMESTAMP))").as("ts"))
      assert(recovered.exceptAll(expected).count() == 0 &&
        expected.exceptAll(recovered).count() == 0)
    } finally r.close()
  }
}
