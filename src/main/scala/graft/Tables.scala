package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables (see TESTDATA.md / FIXTURES.md).
  *
  * All tables are single parquet files per scale-factor directory. At cluster
  * scale these would be partitioned directories; `spark.read.parquet` handles
  * both transparently, and every downstream operator is written so filters and
  * projections push down into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). cuDF supports TIMESTAMP_NS natively
    * (types.hpp:220); our mapping reads the raw int64 nanos and exposes both
    * a µs-truncated `ts` (TimestampType, SURVEY §1.2's documented ns→µs
    * narrowing) and the exact `ts_ns` long. The required session conf
    * `spark.sql.legacy.parquet.nanosAsLong` is set by GraftSession — no conf
    * mutation happens inside this loader.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events table needs spark.sql.legacy.parquet.nanosAsLong=true (use GraftSession.build)")
    apply(s, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
