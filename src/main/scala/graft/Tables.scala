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

  /** Footer-schema cache, keyed by absolute file path. `spark.read.parquet`
    * with no explicit schema runs a schema-inference JOB (a footer read) on
    * EVERY DataFrame construction — measured ~25-30 ms per table per query,
    * 3-5 such jobs ahead of every benched query (see OPTIMIZATION_r19.md).
    * The fixtures are immutable files; caching their STRUCTTYPE is the same
    * metadata caching a catalog table gets from the session catalog, and
    * nothing of the DATA is cached — every query still scans the parquet.
    * Keyed per path (not per name) so distinct sf dirs never collide. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.parquet has carried `ts` under two physical encodings across
    * fixture generations: TIMESTAMP(NANOS) — which Spark's parquet reader
    * only surfaces as a raw int64 via `spark.sql.legacy.parquet.nanosAsLong`
    * ([PARQUET_TYPE_ILLEGAL] otherwise) — and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark reads natively as TIMESTAMP_NTZ.
    * cuDF treats every timestamp resolution as first-class
    * (cpp/include/cudf/types.hpp:216-220); this loader branches on the READ
    * schema rather than assuming one encoding, and normalizes both to the
    * same logical shape: `ts` = TimestampType (µs, SURVEY §1.2's documented
    * ns→µs narrowing) and `ts_ns` = exact epoch-nanos long (µs fixtures
    * carry no sub-µs information, so ts_ns = µs·1000 there). The NTZ→TZ cast
    * is value-preserving because GraftSession pins the session timezone to
    * UTC; `unix_micros` itself only accepts TimestampType, hence cast-first.
    * The `nanosAsLong` conf requirement applies only to the nanos fixture
    * branch; GraftSession still sets it so either fixture loads.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) fixture read as raw int64 nanos
        require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "nanos events fixture needs spark.sql.legacy.parquet.nanosAsLong=true (use GraftSession.build)")
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampType => // µs fixture, already TZ-adjusted
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType => // µs NTZ fixture: wall clock == UTC instant
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        sys.error(s"events.ts: unsupported physical type $other (expected int64 nanos or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
