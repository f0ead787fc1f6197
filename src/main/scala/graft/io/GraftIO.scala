package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** IO surface: cuDF's reader/writer option sets re-expressed on Spark's
  * DataSource V2 readers/writers (SURVEY §2.1; reference cpp/src/io —
  * 43,625 LoC, the reference's largest module — is supplied "for free" by
  * Spark's readers; this layer is the OPTION MAPPING, which is where the
  * user-facing semantics live).
  *
  * Scale notes: every reader here is a plain `spark.read` — file listing,
  * split generation (cuDF's `byte_range` is Spark's own input splits),
  * predicate pushdown and column pruning all arrive via the data source
  * framework. Writers partition by columns via dynamic partition insert —
  * the write parallelism is the upstream partitioning, no driver funnels.
  */
object GraftIO {

  /** read_csv options (python/cudf/cudf/io/csv.py:15; option struct
    * cpp/include/cudf/io/csv.hpp:48-652). Unlisted cuDF options map 1:1 to
    * Spark reader options (quoting → quote/escape, comment → comment,
    * true/false_values → no direct option: pre-map via dtype string+expr).
    */
  final case class CsvOptions(
      header: Boolean = true,           // csv.hpp:  header row present
      sep: String = ",",                // delimiter
      names: Seq[String] = Nil,         // explicit column names (header=False)
      dtype: Option[StructType] = None, // explicit schema (disables inference)
      usecols: Seq[String] = Nil,       // column projection
      naValues: Seq[String] = Nil,      // extra null markers
      parseDates: Boolean = false,      // infer dates/timestamps
      compression: String = "auto")     // gzip/bz2/deflate auto-detected by extension

  def readCsv(spark: SparkSession, path: String, o: CsvOptions = CsvOptions()): DataFrame = {
    var r: DataFrameReader = spark.read
      .option("header", o.header)
      .option("sep", o.sep)
      .option("mode", "PERMISSIVE")
    if (o.naValues.nonEmpty) r = r.option("nullValue", o.naValues.head)
    // cuDF skiprows/byte_range intentionally absent: Spark's file-split model
    // owns intra-file positioning; header skipping is the `header` option.
    r = o.dtype match {
      case Some(schema) => r.schema(schema)
      case None => r.option("inferSchema", true)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("dateFormat", "yyyy-MM-dd")
    }
    if (!o.parseDates && o.dtype.isEmpty) r = r.option("preferDate", false)
    val df = r.csv(path)
    val named = if (o.names.nonEmpty) df.toDF(o.names: _*) else df
    if (o.usecols.nonEmpty) named.select(o.usecols.map(named.col): _*) else named
  }

  /** to_csv (cudf/io/csv.py:108). `single` coalesces to one output file the
    * way cuDF's single-path API does — only for small frames; large frames
    * keep their partitioning (one file per task, the distributed default).
    */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               sep: String = ",", naRep: String = "", single: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("header", header).option("sep", sep).option("nullValue", naRep)
      .csv(path)
  }

  /** read_json lines=True (cudf/io/json.py:14 — cuDF's engine reads JSON
    * Lines; Spark's default is also line-delimited). */
  def readJson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  def writeJson(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df).write.mode("overwrite").json(path)

  /** read_orc (cudf/io/orc.py:225). cuDF's stripe/statistics-based skipping
    * maps to Spark's ORC predicate pushdown (spark.sql.orc.filterPushdown,
    * on by default): pass filters as ordinary .filter() and they reach the
    * stripe level. */
  def readOrc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** to_parquet with partition_cols (cudf/io/parquet.py:262): hive-style
    * directory partitioning; read-back prunes partitions from the paths. */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
                   compression: String = "snappy"): Unit = {
    val w = df.write.mode("overwrite").option("compression", compression)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** read_parquet with column projection (cudf/io/parquet.py:164) — row-group
    * pruning via footer stats happens automatically when filters are applied
    * to the returned frame (they push down to the scan). */
  def readParquet(spark: SparkSession, path: String, columns: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(path)
    if (columns.nonEmpty) df.select(columns.map(df.col): _*) else df
  }
}
