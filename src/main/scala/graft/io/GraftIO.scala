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
  *
  * Avro (io/avro.py) is covered by [[GraftAvro]]: the external `spark-avro`
  * connector jar is absent from /opt/spark/jars, but the Avro library
  * itself ships as a Spark core dependency, so the source/sink is built
  * directly on it (one task per part file, snappy/deflate codecs, logical
  * types, columns= pruning).
  *
  * Formats NOT covered, and why:
  *  - read_feather / read_hdf (io/feather.py:16, io/hdf.py:14): the
  *    reference itself delegates these to CPU pyarrow/pandas with a
  *    "using CPU" warning — they are convenience passthroughs, not engine
  *    surface; Spark equivalents would likewise need third-party
  *    datasource jars (absent here).
  *  - from_dlpack/to_dlpack (io/dlpack.py): a GPU device-memory tensor
  *    interchange ABI — meaningless for a JVM engine; the columnar
  *    interchange role is played by Arrow/parquet.
  */
object GraftIO {

  /** read_csv options (python/cudf/cudf/io/csv.py:15; option struct
    * cpp/include/cudf/io/csv.hpp:48-652). Direct Spark mappings: header,
    * sep, comment, dtype→schema. Options Spark's reader lacks are layered:
    *  - skiprows/skipfooter — pre-filter raw lines by global line number
    *    (rdd.zipWithIndex preserves file order); skipfooter costs one extra
    *    count pass over the text, same as cuDF's tail scan.
    *  - nrows — `.limit(n)` on parsed data rows.
    *  - naValues (plural) — Spark takes ONE `nullValue`; the rest are
    *    nulled by a post-read projection. Non-string typed columns already
    *    null out unparseable markers under PERMISSIVE partial-results mode;
    *    the projection is what fixes STRING columns, where a marker would
    *    otherwise survive as data.
    *  - thousands / trueValues / falseValues — affected columns (numeric /
    *    boolean per `dtype`, which is required for these) are read as
    *    string, then stripped/mapped and cast in the same projection.
    *  - parseDatesCols — named columns cast via to_timestamp after read.
    */
  final case class CsvOptions(
      header: Boolean = true,            // csv.hpp: header row present
      sep: String = ",",                 // delimiter
      names: Seq[String] = Nil,          // explicit column names (header=False)
      dtype: Option[StructType] = None,  // explicit schema (disables inference)
      usecols: Seq[String] = Nil,        // column projection
      naValues: Seq[String] = Nil,       // null markers (all honored)
      parseDates: Boolean = false,       // infer dates/timestamps
      parseDatesCols: Seq[String] = Nil, // per-column to_timestamp cast
      skiprows: Int = 0,                 // raw lines dropped at file start
      skipfooter: Int = 0,               // raw lines dropped at file end
      nrows: Long = -1L,                 // cap on parsed data rows (-1 = all)
      comment: Option[Char] = None,      // skip lines starting with this char
      thousands: Option[Char] = None,    // digit grouping sep in numerics
      trueValues: Seq[String] = Nil,     // extra boolean-true spellings
      falseValues: Seq[String] = Nil,    // extra boolean-false spellings
      compression: String = "auto",      // Spark infers codec from extension
      multiLine: Boolean = false,        // quoted fields may span lines
                                         // (costs per-file parsing: a
                                         // multiLine file is not splittable
                                         // — reserve for quirky foreign
                                         // drops, never bulk corpora)
      doublequote: Boolean = false)      // RFC-4180 "" escapes inside quoted
                                         // fields (pandas/cudf doublequote;
                                         // Spark's default escape is \, so
                                         // this maps to escape='"')

  def readCsv(spark: SparkSession, path: String, o: CsvOptions = CsvOptions()): DataFrame = {
    require(o.compression == "auto" || o.compression == "infer",
      "Spark's CSV reader infers the codec from the file extension; explicit " +
        "compression override is not supported (name files *.gz / *.bz2)")
    val needsStringStage = o.thousands.nonEmpty || o.trueValues.nonEmpty || o.falseValues.nonEmpty
    require(!needsStringStage || o.dtype.nonEmpty,
      "thousands/trueValues/falseValues require an explicit dtype schema")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{BooleanType, NumericType, StringType}

    // Which dtype fields get the read-as-string-then-cast treatment.
    val stringStaged: Map[String, org.apache.spark.sql.types.DataType] =
      o.dtype.fold(Map.empty[String, org.apache.spark.sql.types.DataType]) { sch =>
        sch.fields.collect {
          case f if o.thousands.nonEmpty && f.dataType.isInstanceOf[NumericType] =>
            f.name -> f.dataType
          case f if (o.trueValues.nonEmpty || o.falseValues.nonEmpty) &&
            f.dataType == BooleanType => f.name -> f.dataType
        }.toMap
      }

    var r: DataFrameReader = spark.read
      .option("header", o.header)
      .option("sep", o.sep)
      .option("mode", "PERMISSIVE")
    if (o.multiLine) r = r.option("multiLine", true)
    if (o.doublequote) r = r.option("escape", "\"")
    if (o.naValues.nonEmpty) r = r.option("nullValue", o.naValues.head)
    o.comment.foreach(c => r = r.option("comment", c.toString))
    r = o.dtype match {
      case Some(schema) =>
        val readSchema = StructType(schema.fields.map(f =>
          if (stringStaged.contains(f.name)) f.copy(dataType = StringType) else f))
        r.schema(readSchema)
      case None => r.option("inferSchema", true)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("dateFormat", "yyyy-MM-dd")
    }
    if (!o.parseDates && o.dtype.isEmpty) r = r.option("preferDate", false)

    // skiprows/skipfooter operate on RAW lines (before the header option is
    // applied to what remains — pandas semantics), via the Dataset[String]
    // overload of the CSV reader.
    val df =
      if (o.skiprows > 0 || o.skipfooter > 0) {
        val lines = spark.read.textFile(path)
        val indexed = lines.rdd.zipWithIndex()
        val hi = if (o.skipfooter > 0) indexed.count() - o.skipfooter else Long.MaxValue
        val lo = o.skiprows.toLong
        val kept = indexed.filter { case (_, i) => i >= lo && i < hi }.map(_._1)
        r.csv(spark.createDataset(kept)(org.apache.spark.sql.Encoders.STRING))
      } else r.csv(path)

    val named = if (o.names.nonEmpty) df.toDF(o.names: _*) else df
    val limited = if (o.nrows >= 0) named.limit(o.nrows.toInt) else named

    // Single post-read projection: extra na markers, thousands strip,
    // boolean spellings, per-column date parse, staged casts.
    val extraNa = o.naValues.drop(1)
    val projected = limited.select(limited.schema.fields.map { f =>
      val base = col(f.name)
      val naCleared =
        if (extraNa.nonEmpty && f.dataType == StringType)
          when(base.isin(o.naValues: _*), lit(null)).otherwise(base)
        else base
      val out = stringStaged.get(f.name) match {
        case Some(BooleanType) =>
          when(naCleared.isNull, lit(null))
            .when(naCleared.isin(o.trueValues ++ Seq("true", "True", "TRUE", "1"): _*), lit(true))
            .when(naCleared.isin(o.falseValues ++ Seq("false", "False", "FALSE", "0"): _*), lit(false))
            .otherwise(lit(null)).cast(BooleanType)
        case Some(num) =>
          regexp_replace(naCleared,
            java.util.regex.Pattern.quote(o.thousands.get.toString), "").cast(num)
        case _ if o.parseDatesCols.contains(f.name) => to_timestamp(naCleared)
        case _ => naCleared
      }
      out.as(f.name)
    }.toSeq: _*)
    if (o.usecols.nonEmpty) projected.select(o.usecols.map(projected.col): _*) else projected
  }

  /** to_csv (cudf/io/csv.py:108). `single` coalesces to one output file the
    * way cuDF's single-path API does — only for small frames; large frames
    * keep their partitioning (one file per task, the distributed default).
    */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               sep: String = ",", naRep: String = "", single: Boolean = false,
               compression: String = "none"): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("header", header).option("sep", sep).option("nullValue", naRep)
      .option("compression", compression)
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
    * directory partitioning; read-back prunes partitions from the paths.
    * Timestamps write as annotated int64 micros (withOutputMicros — the
    * session-scoped pin, never a shared-conf mutation) so readParquet's
    * documented footer-stats row-group pruning works on timestamp
    * columns; INT96 carries no usable min/max. */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
                   compression: String = "snappy"): Unit = {
    val w = GraftParquet.withOutputMicros(df)
      .write.mode("overwrite").option("compression", compression)
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
