package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.sources.FeatherSnapshots

/** The per-format adapter the snapshot MAINTENANCE tier (row-level
  * mutations, OPTIMIZE re-clustering) programs against: the probe, leaf
  * orchestration, and manifest commits are format-agnostic; only schema
  * inference, the merged read, the part writer, and the empty-table
  * stamp differ between the feather and avro faces. Detected from the
  * manifest's part suffixes — a maintenance job never needs to be told
  * what the table is. */
private[graft] sealed trait ConnectorFace extends Serializable {
  def label: String
  /** The face's part suffix (".feather" / ".avro") — what
    * [[FeatherBloom.build]] keys its row reader on. */
  def suffix: String
  def mergedSchema(spark: SparkSession, files: Seq[(String, Long)]): StructType
  def readMerged(spark: SparkSession, files: Seq[(String, Long)]): DataFrame
  /** [[readMerged]] with deletion vectors applied (`dvPaths`: abs file →
    * abs DV sidecar; executor-side load) and/or driver-computed KEEP
    * position sets (`posKeep`: only those rows — the CDF dv-diff read).
    * Every maintenance read of a DV'd table MUST come through here: a
    * plain merged read would resurrect deleted rows into a rewrite. */
  def readMergedDv(spark: SparkSession, files: Seq[(String, Long)],
                   dvPaths: Map[String, String],
                   posKeep: Map[String, Array[Long]] = Map.empty): DataFrame
  def writeParts(df: DataFrame, dir: String, prefix: String,
                 codec: String): Seq[(String, Long, String)]
  def stamp(fs: org.apache.hadoop.fs.FileSystem, dir: Path, prefix: String,
            schema: StructType): (String, Long)
  /** Translate the caller's codec: "lz4" is the feather-centric default
    * parameter value and maps to the face's own default elsewhere. */
  def codecFor(requested: String): String
  /** EXECUTOR-side single-file row iterator over `cols` — the shared
    * plumbing the per-file maintenance passes (bloom build, stats
    * backfill) consume. `readerJson` is the avro merged reader schema
    * (ignored by feather). Opened readers report through
    * `track`/`untrack`; the caller closes whatever is still tracked when
    * done (early-exit safety). */
  def fileRows(execConf: org.apache.hadoop.conf.Configuration,
               readerJson: String, file: String, len: Long,
               cols: Seq[String],
               track: AutoCloseable => Unit,
               untrack: AutoCloseable => Unit): Iterator[org.apache.spark.sql.Row]
  /** [[fileRows]] with each row's DELETION-VECTOR POSITION — the DV
    * writer's probe scan (WHERE do the matched keys live), and dv-aware:
    * positions already deleted by `dv` never re-emit. */
  def fileRowsPos(execConf: org.apache.hadoop.conf.Configuration,
                  readerJson: String, file: String, len: Long,
                  cols: Seq[String], dv: Array[Long],
                  track: AutoCloseable => Unit,
                  untrack: AutoCloseable => Unit)
      : Iterator[(Long, org.apache.spark.sql.Row)]
  /** Driver-side: the avro faces' merged reader schema JSON for
    * [[fileRows]] ("" on feather — the IPC footer is self-describing). */
  def readerJson(spark: SparkSession, files: Seq[(String, Long)]): String
}

private[graft] object ConnectorFace {

  /** Persist `df` for a multi-pass maintenance operation UNLESS the
    * caller already persisted it (re-persisting warns, and the paired
    * unpersist would evict the caller's own cache out from under their
    * next use). Returns (frame, owned): unpersist only when owned. ONE
    * definition for every mutation path — three call sites each grew
    * their own copy of this guard within a round. */
  def pinIfUncached(df: DataFrame): (DataFrame, Boolean) =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      (df, false)
    else (df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), true)

  /** Write fan-out for a mutation's new parts: the source's partition
    * count capped at the cluster parallelism — a shuffle-born tiny
    * frame reports spark.sql.shuffle.partitions partitions, and a
    * per-batch merge sink would otherwise fill the table with
    * near-empty parts (OPTIMIZE owns long-run hygiene either way). */
  def capWriteParts(df: DataFrame): Int =
    math.min(math.max(1, df.rdd.getNumPartitions),
      df.sparkSession.sparkContext.defaultParallelism)

  /** Null-fill `df` to `schema`'s fields and column order — the ONE
    * definition of the align-to-union-schema fold (the mutation tier's
    * survivor projection and the CDF read both need it; a copy per
    * caller would drift). */
  def align(df: DataFrame, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val filled = schema.fields.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    filled.select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Label → face object (the catalog's Table handle carries the label
    * string; the generic scans/writes need the adapter back). */
  def byLabel(label: String): ConnectorFace = label match {
    case "feather" => FeatherFace
    case "parquet" => ParquetFace
    case "avro" => AvroFace
    case other => throw new IllegalArgumentException(
      s"no connector face for format '$other'")
  }

  /** Detect the face from a manifest's relative part paths; loud on a
    * mixed-format manifest (no maintenance semantics exist for it). */
  def detect(files: Seq[(String, Long)], op: String,
             path: String): ConnectorFace =
    if (files.forall { case (rel, _) => rel.endsWith(".avro") }) AvroFace
    else if (files.forall { case (rel, _) => rel.endsWith(".parquet") })
      ParquetFace
    else if (files.forall { case (rel, _) =>
        FeatherSnapshots.FeatherSuffixes.exists(rel.endsWith) })
      FeatherFace
    else throw new IllegalArgumentException(
      s"$op on $path: manifest mixes part formats (" +
        files.map(_._1.reverse.takeWhile(_ != '.').reverse)
          .distinct.mkString(", ") +
        s") — $op needs a single-face table")

  object FeatherFace extends ConnectorFace {
    val label = "feather"
    val suffix = ".feather"
    def mergedSchema(spark: SparkSession, files: Seq[(String, Long)]) =
      StructType(GraftFeather.readFieldsMerged(spark, files).map(f =>
        StructField(f.getName, GraftFeather.toSparkType(f), f.isNullable)))
    def readMerged(spark: SparkSession, files: Seq[(String, Long)]) =
      GraftFeather.readFiles(spark, files, mergeSchema = true)
    def readMergedDv(spark: SparkSession, files: Seq[(String, Long)],
                     dvPaths: Map[String, String],
                     posKeep: Map[String, Array[Long]] = Map.empty) =
      GraftFeather.readFiles(spark, files, mergeSchema = true,
        dvPaths = dvPaths, posKeep = posKeep)
    def writeParts(df: DataFrame, dir: String, prefix: String, codec: String) =
      GraftFeather.writeParts(df, dir, prefix, codecFor(codec))
    def stamp(fs: org.apache.hadoop.fs.FileSystem, dir: Path, prefix: String,
              schema: StructType) =
      GraftFeather.stampSchemaOnly(fs, dir, s"$prefix-empty.feather",
        schema.fields.toSeq.map(f =>
          GraftFeather.toArrowField(f.name, f.dataType, f.nullable)))
    def codecFor(requested: String): String = requested
    def fileRows(execConf: org.apache.hadoop.conf.Configuration,
                 readerJson: String, file: String, len: Long,
                 cols: Seq[String],
                 track: AutoCloseable => Unit,
                 untrack: AutoCloseable => Unit) =
      GraftFeather.allRows(execConf, file, len, cols, r => track(r),
        lenient = true)
    def fileRowsPos(execConf: org.apache.hadoop.conf.Configuration,
                    readerJson: String, file: String, len: Long,
                    cols: Seq[String], dv: Array[Long],
                    track: AutoCloseable => Unit,
                    untrack: AutoCloseable => Unit) =
      GraftFeather.allRowsPos(execConf, file, len, cols, r => track(r),
        lenient = true, dv = dv)
    def readerJson(spark: SparkSession, files: Seq[(String, Long)]): String = ""
  }

  /** The parquet face rides Spark's NATIVE parquet machinery end to end
    * (see [[GraftParquet]]): the merged read is the vectorized scan with
    * pushdown/pruning intact, parts are written by Spark's own sink and
    * renamed under the commit protocol, stats sidecars derive from the
    * footers, and DV positions are the file-wide row ordinal
    * (`_metadata.row_index`). */
  object ParquetFace extends ConnectorFace {
    val label = "parquet"
    val suffix = ".parquet"
    def mergedSchema(spark: SparkSession, files: Seq[(String, Long)]) =
      GraftParquet.mergedSchema(spark, files)
    def readMerged(spark: SparkSession, files: Seq[(String, Long)]) =
      GraftParquet.readFiles(spark, files)
    def readMergedDv(spark: SparkSession, files: Seq[(String, Long)],
                     dvPaths: Map[String, String],
                     posKeep: Map[String, Array[Long]] = Map.empty) =
      GraftParquet.readFiles(spark, files, dvPaths, posKeep)
    def writeParts(df: DataFrame, dir: String, prefix: String, codec: String) =
      GraftParquet.writeParts(df, dir, prefix, codecFor(codec))
    def stamp(fs: org.apache.hadoop.fs.FileSystem, dir: Path, prefix: String,
              schema: StructType) =
      GraftParquet.stampSchemaOnly(fs, dir, s"$prefix-empty.parquet", schema)
    def codecFor(requested: String): String =
      if (requested == "lz4") "snappy" else requested
    def fileRows(execConf: org.apache.hadoop.conf.Configuration,
                 readerJson: String, file: String, len: Long,
                 cols: Seq[String],
                 track: AutoCloseable => Unit,
                 untrack: AutoCloseable => Unit) =
      GraftParquet.allRows(execConf, file, cols, track, untrack)
    def fileRowsPos(execConf: org.apache.hadoop.conf.Configuration,
                    readerJson: String, file: String, len: Long,
                    cols: Seq[String], dv: Array[Long],
                    track: AutoCloseable => Unit,
                    untrack: AutoCloseable => Unit) =
      GraftParquet.allRowsPos(execConf, file, cols, dv, track, untrack)
    def readerJson(spark: SparkSession, files: Seq[(String, Long)]): String = ""
  }

  object AvroFace extends ConnectorFace {
    val label = "avro"
    val suffix = ".avro"
    def mergedSchema(spark: SparkSession, files: Seq[(String, Long)]) =
      GraftAvro.toSparkType(GraftAvro.mergedSchema(spark, files))
        .asInstanceOf[StructType]
    def readMerged(spark: SparkSession, files: Seq[(String, Long)]) =
      GraftAvro.readFilesDF(spark, files, mergeSchema = true)
    def readMergedDv(spark: SparkSession, files: Seq[(String, Long)],
                     dvPaths: Map[String, String],
                     posKeep: Map[String, Array[Long]] = Map.empty) =
      GraftAvro.readFilesDF(spark, files, mergeSchema = true,
        dvPaths = dvPaths, posKeep = posKeep)
    def writeParts(df: DataFrame, dir: String, prefix: String, codec: String) =
      GraftAvro.writeParts(df, dir, prefix, codecFor(codec))
    def stamp(fs: org.apache.hadoop.fs.FileSystem, dir: Path, prefix: String,
              schema: StructType) =
      GraftAvro.stampSchemaOnly(fs, dir, s"$prefix-empty.avro", schema)
    def codecFor(requested: String): String =
      if (requested == "lz4") "snappy" else requested
    def fileRows(execConf: org.apache.hadoop.conf.Configuration,
                 readerJson: String, file: String, len: Long,
                 cols: Seq[String],
                 track: AutoCloseable => Unit,
                 untrack: AutoCloseable => Unit) =
      GraftAvro.splitRows(execConf, readerJson, file, 0L, len,
        Some(cols), r => track(r), r => untrack(r))
    def fileRowsPos(execConf: org.apache.hadoop.conf.Configuration,
                    readerJson: String, file: String, len: Long,
                    cols: Seq[String], dv: Array[Long],
                    track: AutoCloseable => Unit,
                    untrack: AutoCloseable => Unit) =
      GraftAvro.splitRowsPos(execConf, readerJson, file, 0L, len,
        Some(cols), r => track(r), r => untrack(r), dv = dv)
    def readerJson(spark: SparkSession, files: Seq[(String, Long)]): String =
      GraftAvro.mergedSchema(spark, files).toString
  }
}
