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
private[io] sealed trait ConnectorFace {
  def label: String
  /** The face's part suffix (".feather" / ".avro") — what
    * [[FeatherBloom.build]] keys its row reader on. */
  def suffix: String
  def mergedSchema(spark: SparkSession, files: Seq[(String, Long)]): StructType
  def readMerged(spark: SparkSession, files: Seq[(String, Long)]): DataFrame
  def writeParts(df: DataFrame, dir: String, prefix: String,
                 codec: String): Seq[(String, Long, String)]
  def stamp(fs: org.apache.hadoop.fs.FileSystem, dir: Path, prefix: String,
            schema: StructType): (String, Long)
  /** Translate the caller's codec: "lz4" is the feather-centric default
    * parameter value and maps to the face's own default elsewhere. */
  def codecFor(requested: String): String
}

private[io] object ConnectorFace {

  /** Detect the face from a manifest's relative part paths; loud on a
    * mixed-format manifest (no maintenance semantics exist for it). */
  def detect(files: Seq[(String, Long)], op: String,
             path: String): ConnectorFace =
    if (files.forall { case (rel, _) => rel.endsWith(".avro") }) AvroFace
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
    def writeParts(df: DataFrame, dir: String, prefix: String, codec: String) =
      GraftFeather.writeParts(df, dir, prefix, codecFor(codec))
    def stamp(fs: org.apache.hadoop.fs.FileSystem, dir: Path, prefix: String,
              schema: StructType) =
      GraftFeather.stampSchemaOnly(fs, dir, s"$prefix-empty.feather",
        schema.fields.toSeq.map(f =>
          GraftFeather.toArrowField(f.name, f.dataType, f.nullable)))
    def codecFor(requested: String): String = requested
  }

  object AvroFace extends ConnectorFace {
    val label = "avro"
    val suffix = ".avro"
    def mergedSchema(spark: SparkSession, files: Seq[(String, Long)]) =
      GraftAvro.toSparkType(GraftAvro.mergedSchema(spark, files))
        .asInstanceOf[StructType]
    def readMerged(spark: SparkSession, files: Seq[(String, Long)]) =
      GraftAvro.readFilesDF(spark, files, mergeSchema = true)
    def writeParts(df: DataFrame, dir: String, prefix: String, codec: String) =
      GraftAvro.writeParts(df, dir, prefix, codecFor(codec))
    def stamp(fs: org.apache.hadoop.fs.FileSystem, dir: Path, prefix: String,
              schema: StructType) =
      GraftAvro.stampSchemaOnly(fs, dir, s"$prefix-empty.avro", schema)
    def codecFor(requested: String): String =
      if (requested == "lz4") "snappy" else requested
  }
}
