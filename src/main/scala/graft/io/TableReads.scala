package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.FeatherSnapshots

/** Face-dispatched snapshot READ — one entry point that serves a graft
  * table at head or at a pinned version/instant regardless of which
  * face (feather / avro / parquet) stores it, detected from the
  * manifest like every maintenance operation. This is what the SQL
  * spellings lower onto:
  *
  * {{{
  *   SELECT * FROM graft.`/t`                          -- head
  *   SELECT * FROM graft.`/t` VERSION AS OF 3          -- pinned version
  *   SELECT * FROM graft.`/t` TIMESTAMP AS OF '2024-06-01 12:00:00'
  * }}}
  *
  * (reference anchor: the table tier generalizes the reference's
  * whole-frame snapshot semantics — eager copies in
  * python/cudf/cudf/core/dataframe.py `copy` — onto retained manifest
  * versions).
  *
  * The resolved snapshot pins the version ONCE, at plan time: the
  * returned frame keeps reading that version's files even if the table
  * commits underneath it (the connectors' own versionAsOf contract).
  * Reads go through each face's native scan — Spark's vectorized
  * parquet reader for the parquet face, the DSv2 connectors for
  * feather/avro — so pushdown, pruning, and DV masking all apply.
  * `mergeSchema` rides along: a TABLE read must see the table's evolved
  * union schema, not the first footer's.
  */
object TableReads {

  /** Read `path` at head, at `versionAsOf`, or at the newest version
    * committed at or before `tsMillis`. */
  def read(spark: SparkSession, path: String,
           versionAsOf: Option[Long] = None,
           tsMillis: Option[Long] = None): DataFrame = {
    require(versionAsOf.isEmpty || tsMillis.isEmpty,
      "specify either versionAsOf or timestampAsOf, not both")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(FeatherSnapshots.enabled(fs, root),
      s"graft.`$path` names a snapshotted table, but the path has no " +
        s"${FeatherSnapshots.Dir} directory — write it with " +
        "option(\"snapshots\", \"true\") / ParquetTable.write first " +
        "(plain directories read with spark.read or SQL's own " +
        "parquet.`path` spelling)")
    val snap = tsMillis match {
      case Some(ms) => FeatherSnapshots.resolveAt(fs, root, ms)
      case None => FeatherSnapshots.resolve(fs, root, versionAsOf)
        .getOrElse(sys.error(
          s"graft.`$path`: snapshot directory exists but holds no versions"))
    }
    val face = ConnectorFace.detect(snap.files, "read", path)
    face.suffix match {
      case ".parquet" =>
        ParquetTable.read(spark, path, versionAsOf = Some(snap.version))
      case ".avro" =>
        spark.read.format("graft-avro")
          .option("versionAsOf", snap.version.toString)
          .option("mergeSchema", "true").load(path)
      case _ =>
        spark.read.format("feather")
          .option("versionAsOf", snap.version.toString)
          .option("mergeSchema", "true").load(path)
    }
  }
}
