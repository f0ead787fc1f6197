package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.FeatherSnapshots

/** Batch CHANGE-DATA-FEED read over a snapshotted table's version
  * history (the Delta CDF / `table_changes` shape): the row-level
  * changes versions `(fromVersion, toVersion]` introduced, as one
  * DataFrame of the table's columns plus `_change_type`
  * ("insert" | "delete"; an update is its delete+insert pair, the
  * relational normal form) and `_commit_version`.
  *
  * Downstream incremental ETL wants exactly this: "give me what changed
  * since the version I last processed" as a batch frame — the version
  * STREAM (FeatherSnapshotStream) delivers appends continuously but
  * skips/refuses mutation commits; the CDF read answers them exactly.
  *
  * Semantics per version step, derived from the manifest diff alone:
  *  - `compact` / `cluster` are row-preserving rewrites: no changes.
  *  - every other op diffs at ROW level over the TOUCHED files only:
  *    removed = rows of files the commit retired, added = rows of files
  *    it introduced; `deletes = removed EXCEPT ALL added`,
  *    `inserts = added EXCEPT ALL removed`. Rows carried unchanged
  *    through a rewrite cancel, so an append yields pure inserts, a
  *    delete yields exactly the dropped rows, a merge yields the old
  *    image of matched keys as deletes plus the new/inserted rows as
  *    inserts, and an overwrite yields the honest full replace (rows
  *    identical across it cancel — rewriting the same data is not a
  *    change).
  *
  * Scale: the diff touches O(changed bytes) per version, never the full
  * table (except an overwrite, whose change set IS the table), and the
  * exceptAll is a hash shuffle of exactly those rows. A pipeline that
  * can shape its writes should still prefer [[FeatherMutations.applyCdc]]
  * input frames as the change source (they ARE the change set, no diff
  * needed); the CDF read is for consumers who only see the table.
  *
  * Face-agnostic via [[ConnectorFace]] (feather and avro tables both
  * serve changes). Evolved generations union by name with nulls filling
  * predating files. Versions must still be retained — expire() makes
  * history unreadable, loudly. */
object FeatherChanges {

  def readChanges(spark: SparkSession, path: String,
                  fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion >= 1 && toVersion >= fromVersion,
      s"readChanges: bad version range ($fromVersion, $toVersion]")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(FeatherSnapshots.enabled(fs, root),
      s"readChanges on $path, which has no ${FeatherSnapshots.Dir} " +
        "directory — change feeds are derived from the version history")
    val snaps = FeatherSnapshots.readRange(fs, root, fromVersion, toVersion)
    val face = ConnectorFace.detect(snaps.last.files, "readChanges", path)
    // the output schema is the UNION over every involved version's files
    // (an evolved column must appear, null-filled, even for changes that
    // predate it)
    val allFiles = snaps.flatMap(_.files).distinct.map { case (rel, len) =>
      (new Path(root, rel).toString, len) }
    val outSchema = face.mergedSchema(spark, allFiles)
    def readSet(files: Seq[(String, Long)]): DataFrame = {
      val df = face.readMerged(spark, files.map { case (rel, len) =>
        (new Path(root, rel).toString, len) })
      outSchema.fields.foldLeft(df) { (d, f) =>
        if (d.columns.contains(f.name)) d
        else d.withColumn(f.name, lit(null).cast(f.dataType))
      }.select(outSchema.fieldNames.map(col).toSeq: _*)
    }
    def tagged(df: DataFrame, change: String, v: Long): DataFrame =
      df.withColumn("_change_type", lit(change))
        .withColumn("_commit_version", lit(v))
    val empty = tagged(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      outSchema), "insert", 0L).limit(0)
    if (snaps.size < 2) return empty
    snaps.sliding(2).foldLeft(empty) { (acc, pair) =>
      val (prev, cur) = (pair.head, pair(1))
      cur.op match {
        case "compact" | "cluster" => acc // row-preserving rewrites
        case _ =>
          val prevSet = prev.files.toSet
          val curSet = cur.files.toSet
          val removed = prev.files.filterNot(curSet)
          val added = cur.files.filterNot(prevSet)
          val changes =
            if (removed.isEmpty && added.isEmpty) None
            else if (removed.isEmpty)
              Some(tagged(readSet(added), "insert", cur.version))
            else if (added.isEmpty)
              Some(tagged(readSet(removed), "delete", cur.version))
            else {
              val r = readSet(removed)
              val a = readSet(added)
              Some(tagged(r.exceptAll(a), "delete", cur.version)
                .unionByName(tagged(a.exceptAll(r), "insert", cur.version)))
            }
          changes.map(acc.unionByName(_)).getOrElse(acc)
      }
    }
  }
}
