package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

import graft.io.ConnectorFace

/** The STAGED table behind `StagingTableCatalog` — what gives a
  * catalog-only session atomic `CREATE OR REPLACE TABLE [AS SELECT]`,
  * `REPLACE TABLE`, and atomic CTAS by name (graft sessions reach the
  * identical manifest commit through the extension rules'
  * `TableDdl.replaceTable` lowering instead).
  *
  * Protocol: Spark stages the table, writes the query through
  * [[newWriteBuilder]] (tasks land tmp parts; the DSv2 write's commit
  * renames them to gen-tagged finals and stashes the names HERE — it
  * publishes nothing), then calls [[commitStagedChanges]], which
  * publishes ONE manifest version:
  *
  *  - table exists → a `replace` mutation removing every current file
  *    and adding the staged parts (schema stamp when none). Prior
  *    versions stay time-travelable; RESTORE undoes the replace. The
  *    conflict contract is the strictest in the tier: the commit runs
  *    with the FULL read set and `requireNoNewFiles` — a replace's
  *    output doesn't depend on the old content, but a concurrent blind
  *    append must not leak its file into the replaced table, so ANY
  *    concurrent commit aborts.
  *  - table absent (CREATE / CREATE OR REPLACE) → the v1 publish the
  *    append sink uses; a racing creator loses at the manifest's
  *    exactly-once v1 commit.
  *
  * [[abortStagedChanges]] deletes the staged parts and their sidecars —
  * un-manifested files were never visible to readers. */
private[graft] class FeatherStagedTable(path: String, identName: String,
                                        tableSchema: StructType,
                                        replaceExisting: Boolean)
    extends StagedTable with SupportsWrite {

  // the staged write's finalized parts (name → bytes + batch stats),
  // pending the ONE manifest publish; the merged-stats fold is deferred
  // to commitStagedChanges so a failed/raced publish strands no cache
  // entries for parts that were never visible
  private[sources] val staged = scala.collection.mutable.LinkedHashMap
    .empty[String, (Long, Seq[Map[String, graft.io.FeatherStats.ColStat]])]

  override def name(): String = identName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FeatherStagedWrite(info.schema(), path, staged)

  override def commitStagedChanges(): Unit = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = FeatherSnapshots.enabled(fs, root)
    if (exists && !replaceExisting)
      throw new IllegalStateException(
        s"CREATE TABLE $identName: a concurrent committer created the " +
          "table while this CTAS was staging — nothing was published; " +
          "re-run (or use CREATE OR REPLACE)")
    def stamp(prefix: String): (String, Long) =
      ConnectorFace.FeatherFace.stamp(fs, root, prefix, tableSchema)
    val parts = staged.toSeq.map { case (n, (len, _)) => (n, len) }
    try {
      if (exists) {
        val snap = FeatherSnapshots.resolve(fs, root, None).get
        val added =
          if (parts.nonEmpty) parts
          else Seq(stamp(FeatherSnapshots.runPrefix(snap.version + 1, "rep-")))
        FeatherSnapshots.commitMutation(fs, root, "replace", snap,
          removeRel = snap.files.map(_._1).toSet, add = added,
          readRel = Some(snap.files.map(_._1).toSet),
          requireNoNewFiles = true): Unit
      } else {
        // v1 creation: the append sink's publish protocol (exactly-once
        // v1 — a racing creator's publish loses the manifest commit)
        fs.mkdirs(root): Unit
        FeatherSnapshots.publishDataCommit(fs, root, truncate = false,
          FeatherSnapshots.FeatherSuffixes, parts,
          stampPart = () => stamp(FeatherSnapshots.runPrefix(1L, "create-"))
        ): Unit
      }
    } catch { case e: Throwable =>
      // a lost replace conflict / CREATE race published nothing — delete
      // the staged parts and sidecars instead of stranding them (in the
      // race case, inside a directory the WINNING creator now owns)
      abortStagedChanges()
      throw e
    }
    // merged-stats fold only after the ONE successful publish (planning
    // cache; per-part sidecars already cover readers)
    graft.io.FeatherStats.upsertMerged(fs, root, staged.toMap)
  }

  override def abortStagedChanges(): Unit = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    FeatherDsvWrites.deleteFinalized(fs, path, staged.keys.toSeq)
  }
}

/** The staged table's DSv2 write: same task-side part writers as the
  * append sink; `commit` only FINALIZES (rename + per-part sidecars)
  * and stashes the parts on the staged table — visibility AND the
  * merged-stats fold belong to commitStagedChanges' single publish. */
private class FeatherStagedWrite(
    st: StructType, path: String,
    staged: scala.collection.mutable.LinkedHashMap[
      String, (Long, Seq[Map[String, graft.io.FeatherStats.ColStat]])])
    extends WriteBuilder with Write with BatchWrite
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  // fail on unmappable schemas BEFORE tasks launch (the append sink's rule)
  st.fields.foreach(f =>
    graft.io.GraftFeather.toArrowField(f.name, f.dataType, f.nullable))

  // a staged replace IS a truncate-and-write; the staged commit already
  // publishes replace semantics, so the mode flag changes nothing
  override def truncate(): WriteBuilder = this
  override def build(): Write = this
  override def toBatch: BatchWrite = this
  override def description(): String = s"graft staged write $path"

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root): Unit
    // retry-idempotence: a re-run batch write (new factory) must not
    // double-publish a previous attempt's finalized names
    staged.synchronized { staged.clear() }
    new FeatherWriterFactory(st, path, "lz4", 4096,
      graft.io.GraftHadoop.confBroadcast(spark))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = messages.collect { case m: FeatherCommitMessage => m }
    val renamed = FeatherDsvWrites.renameParts(fs, path, committed.toSeq)
    staged.synchronized { staged ++= renamed }
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case m: FeatherCommitMessage => m }.foreach { m =>
      try fs.delete(new org.apache.hadoop.fs.Path(path, m.tmpName), false)
      catch { case _: Exception => () }
    }
  }
}
