package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{ConnectorFace, DeletionVectors, FeatherMutations, FeatherStats, GraftFeather, GraftHadoop}

/** DELTA-based (merge-on-read) DSv2 row-level operations for feather
  * snapshot tables — the `graft_dv` catalog's DML strategy in a session
  * with ONLY the catalog conf. Where the group-based sibling
  * ([[FeatherRowLevelOperation]]) REWRITES whole files, this one routes
  * DELETE / UPDATE / MERGE through Spark's delta rewrite
  * (`SupportsDelta`): every deleted or pre-update row arrives as a
  * `delete(_, rowId)` callback carrying the engine's stable row id
  * `(_file, _pos)`, and the commit persists those positions as deletion-
  * vector sidecars ([[graft.io.DeletionVectors]]) bound in the manifest —
  * bytes written scale with DELETED ROWS, not touched files, the same
  * merge-on-read parity the graft-session `graft_dv` spelling has.
  * Inserted rows (MERGE NOT MATCHED, the insert half of an UPDATE) land
  * as ordinary new parts in the SAME atomic manifest commit.
  *
  * Contracts that differ from the COW sibling:
  *
  *  - the scan may skip row batches INSIDE kept files (stats-proven
  *    empty): a delta write touches only the rows it is handed, untouched
  *    rows stay in place, and `_pos` coordinates are batch-absolute — the
  *    group contract's "whole files only" rule does not bind here.
  *  - updates split into DELETE + INSERT
  *    (`representUpdateAsDeleteAndInsert`): an in-place update of an
  *    immutable part file does not exist; the deleted half masks, the
  *    inserted half appends.
  *  - a file whose UNION'd vector covers every row (stats-proven) is
  *    dropped from the manifest instead of carrying a full mask — shared
  *    with the engine path through [[FeatherMutations.bindDvs]].
  *
  * Concurrency: same read-set OCC as the COW path — readRel = the files
  * the scan kept; every DV (re)binding and drop is inside that set, so a
  * concurrent rewrite of a READ file aborts loudly and disjoint
  * mutations commute. */
private[graft] class FeatherDeltaOperation(cmd: Command, path: String,
                                           fullSchema: StructType,
                                           maxSplitBytes: Long)
    extends RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta
    with FeatherRowLevelHost {

  override def command(): Command = cmd
  override def description(): String =
    s"graft delta (merge-on-read) $cmd on $path"

  /** The engine's stable row id: which file, which batch-absolute
    * position. Both are metadata columns the feather scans serve. */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(GraftMetaColumns.FileName),
      Expressions.column(GraftMetaColumns.PosName))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FeatherCowScanBuilder(this, path, fullSchema, maxSplitBytes,
      batchSkip = true)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new FeatherDeltaWrite(this, info, path, fullSchema)
}

/** One task's delta output: at most one insert part (tmp name + stats)
  * plus its deleted positions grouped by ABSOLUTE data-file path. */
private case class FeatherDeltaCommitMessage(
    insert: Option[FeatherCommitMessage],
    deletes: Map[String, Array[Long]]) extends WriterCommitMessage

private class FeatherDeltaWrite(op: FeatherDeltaOperation,
                                info: LogicalWriteInfo, path: String,
                                tableSchema: StructType)
    extends DeltaWriteBuilder with DeltaWrite with DeltaBatchWrite {

  // row schema: present for UPDATE/MERGE (the insert half), ABSENT for
  // DELETE (Spark projects only the row id); fail unmappable schemas
  // before tasks launch (the append sink's rule)
  private val rowSchema: StructType = info.schema()
  private val rowIdSchema: StructType = info.rowIdSchema().orElseThrow(() =>
    new IllegalStateException(
      s"delta ${op.command()} on $path: Spark supplied no rowId schema"))
  rowSchema.fields.foreach(f =>
    GraftFeather.toArrowField(f.name, f.dataType, f.nullable))

  override def build(): DeltaWrite = this
  override def toBatch(): DeltaBatchWrite = this
  override def description(): String = s"graft delta ${op.command()} $path"

  override def createBatchWriterFactory(pinfo: PhysicalWriteInfo)
      : DeltaWriterFactory = {
    val spark = SparkSession.active
    new FeatherDeltaWriterFactory(rowSchema, rowIdSchema, path,
      GraftHadoop.confBroadcast(spark))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val state = op.scanState.getOrElse(throw new IllegalStateException(
      s"delta ${op.command()} on $path: write committed before the scan " +
        "planned — the touched-file set is unknown"))
    val msgs = messages.collect { case m: FeatherDeltaCommitMessage => m }
    // inserted rows → ordinary finalized parts (zero-row tasks drop)
    val mergedAdd =
      FeatherDsvWrites.renameParts(fs, path, msgs.flatMap(_.insert).toSeq)
    // deleted rows → positions per file, folded across tasks
    val relOfAbs: Map[String, String] = state.snap.files.map {
      case (rel, _) =>
        new org.apache.hadoop.fs.Path(root, rel).toString -> rel }.toMap
    val relIdx: Map[String, Int] =
      state.snap.files.map(_._1).zipWithIndex.toMap
    val byFid = scala.collection.mutable.HashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    msgs.foreach(_.deletes.foreach { case (abs, poss) =>
      val rel = relOfAbs.getOrElse(abs, throw new IllegalStateException(
        s"delta ${op.command()} on $path: writer reported deletions in " +
          s"'$abs', which is not in the scanned snapshot"))
      byFid.getOrElseUpdate(relIdx(rel),
        scala.collection.mutable.ArrayBuffer.empty[Long]) ++= poss
    })
    // nothing deleted, nothing inserted: a no-match statement publishes
    // NO version (replay-clean, the COW sibling's contract)
    if (byFid.isEmpty && mergedAdd.isEmpty) return
    // exact row counts (stats sidecars) let fully-masked files DROP from
    // the manifest instead of carrying a 100%-coverage vector — loads
    // are bounded by the TOUCHED file set, not the table
    val touched = byFid.keys.map(state.snap.files(_)).toSeq
      .map { case (rel, len) =>
        (new org.apache.hadoop.fs.Path(root, rel).toString, len) }
    val statsByFile = FeatherStats.loadForFiles(conf, touched)
    def fileRowCount(fid: Int): Option[Long] = {
      val abs = new org.apache.hadoop.fs.Path(root,
        state.snap.files(fid)._1).toString
      statsByFile.getOrElse(abs, None).flatMap(FeatherMutations.exactRows)
    }
    val targetV = state.snap.version + 1
    val (bindings, droppedRel) = FeatherMutations.bindDvs(fs, conf, root,
      state.snap, targetV,
      byFid.view.mapValues(_.toArray).toMap, fileRowCount)
    val added = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    added ++= mergedAdd.map { case (n, (len, _)) => (n, len) }
    // every file dropped and nothing inserted: schema stamp keeps the
    // table readable (the mutation tier's shared all-rows-deleted shape)
    if (added.isEmpty && droppedRel.nonEmpty &&
        state.snap.files.forall { case (rel, _) => droppedRel(rel) })
      added += ConnectorFace.FeatherFace.stamp(fs, root,
        FeatherSnapshots.runPrefix(targetV), tableSchema)
    try
      FeatherSnapshots.commitMutation(fs, root,
        s"rowlevel_delta_${op.command().toString.toLowerCase}", state.snap,
        removeRel = droppedRel, add = added.toSeq, setDvs = bindings,
        readRel = Some(state.keptRel)): Unit
    catch { case e: Throwable =>
      // the publish failed (conflict): parts, stamp, AND the freshly
      // written DV sidecars were never visible — delete them all
      FeatherDsvWrites.deleteFinalized(fs, path, added.toSeq.map(_._1))
      bindings.values.foreach { case (dvRel, _) =>
        try fs.delete(new org.apache.hadoop.fs.Path(root, dvRel), false)
        catch { case _: Exception => () }
        ()
      }
      throw e
    }
    FeatherStats.upsertMerged(fs, root, mergedAdd)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case m: FeatherDeltaCommitMessage => m }
      .flatMap(_.insert).foreach { m =>
        try fs.delete(new org.apache.hadoop.fs.Path(path, m.tmpName), false)
        catch { case _: Exception => () }
      }
  }
}

private class FeatherDeltaWriterFactory(
    rowSchema: StructType, rowIdSchema: StructType, path: String,
    confMap: org.apache.spark.broadcast.Broadcast[Map[String, String]])
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DeltaWriter[InternalRow] = new DeltaWriter[InternalRow] {
    private val fileIdx = rowIdSchema.fieldIndex(GraftMetaColumns.FileName)
    private val posIdx = rowIdSchema.fieldIndex(GraftMetaColumns.PosName)
    // deleted positions per absolute file path — memory ∝ rows THIS task
    // deletes (the same driver-side bound the engine's DV delete has,
    // sharded across tasks here)
    private val deletes = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
    // the insert part writer opens lazily: a pure DELETE never creates
    // a tmp file at all
    private var insertPw
        : org.apache.spark.sql.connector.write.DataWriter[InternalRow] = null
    private def insertWriter = {
      if (insertPw == null)
        insertPw = FeatherSourceWriters.dataWriter(rowSchema, path,
          f".part-$partitionId%05d-task-$taskId.feather.tmp",
          "lz4", 4096, partitionId, confMap)
      insertPw
    }

    override def delete(meta: InternalRow, id: InternalRow): Unit = {
      // the id row is a reused projection — copy the file path out
      val f = id.getUTF8String(fileIdx).toString
      deletes.getOrElseUpdate(f,
        scala.collection.mutable.ArrayBuffer.empty[Long]) += id.getLong(posIdx)
      ()
    }

    override def insert(row: InternalRow): Unit = insertWriter.write(row)

    // unreachable with representUpdateAsDeleteAndInsert = true; kept
    // total so a Spark behavior change degrades to the same semantics
    override def update(meta: InternalRow, id: InternalRow,
                        row: InternalRow): Unit = {
      delete(meta, id); insert(row)
    }

    override def commit(): WriterCommitMessage =
      FeatherDeltaCommitMessage(
        Option(insertPw).map(_.commit().asInstanceOf[FeatherCommitMessage]),
        deletes.view.mapValues(_.toArray).toMap)

    override def abort(): Unit = if (insertPw != null) insertPw.abort()
    override def close(): Unit = ()
  }
}
