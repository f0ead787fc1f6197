package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

import graft.io.{ConnectorFace, FeatherMutations, FeatherStats, GraftHadoop}

/** FACE-GENERIC catalog-only batch WRITE — the insert half of the r18
  * interop surface ([[FaceScanBuilder]] is the read half): what lets an
  * extension-free session run `INSERT INTO` / `INSERT OVERWRITE` by name
  * against tables the connector delegates cannot serve — the parquet
  * face (no DSv2 connector) and HIVE-PARTITIONED tables on any face
  * (the flat connector sinks refuse root appends into key=value
  * layouts; this write routes each row to the leaf its partition values
  * name, through the engine's shared
  * [[FeatherMutations.routePartitionedInserts]]).
  *
  * Task rows land as tmp feather parts (the engine's universal task
  * writer) and ONE driver-side conversion pass turns them into final
  * face parts; the manifest commit then publishes:
  *
  *  - append (`INSERT INTO`): add-only — commutes with every concurrent
  *    commit (empty read set); a zero-row insert publishes NO version.
  *  - truncate (`INSERT OVERWRITE` without/with an always-true filter):
  *    one commit removes every current file and adds the new parts
  *    (stamps when none) — prior versions stay time-travelable.
  *  - static partition overwrite (`INSERT OVERWRITE ... PARTITION
  *    (k=v)`): the filters Spark hands down are EqualTo on partition
  *    columns — leaves whose values match are replaced, everything else
  *    carries through verbatim. Any other filter shape refuses loudly
  *    (deleting by a non-partition predicate is the row-level DML
  *    tier's job, not the insert sink's).
  *  - dynamic partition overwrite: only the leaf directories the query's
  *    rows actually land in are replaced (Spark/Hive dynamic semantics).
  *
  * In a graft session none of this runs — the extension rules claim the
  * insert plans at analysis and lower onto the engine's own paths. */
private[graft] class FaceBatchWrite(path: String, face: ConnectorFace,
                                    dataSchema: StructType,
                                    partCols: Seq[String],
                                    writeSchema: StructType)
    extends WriteBuilder with Write with BatchWrite
    with org.apache.spark.sql.connector.write.SupportsOverwrite
    with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
  FaceConvert.requireFeatherMappable(writeSchema)

  /** append | truncate | static (with leaf-equality filters) | dynamic */
  private var mode: String = "append"
  private var staticFilters: Seq[(String, Any)] = Seq.empty

  override def truncate(): WriteBuilder = { mode = "truncate"; this }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    mode = "dynamic"; this
  }

  override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter])
      : WriteBuilder = {
    import org.apache.spark.sql.sources.{AlwaysTrue, EqualNullSafe, EqualTo}
    if (filters.forall(_.isInstanceOf[AlwaysTrue])) return truncate()
    // Spark spells a static PARTITION (k=v) spec as EqualNullSafe
    staticFilters = filters.toSeq.map {
      case EqualTo(a, v) if partCols.contains(a) => (a, v)
      case EqualNullSafe(a, v) if partCols.contains(a) => (a, v)
      case other => throw new UnsupportedOperationException(
        s"INSERT OVERWRITE on $path: overwrite filter $other is not a " +
          "partition-column equality — a predicate-scoped overwrite " +
          "belongs to the row-level DML tier (DELETE + INSERT, or MERGE)" +
          "; the insert sink replaces whole tables or whole partitions")
    }
    mode = "static"
    this
  }

  override def build(): Write = this
  override def toBatch: BatchWrite = this
  override def description(): String =
    s"graft $mode insert $path (${face.label})"

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    val spark = SparkSession.active
    new FeatherWriterFactory(writeSchema, path, "lz4", 4096,
      GraftHadoop.confBroadcast(spark))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = messages.collect { case m: FeatherCommitMessage => m }
    val (data, empty) = committed.partition(m =>
      FeatherStats.fromJson(m.statsJson).nonEmpty)
    empty.foreach { m =>
      try fs.delete(new org.apache.hadoop.fs.Path(path, m.tmpName), false)
      catch { case _: Exception => () }
    }
    val snap = FeatherSnapshots.resolve(fs, root, None).getOrElse(
      throw new IllegalStateException(
        s"insert on $path: no snapshot manifest (catalog tables always " +
          "carry one)"))
    // a zero-row APPEND publishes no version (replay-clean); overwrites
    // still publish — emptying is their meaning
    if (data.isEmpty && mode == "append") return
    val opName = mode match {
      case "append" => "append"
      case _ => "insert_overwrite"
    }
    val targetV = snap.version + 1
    val (parts, flatStats) = FaceConvert.toFaceParts(opName, face, fs,
      path, data.toSeq, dataSchema, partCols, targetV)
    // which existing files does this statement replace?
    val removeRel: Set[String] = mode match {
      case "append" => Set.empty
      case "truncate" => snap.files.map(_._1).toSet
      case "dynamic" =>
        // Spark/Hive dynamic semantics: only the leaf dirs the new rows
        // actually landed in are replaced
        val touched = parts.map { case (rel, _) =>
          val i = rel.lastIndexOf('/')
          if (i < 0) "" else rel.substring(0, i)
        }.toSet
        snap.files.map(_._1).filter { rel =>
          val i = rel.lastIndexOf('/')
          touched(if (i < 0) "" else rel.substring(0, i))
        }.toSet
      case "static" =>
        // leaves whose partition VALUES equal every static filter value
        // (a partition column is constant per leaf, so equality decides
        // whole files exactly)
        val disc = FeatherSnapshots.toDiscovered(root, snap)
        val ps = disc.partSchema
        val matching = disc.files.filter { l =>
          val vals = l.values.toMap
          staticFilters.forall { case (c, v) =>
            vals.get(c).exists { raw =>
              val leafV = FeatherPartitions.castValue(raw, ps(c).dataType)
              if (v == null) leafV == null
              else java.util.Objects.equals(leafV,
                FeatherPartitions.castValue(String.valueOf(v),
                  ps(c).dataType))
            }
          }
        }
        val relOfAbs = snap.files.map { case (rel, _) =>
          new org.apache.hadoop.fs.Path(root, rel).toString -> rel }.toMap
        matching.map(l => relOfAbs(l.file)).toSet
    }
    // nothing written AND nothing replaced (dynamic overwrite of zero
    // rows, static overwrite matching no leaf): publish no version
    if (parts.isEmpty && removeRel.isEmpty) return
    val added = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    added ++= parts
    // an overwrite that emptied the table (or its target leaves) must
    // leave it readable — stamp per replaced leaf, the mutation tier's
    // shared all-rows-gone shape
    if (added.isEmpty && removeRel.nonEmpty &&
        snap.files.forall { case (rel, _) => removeRel(rel) })
      added ++= FeatherMutations.stampLeaves(face, fs, root,
        snap.files.map(_._1), FeatherSnapshots.runPrefix(targetV),
        dataSchema)
    try
      FeatherSnapshots.commitMutation(fs, root, opName, snap,
        removeRel = removeRel, add = added.toSeq,
        readRel = Some(removeRel)): Unit
    catch { case e: Throwable =>
      FeatherDsvWrites.deleteFinalized(fs, path, added.toSeq.map(_._1))
      FaceConvert.unpublishLeafStats(fs, path, added.toSeq.map(_._1))
      throw e
    }
    if (flatStats.nonEmpty) FeatherStats.upsertMerged(fs, root, flatStats)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case m: FeatherCommitMessage => m }.foreach { m =>
      try fs.delete(new org.apache.hadoop.fs.Path(path, m.tmpName), false)
      catch { case _: Exception => () }
    }
  }
}
