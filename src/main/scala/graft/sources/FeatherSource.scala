package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{GraftFeather, GraftHadoop}

/** DataSource V2 connector for Feather v2 / Arrow IPC files:
  * `spark.read.format("feather").load(path)` (registered via the
  * DataSourceRegister service file, so the short name works like any
  * built-in source).
  *
  * This is the planner-integrated face of [[GraftFeather.read]]: the same
  * footer-indexed record-batch splits become `InputPartition`s, but column
  * pruning now arrives FROM Catalyst (`SupportsPushDownRequiredColumns`) —
  * `df.select(a, b)` prunes decode work with no `columns=` argument, and
  * `.explain` shows `ReadSchema` like a parquet scan. The scan also reports
  * `sizeInBytes` statistics from the file lengths, so the planner's
  * broadcast-join threshold sees a real size for feather inputs instead of
  * defaulting to "huge" (an RDD-assembled DataFrame gives the planner
  * nothing).
  *
  * Read-only by design: writes go through [[GraftFeather.write]], which
  * owns the commit discipline (temp+rename, `_SUCCESS`, ErrorIfExists).
  */
class FeatherDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "feather"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "feather source requires a path: spark.read.format(\"feather\").load(path)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // schema-only: ONE footer read (the first file); the every-file split
    // sweep runs once, at scan time
    val fields = GraftFeather.readFields(SparkSession.active, pathOf(options))
    StructType(fields.map(f => org.apache.spark.sql.types.StructField(
      f.getName, GraftFeather.toSparkType(f), f.isNullable)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties) // keys arrive raw
    new FeatherTable(schema, pathOf(opts),
      Option(opts.get("maxsplitbytes")).map(_.toLong)
        .getOrElse(128L << 20))
  }

  override def supportsExternalMetadata(): Boolean = true
}

private class FeatherTable(tableSchema: StructType, path: String,
                           maxSplitBytes: Long)
    extends Table with SupportsRead {
  override def name(): String = s"feather `$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FeatherScanBuilder(tableSchema, path,
      // read options win over table properties (this is where
      // .option("maxSplitBytes", …) actually arrives)
      Option(options.get("maxsplitbytes")).map(_.toLong)
        .getOrElse(maxSplitBytes))
}

private class FeatherScanBuilder(fullSchema: StructType, path: String,
                                 maxSplitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var required: StructType = fullSchema
  private var limit: Int = -1
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // partial push: each partition yields at most `limit` rows (batch decode
  // stops early); Spark still applies the global limit above the scan
  override def pushLimit(l: Int): Boolean = { limit = l; false }
  override def build(): Scan =
    new FeatherScan(required, path, maxSplitBytes, limit)
}

private class FeatherScan(readSchema0: StructType, path: String,
                          maxSplitBytes: Long, limit: Int)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = readSchema0
  override def description(): String =
    s"feather `$path` ReadSchema: ${readSchema0.catalogString}"
  override def toBatch: Batch = this

  // planned once per scan, on the driver
  private lazy val splits: Seq[(String, Long, Seq[Int])] =
    GraftFeather.planRead(SparkSession.active, path, maxSplitBytes)._2

  override def planInputPartitions(): Array[InputPartition] =
    splits.map { case (f, len, idxs) =>
      FeatherInputPartition(f, len, idxs)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new FeatherReaderFactory(readSchema0, limit,
      GraftHadoop.confBroadcast(SparkSession.active))

  override def estimateStatistics(): Statistics = new Statistics {
    // file bytes: the honest lower bound the broadcast threshold needs
    // (distinct by FILE — a length collision must not drop a file)
    private val bytes = splits.map(s => (s._1, s._2)).distinct.map(_._2).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty() // row counts aren't in the IPC footer
  }
}

private case class FeatherInputPartition(file: String, len: Long,
                                         batchIdxs: Seq[Int])
    extends InputPartition

private class FeatherReaderFactory(
    readSchema: StructType, limit: Int,
    confMap: org.apache.spark.broadcast.Broadcast[Map[String, String]])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FeatherInputPartition]
    new PartitionReader[InternalRow] {
      private val execConf = {
        val c = new org.apache.hadoop.conf.Configuration(false)
        confMap.value.foreach { case (k, v) => c.set(k, v) }
        c
      }
      private var open: Option[AutoCloseable] = None
      private val toInternal =
        CatalystTypeConverters.createToCatalystConverter(readSchema)
      // a throw AFTER the reader opened but BEFORE construction finishes
      // (missing column, corrupt footer) means Spark never gets a reader
      // to close() — release here or the fd + Arrow buffers leak per retry
      private val all =
        try GraftFeather.splitRows(
          execConf, p.file, p.len, p.batchIdxs,
          readSchema.fieldNames.toSeq, r => open = Some(r))
        catch { case e: Throwable =>
          open.foreach(r => try r.close() catch { case _: Exception => () })
          throw e
        }
      private val rows = if (limit >= 0) all.take(limit) else all
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          current = toInternal(rows.next()).asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit =
        open.foreach(r => try r.close() catch { case _: Exception => () })
    }
  }
}
