package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{GraftAvro, GraftHadoop}

/** DataSource V2 connector for Avro container files:
  * `spark.read.format("graft-avro").load(path)`. Short name deliberately
  * NOT "avro": deployments that ship the official spark-avro connector
  * must not have it shadowed by this one.
  *
  * Planner-integrated face of [[GraftAvro.read]]: sync-marker byte-range
  * splits become `InputPartition`s; `SupportsPushDownRequiredColumns`
  * prunes CONVERSION work (Avro's serial record encoding still decodes
  * every field's bytes — same contract as the reference's `columns=`);
  * file-length statistics feed the broadcast threshold. Writes stay on
  * [[GraftAvro.write]] (temp+rename commit, ErrorIfExists). */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-avro source requires a path: " +
        "spark.read.format(\"graft-avro\").load(path)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftAvro.planRead(SparkSession.active, pathOf(options),
      maxSplitBytes = Long.MaxValue)._2

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new AvroTable(schema, pathOf(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = true
}

private class AvroTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro `$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, path,
      Option(options.get("maxsplitbytes")).map(_.toLong)
        .getOrElse(128L << 20))
}

private class AvroScanBuilder(fullSchema: StructType, path: String,
                              maxSplitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var required: StructType = fullSchema
  private var limit: Int = -1
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // partial push: per-partition row cap; the global limit stays above
  override def pushLimit(l: Int): Boolean = { limit = l; false }
  override def build(): Scan = new AvroScan(required, path, maxSplitBytes, limit)
}

private class AvroScan(readSchema0: StructType, path: String,
                       maxSplitBytes: Long, limit: Int)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = readSchema0
  override def description(): String =
    s"graft-avro `$path` ReadSchema: ${readSchema0.catalogString}"
  override def toBatch: Batch = this

  private lazy val plan =
    GraftAvro.planRead(SparkSession.active, path, maxSplitBytes)

  override def planInputPartitions(): Array[InputPartition] =
    plan._3.map { case (f, s, e) => AvroInputPartition(f, s, e) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    // schemaJson rides the factory (serialized ONCE into the shared task
    // binary), not every InputPartition — a 100KB writer schema must not
    // be duplicated across thousands of task descriptions
    new AvroReaderFactory(readSchema0, plan._1, limit,
      GraftHadoop.confBroadcast(SparkSession.active))

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = plan._3.map(s => s._3 - s._2).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
}

private case class AvroInputPartition(file: String, start: Long, end: Long)
    extends InputPartition

private class AvroReaderFactory(
    readSchema: StructType, schemaJson: String, limit: Int,
    confMap: org.apache.spark.broadcast.Broadcast[Map[String, String]])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroInputPartition]
    new PartitionReader[InternalRow] {
      private val execConf = {
        val c = new org.apache.hadoop.conf.Configuration(false)
        confMap.value.foreach { case (k, v) => c.set(k, v) }
        c
      }
      private var open: Option[AutoCloseable] = None
      private val toInternal =
        CatalystTypeConverters.createToCatalystConverter(readSchema)
      // release a half-constructed reader (schema-resolution throw) —
      // Spark only close()es readers whose construction succeeded
      private val all =
        try GraftAvro.splitRows(
          execConf, schemaJson, p.file, p.start, p.end,
          Some(readSchema.fieldNames.toSeq), // Some(Nil) = count(*) shape
          r => open = Some(r), _ => open = None)
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
