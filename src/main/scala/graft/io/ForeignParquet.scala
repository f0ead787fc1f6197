package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{INT32, INT64}

/** FOREIGN parquet fixture writer for UNSIGNED logical types: parquet-mr's
  * example API with UINT_8/16/32/64 annotations — encodings no Spark
  * writer ever emits (Spark has no unsigned types), so reading them
  * exercises the widening decode branches (UINT_8→Short, UINT_16→Int,
  * UINT_32→Long, UINT_64→Decimal(20,0) — SURVEY §1.2, mirroring the
  * reference's unsigned column types, cpp/include/cudf/types.hpp:209-212).
  *
  * Fixture-construction only (driver-side, bounded rows) — the reading
  * query is the distributed data path.
  */
object ForeignParquet {

  /** Writes (okey, u8, u16, u32, u64raw) rows where the u* columns carry
    * unsigned logical annotations over INT32/INT64 physical storage.
    * `u64raw` is the SIGNED 64-bit bit pattern; its unsigned value
    * (raw + 2^64 when negative) is what a correct reader must surface. */
  def writeUnsigned(path: String,
                    rows: Seq[(Long, Int, Int, Long, Long)]): Unit = {
    val schema: MessageType = Types.buildMessage()
      .required(INT64).named("okey")
      .required(INT32).as(LogicalTypeAnnotation.intType(8, false)).named("u8")
      .required(INT32).as(LogicalTypeAnnotation.intType(16, false)).named("u16")
      .required(INT32).as(LogicalTypeAnnotation.intType(32, false)).named("u32")
      .required(INT64).as(LogicalTypeAnnotation.intType(64, false)).named("u64")
      .named("unsigned_row")
    val conf = new Configuration()
    val p = new Path(s"$path/part-00000.parquet")
    val fs = p.getFileSystem(conf)
    if (fs.exists(new Path(path))) fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    val writer = ExampleParquetWriter.builder(p)
      .withType(schema)
      .withConf(conf)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try rows.foreach { case (okey, u8, u16, u32, u64raw) =>
      val g = factory.newGroup()
      g.append("okey", okey)
      // physical INT32 stores the raw (possibly sign-bit-set) pattern;
      // the unsigned annotation is what makes 0xFF mean 255, not -1
      g.append("u8", u8)
      g.append("u16", u16)
      g.append("u32", u32.toInt)
      g.append("u64", u64raw)
      writer.write(g)
    } finally writer.close()
  }

  /** Writes an events-shaped fixture whose `ts` column carries an explicit
    * parquet TIMESTAMP annotation — any (unit, isAdjustedToUTC) combination,
    * including the two the driver fixture has shipped with across
    * generations: TIMESTAMP(NANOS) (readable by Spark only via the
    * `nanosAsLong` legacy conf, as a raw long) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (read natively as TIMESTAMP_NTZ). The reference
    * treats all four resolutions as first-class column types
    * (cpp/include/cudf/types.hpp:216-220); `Tables.events` must normalize
    * every encoding to the same logical (ts, ts_ns) — the spec pins that.
    *
    * `rows` = (event_id, epochNanos); the stored INT64 is epochNanos
    * rescaled to `unit`. */
  def writeEventsTs(path: String,
                    unit: LogicalTypeAnnotation.TimeUnit,
                    adjustedToUTC: Boolean,
                    rows: Seq[(Long, Long)]): Unit = {
    import LogicalTypeAnnotation.TimeUnit
    val schema: MessageType = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(adjustedToUTC, unit))
      .named("ts")
      .named("events_row")
    val conf = new Configuration()
    val p = new Path(s"$path/part-00000.parquet")
    val fs = p.getFileSystem(conf)
    if (fs.exists(new Path(path))) fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    val divisor = unit match {
      case TimeUnit.NANOS  => 1L
      case TimeUnit.MICROS => 1000L
      case TimeUnit.MILLIS => 1000000L
    }
    val writer = ExampleParquetWriter.builder(p)
      .withType(schema)
      .withConf(conf)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, ns) =>
      val g = factory.newGroup()
      g.append("event_id", id)
      g.append("ts", ns / divisor)
      writer.write(g)
    } finally writer.close()
  }
}
