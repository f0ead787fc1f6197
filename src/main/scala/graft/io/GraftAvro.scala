package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro source/sink built directly on the Avro library Spark already
  * bundles (avro-1.12 is a Spark core dependency) — the spark-avro
  * CONNECTOR is what the zero-egress environment lacks, not the codec.
  * Reference: python/cudf/cudf/io/avro.py:7 (read_avro with columns=);
  * cpp avro reader supports primitives + union-with-null.
  *
  * Scale shape: SPLITTABLE reads — files larger than `maxSplitBytes` are
  * divided into byte-range splits and each task seeks to the first Avro
  * block sync marker inside its range (`DataFileReader.sync/pastSync`,
  * the same protocol Hadoop's AvroRecordReader uses; the reference's C++
  * reader block-decodes the same markers, cpp/src/io/avro/). A single
  * giant third-party .avro drop therefore parallelizes across the
  * cluster instead of serializing into one task. The schema is read
  * once, from one file header on the driver; executors stream-decode
  * records and never materialize a file.
  * Column projection (`columns`) prunes during row conversion — Avro's
  * serial record encoding forces a full decode pass per record regardless
  * (same contract as the reference's columns=).
  */
object GraftAvro {

  // ---- schema mapping ------------------------------------------------------

  /** Avro → Spark type. Unions must be [null, T] (the nullable idiom —
    * same restriction as the reference's reader). */
  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
      else IntegerType
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case lt if lt != null && lt.getName == "timestamp-millis" => TimestampType
        case lt if lt != null && lt.getName == "timestamp-micros" => TimestampType
        case _ => LongType
      }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name(), toSparkType(f.schema()))).toSeq)
    case Schema.Type.ARRAY => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, toSparkType(s.getValueType))
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(branches.size == 1,
        s"only [null, T] unions are supported, got $s")
      toSparkType(branches.head)
    case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  /** Avro runtime value → Spark row value, keyed by the avro schema. */
  private def toSparkValue(s: Schema, v: Any): Any = v match {
    case null => null
    case _ => s.getType match {
      case Schema.Type.UNION =>
        val branch = s.getTypes.asScala
          .find(_.getType != Schema.Type.NULL).get
        toSparkValue(branch, v)
      case Schema.Type.STRING => v match {
        case u: Utf8 => u.toString
        case other => other.toString
      }
      case Schema.Type.ENUM => v.toString
      case Schema.Type.INT if s.getLogicalType != null &&
          s.getLogicalType.getName == "date" =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Int].toLong))
      case Schema.Type.LONG if s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-millis" =>
        java.sql.Timestamp.from(
          java.time.Instant.ofEpochMilli(v.asInstanceOf[Long]))
      case Schema.Type.LONG if s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-micros" =>
        val micros = v.asInstanceOf[Long]
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      case Schema.Type.BYTES => s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
          val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
          BigDecimal(new java.math.BigInteger(bytes), d.getScale)
        case _ =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
          val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
          bytes
      }
      case Schema.Type.FIXED => s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          BigDecimal(new java.math.BigInteger(
            v.asInstanceOf[GenericData.Fixed].bytes()), d.getScale)
        case _ => v.asInstanceOf[GenericData.Fixed].bytes().clone()
      }
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.map(f =>
          toSparkValue(f.schema(), rec.get(f.pos()))).toSeq)
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala
          .map(toSparkValue(s.getElementType, _)).toSeq
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> toSparkValue(s.getValueType, mv)
        }.toMap
      case _ => v // boolean/int/long/float/double pass through
    }
  }

  // ---- read ----------------------------------------------------------------

  // One broadcast Hadoop-conf snapshot per SparkSession (shared with the
  // Feather source; see GraftHadoop for the rationale).
  private def confBroadcast(spark: SparkSession) =
    GraftHadoop.confBroadcast(spark)

  /** Lists the .avro part files under `path` (a file or directory) with
    * their byte lengths (split planning needs them). */
  private def partFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stat = fs.getFileStatus(p)
    val files =
      if (stat.isDirectory)
        fs.listStatus(p).toSeq
          .filter(f => f.getPath.getName.endsWith(".avro") &&
            !f.getPath.getName.startsWith("_"))
      else Seq(stat)
    require(files.nonEmpty, s"no .avro files under $path")
    files.map(f => f.getPath.toString -> f.getLen).sortBy(_._1)
  }

  /** Fails fast with the offending FILE NAME when a part file's writer
    * schema cannot resolve against the driver schema — a missing field
    * with no default, the one structural mismatch name-based resolution
    * cannot paper over. Type conflicts surface through the decode-error
    * wrapping in [[read]] (also file-named). */
  /** mergeSchema reader schema: the UNION of every file header's fields,
    * first-seen order, each wrapped nullable-with-null-default — so
    * Avro's own per-file schema RESOLUTION (already run by [[openReader]]
    * with an expected schema) fills null for writers that predate a
    * field. This is evolution the Avro way: the reader schema declares
    * the default; no row-level special-casing. A field carried with two
    * structurally different (non-null) types fails loudly BY FILE.
    * Header reads run on a bounded pool — O(files / pool), not serial. */
  private[graft] def mergedSchema(spark: SparkSession,
                                  files: Seq[(String, Long)]): Schema =
    mergedSchemaConf(spark.sparkContext.hadoopConfiguration, files)

  /** [[mergedSchema]] off a bare Hadoop conf — callable from executor
    * code (the compaction rewriter unions its GROUP's headers there). */
  private[graft] def mergedSchemaConf(
      conf: org.apache.hadoop.conf.Configuration,
      files: Seq[(String, Long)]): Schema = {
    require(files.nonEmpty, "mergedSchema: empty file list")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, files.size)))
    val perFile =
      try files.map { case (f, _) =>
        (f, pool.submit(new java.util.concurrent.Callable[Schema] {
          def call(): Schema = {
            val r = openReader(conf, f)
            try r.getSchema finally r.close()
          }
        }))
      }.map { case (f, fu) =>
        try (f, fu.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw new java.io.IOException(
              s"Avro part file $f: cannot read header", e.getCause)
        }
      } finally pool.shutdown()
    perFile.foreach { case (f, s) =>
      require(s.getType == Schema.Type.RECORD,
        s"Avro part file $f: top-level schema must be a record, got $s") }
    def nonNull(s: Schema): Schema =
      if (s.getType == Schema.Type.UNION) {
        val rest = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        if (rest.size == 1) rest.head else Schema.createUnion(rest.asJava)
      } else s
    def isNullableSchema(s: Schema): Boolean =
      s.getType == Schema.Type.UNION &&
        s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)
    val order = scala.collection.mutable.LinkedHashMap.empty[String, (Schema, String)]
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val anyNullable = scala.collection.mutable.Map.empty[String, Boolean]
    perFile.foreach { case (f, rec) =>
      rec.getFields.asScala.foreach { fld =>
        seen(fld.name()) = seen.getOrElse(fld.name(), 0) + 1
        anyNullable(fld.name()) = anyNullable.getOrElse(fld.name(), false) ||
          isNullableSchema(fld.schema())
        order.get(fld.name()) match {
          case None => order(fld.name()) = (fld.schema(), f)
          case Some((prev, prevFile)) =>
            require(nonNull(prev) == nonNull(fld.schema()),
              s"mergeSchema: avro field '${fld.name()}' is " +
                s"${nonNull(prev)} in $prevFile but " +
                s"${nonNull(fld.schema())} in $f — evolved fields must " +
                "keep their type")
        }
      }
    }
    val fields = order.map { case (name, (fs, _)) =>
      // a field every file carries with a uniform nullability verdict
      // keeps its declared schema unchanged; a field some file PREDATES —
      // or that ANY generation wrote as a null union while the first-seen
      // file did not — gets the null-defaulted union so resolution can
      // fill/carry nulls (keeping the first file's non-null schema over a
      // later nullable generation fails resolution loudly at read time)
      if (seen(name) == perFile.size &&
          (isNullableSchema(fs) || !anyNullable(name)))
        new Schema.Field(name, fs, null.asInstanceOf[String])
      else {
        val branches = nonNull(fs) match {
          case u if u.getType == Schema.Type.UNION => u.getTypes.asScala.toSeq
          case s => Seq(s)
        }
        val unioned = Schema.createUnion(
          (Schema.create(Schema.Type.NULL) +: branches).asJava)
        new Schema.Field(name, unioned, null,
          org.apache.avro.JsonProperties.NULL_VALUE)
      }
    }.toSeq
    // keep the first file's record identity: external avro consumers
    // resolve records by full name, and compacted outputs must not
    // advertise a different one than the inputs did
    val rec0 = perFile.head._2
    Schema.createRecord(rec0.getName, rec0.getDoc, rec0.getNamespace, false,
      fields.asJava)
  }

  private def checkResolvable(expected: Schema, writer: Schema, file: String): Unit = {
    expected.getFields.asScala.foreach { f =>
      if (writer.getField(f.name()) == null && !f.hasDefaultValue)
        throw new IllegalArgumentException(
          s"Avro part file $file: writer schema has no field '${f.name()}' " +
            "and the expected schema declares no default — cannot resolve. " +
            s"Writer fields: ${writer.getFields.asScala.map(_.name()).mkString(", ")}")
    }
  }

  /** Opens one part file. When `expected` is set, Avro schema RESOLUTION
    * runs per file (fields matched by name against each file's embedded
    * writer schema) — a schema-evolved directory whose parts reordered or
    * prepended fields decodes correctly instead of silently misaligning
    * positional reads. */
  private def openReader(conf: org.apache.hadoop.conf.Configuration,
                         file: String,
                         expected: Option[Schema] = None): DataFileReader[GenericRecord] = {
    val in = new org.apache.avro.mapred.FsInput(new Path(file), conf)
    val datum = expected match {
      case Some(e) => new GenericDatumReader[GenericRecord](null, e)
      case None => new GenericDatumReader[GenericRecord]()
    }
    new DataFileReader[GenericRecord](in, datum)
  }

  /** read_avro(path, columns=...): schema from one header, byte-range
    * splits (one task each, sync-marker aligned), post-decode projection.
    *
    * Split ownership protocol (identical to Hadoop's AvroRecordReader): a
    * task `sync(start)`s to the first block boundary at-or-after its start
    * offset and consumes blocks until `pastSync(end)` — every block is
    * owned by exactly the split containing its leading sync marker, so
    * rows are read exactly once with no coordination. */
  def read(spark: SparkSession, path: String,
           columns: Seq[String] = Nil,
           maxSplitBytes: Long = 128L << 20): DataFrame =
    readFilesDF(spark, partFiles(spark, path), columns, maxSplitBytes)

  /** [[read]] over an EXPLICIT file list, optionally with the merged
    * (null-defaulted union) reader schema — the entry point for callers
    * that plan files themselves (the mutation rewriter reads exactly the
    * TOUCHED files of a snapshot manifest; a directory read would pull
    * retired generations back in). */
  private[graft] def readFilesDF(spark: SparkSession,
                                 files: Seq[(String, Long)],
                                 columns: Seq[String] = Nil,
                                 maxSplitBytes: Long = 128L << 20,
                                 mergeSchema: Boolean = false,
                                 dvPaths: Map[String, String] = Map.empty,
                                 posKeep: Map[String, Array[Long]] = Map.empty)
      : DataFrame = {
    val (firstJson, firstSchema, splits) =
      planReadFiles(spark, files, maxSplitBytes)
    val (schemaJson, sparkSchema) =
      if (mergeSchema) {
        val m = mergedSchema(spark, files)
        (m.toString,
          toSparkType(m).asInstanceOf[StructType])
      } else (firstJson, firstSchema)
    val confMap = confBroadcast(spark)
    val rdd = spark.sparkContext
      .parallelize(splits, splits.size)
      .mapPartitions { sit =>
        val execConf = new org.apache.hadoop.conf.Configuration(false)
        confMap.value.foreach { case (k, v) => execConf.set(k, v) }
        // close on task completion, not iterator exhaustion: limit()/take()
        // and mid-file exceptions stop consuming early, and the open
        // reader would otherwise leak one fd + decompressor per split
        val open = new java.util.ArrayList[DataFileReader[GenericRecord]]()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            open.asScala.foreach(r => try r.close() catch { case _: Exception => () })))
        sit.flatMap { case (file, start, end) =>
          // deletion vectors load executor-side per split (tiny files);
          // posKeep inverts the filter for driver-computed position sets
          posKeep.get(file) match {
            case Some(keep) =>
              // a split whose byte range owns none of the kept blocks
              // has nothing to contribute — skip the whole decode. The
              // position encodes previousSync() = the byte AFTER the
              // block's leading 16-byte sync marker, and the reader for
              // [start, end) owns blocks with blockStart in
              // [start+16, end+16) (pastSync stops at end+SYNC_SIZE) —
              // so the upper bound extends by the marker size; a block
              // landing within 16 bytes past `end` belongs to THIS
              // split, and dropping it would silently lose its rows.
              // The bounds are conservative (a false "owns" costs one
              // wasted decode, never duplicates — the position filter
              // only keeps rows this split actually reads).
              val owns = keep.exists { pos =>
                val off = pos >>> 24
                off >= start && off < end + 16
              }
              if (!owns) Iterator.empty
              else splitRows(execConf, schemaJson, file, start, end, None,
                r => open.add(r), r => open.remove(r), dv = keep,
                dvKeep = true)
            case None =>
              val dv = dvPaths.get(file)
                .map(p => DeletionVectors.read(execConf, p)).orNull
              splitRows(execConf, schemaJson, file, start, end, None,
                r => open.add(r), r => open.remove(r), dv = dv)
          }
        }
      }
    val df = spark.createDataFrame(rdd, sparkSchema)
    if (columns.nonEmpty) df.select(columns.map(org.apache.spark.sql.functions.col): _*)
    else df
  }

  /** Driver-side read planning: writer-schema JSON (from the first file
    * header), the mapped Spark schema, and (file, startOffset, endOffset)
    * byte-range splits. Shared by [[read]] and the DSv2 connector. */
  private[graft] def planRead(spark: SparkSession, path: String,
                              maxSplitBytes: Long)
      : (String, StructType, Seq[(String, Long, Long)]) =
    planReadFiles(spark, partFiles(spark, path), maxSplitBytes)

  /** [[planRead]] over an explicit file list — for callers that discover
    * files themselves (the partitioned-layout connector walks `key=value`
    * chains; `partFiles` only lists flat dirs). */
  private[graft] def planReadFiles(spark: SparkSession,
                                   files: Seq[(String, Long)],
                                   maxSplitBytes: Long)
      : (String, StructType, Seq[(String, Long, Long)]) = {
    require(maxSplitBytes > 0, s"maxSplitBytes must be positive, got $maxSplitBytes")
    require(files.nonEmpty, "planReadFiles: empty file list")
    val conf = spark.sparkContext.hadoopConfiguration
    val avroSchema = {
      val r = openReader(conf, files.head._1)
      try r.getSchema finally r.close()
    }
    require(avroSchema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got $avroSchema")
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val splits = files.flatMap { case (f, len) =>
      val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes).toInt
      val step = (len + n - 1) / n
      (0 until n).map(i => (f, i * step, math.min(len, (i + 1L) * step)))
    }
    (avroSchema.toString, sparkSchema, splits)
  }

  /** Executor-side split decode with the sync-marker ownership protocol.
    * `colNames` None decodes every field; Some(names) decodes only those
    * fields — Some(Nil) decodes NONE, the count(*) shape DSv2 pruning
    * produces (Avro's serial record encoding still forces a full
    * byte-level decode pass, but conversion work is pruned). Shared by
    * [[read]] and the DSv2 connector. */
  private[graft] def splitRows(execConf: org.apache.hadoop.conf.Configuration,
                               schemaJson: String, file: String,
                               start: Long, end: Long,
                               colNames: Option[Seq[String]],
                               registerOpen: DataFileReader[GenericRecord] => Unit,
                               registerClosed: DataFileReader[GenericRecord] => Unit,
                               dv: Array[Long] = null,
                               dvKeep: Boolean = false)
      : Iterator[Row] =
    // positions are only consumed by the DV cursor — a plain read must
    // not pay (or be bounded by) the position encoding: avroPos's 2^39
    // byte / 2^24 records-per-block limits would otherwise fail reads
    // of huge DV-free containers that decoded fine before
    splitRowsPos(execConf, schemaJson, file, start, end, colNames,
      registerOpen, registerClosed, dv, dvKeep,
      needPos = dv != null).map(_._2)

  /** [[splitRows]] with each row's DELETION-VECTOR POSITION
    * (`(blockSyncOffset << 24) | recordInBlock` —
    * [[DeletionVectors.avroPos]]). Block sync offsets come from the
    * reader's `previousSync()` — the physical byte position of the
    * block's leading sync marker, identical whether the reader arrived
    * sequentially or `sync()`-ed straight into the block (AvroSpec pins
    * this invariant against the runtime jar: it is what makes a DV
    * written by a whole-file scan apply correctly under any split
    * plan). */
  private[graft] def splitRowsPos(
      execConf: org.apache.hadoop.conf.Configuration,
      schemaJson: String, file: String,
      start: Long, end: Long,
      colNames: Option[Seq[String]],
      registerOpen: DataFileReader[GenericRecord] => Unit,
      registerClosed: DataFileReader[GenericRecord] => Unit,
      dv: Array[Long] = null,
      dvKeep: Boolean = false,
      needPos: Boolean = true)
      : Iterator[(Long, Row)] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val fields = colNames match {
      case None => schema.getFields.asScala.toSeq
      case Some(names) => names.map { c =>
        val f = schema.getField(c)
        require(f != null, s"column '$c' not in avro schema")
        f
      }
    }
    val reader =
      try openReader(execConf, file, Some(schema))
      catch { case e: Exception =>
        throw new java.io.IOException(s"Avro part file $file: cannot open", e)
      }
    registerOpen(reader)
    checkResolvable(schema, reader.getSchema, file)
    reader.sync(start) // first block boundary at-or-after start
    val base = new Iterator[(Long, Row)] {
      // (block sync offset, record ordinal inside the block): hasNext
      // loads the next block when the current one is exhausted, so by
      // the time next() runs, previousSync() names the block this
      // record belongs to
      private var curSync = -1L
      private var recIdx = 0L
      def hasNext: Boolean = {
        val h = reader.hasNext && !reader.pastSync(end)
        if (!h) { reader.close(); registerClosed(reader) }
        h
      }
      def next(): (Long, Row) =
        try {
          // `needPos = false` (a plain read, no DV and no position
          // consumer) skips the packing: its 2^39-byte offset bound must
          // never gate a read that ignores positions anyway
          val pos = if (needPos) {
            val s = reader.previousSync()
            if (s != curSync) { curSync = s; recIdx = 0L }
            val p = DeletionVectors.avroPos(curSync, recIdx)
            recIdx += 1
            p
          } else -1L
          val rec = reader.next()
          // resolution (expected schema) makes positions match the
          // driver schema regardless of each file's writer layout
          (pos, Row.fromSeq(fields.map(f =>
            toSparkValue(f.schema(), rec.get(f.pos())))))
        } catch {
          case e: org.apache.avro.AvroRuntimeException =>
            throw new java.io.IOException(
              s"Avro part file $file: record decode failed against the " +
                s"driver schema (writer schema incompatible?): ${e.getMessage}", e)
        }
    }
    if (dv == null) base
    else {
      // positions ascend within a split, so the advancing cursor is
      // O(1) amortized per row after its first catch-up
      val cursor = new DeletionVectors.Cursor(dv, dvKeep)
      base.filter(p => cursor.admit(p._1))
    }
  }

  // ---- write ---------------------------------------------------------------

  /** Spark → Avro schema for the writer (nullable fields become [null, T]). */
  def toAvroSchema(st: StructType, name: String = "spark_row"): Schema = {
    def field(dt: DataType, nullable: Boolean, path: String): Schema = {
      val base = dt match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType | TimestampNTZType =>
          org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case DateType =>
          org.apache.avro.LogicalTypes.date()
            .addToSchema(Schema.create(Schema.Type.INT))
        case d: DecimalType =>
          org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
            .addToSchema(Schema.create(Schema.Type.BYTES))
        case ArrayType(et, containsNull) =>
          Schema.createArray(field(et, containsNull, path + ".elem"))
        case MapType(StringType, vt, valueContainsNull) =>
          Schema.createMap(field(vt, valueContainsNull, path + ".value"))
        case struct: StructType => toAvroSchema(struct, path.replace('.', '_'))
        case other =>
          throw new IllegalArgumentException(s"unsupported write type $other at $path")
      }
      if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      else base
    }
    Schema.createRecord(name, null, "graft", false,
      st.fields.map(f => new Schema.Field(
        f.name, field(f.dataType, f.nullable, f.name), null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)).toSeq.asJava)
  }

  private def toAvroValue(s: Schema, dt: DataType, v: Any): Any = {
    if (v == null) return null
    val branch =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else s
    (dt, v) match {
      case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      case (TimestampType | TimestampNTZType, t: java.time.LocalDateTime) =>
        val inst = t.toInstant(java.time.ZoneOffset.UTC)
        inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
      case (DateType, d: java.time.LocalDate) => d.toEpochDay.toInt
      case (_: DecimalType, d: java.math.BigDecimal) =>
        java.nio.ByteBuffer.wrap(d.unscaledValue().toByteArray)
      case (_: DecimalType, d: BigDecimal) =>
        java.nio.ByteBuffer.wrap(d.bigDecimal.unscaledValue().toByteArray)
      case (BinaryType, b: Array[Byte]) => java.nio.ByteBuffer.wrap(b)
      case (ArrayType(et, _), xs: scala.collection.Seq[_]) =>
        xs.map(toAvroValue(branch.getElementType, et, _)).asJava
      case (MapType(_, vt, _), m: scala.collection.Map[_, _]) =>
        m.map { case (k, mv) =>
          k.toString -> toAvroValue(branch.getValueType, vt, mv)
        }.toMap.asJava
      case (struct: StructType, r: Row) =>
        val rec = new GenericData.Record(branch)
        struct.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvroValue(
            branch.getField(f.name).schema(), f.dataType, r.get(i)))
        }
        rec
      case (_, other) => other
    }
  }

  /** to_avro: one .avro part per partition, deflate or snappy codec.
    *
    * Commit discipline (no Hadoop committer here): each task writes a
    * temp file named by its attempt id and renames to the final part name
    * on success — duplicate speculative attempts race only on the rename
    * (each file is complete, last rename wins; never interleaved bytes),
    * and a failed job leaves `.tmp` turds, never a truncated part. The
    * driver stamps `_SUCCESS` after the job, so readers can gate on
    * completeness like any Hadoop-committed directory. */
  /** One open .avro part: appends rows as GenericRecords, closes into a
    * complete container file on [[finish]]. Shared by [[write]]'s RDD
    * path and the DSv2 DataWriter (graft.sources), which each own file
    * placement and commit. */
  private[graft] final class AvroPartWriter(
      st: StructType, schemaJson: String,
      stream: java.io.OutputStream, codec: String) {
    private val schema = new Schema.Parser().parse(schemaJson)
    private val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    writer.setCodec(codec match {
      case "snappy" => org.apache.avro.file.CodecFactory.snappyCodec()
      case "deflate" => org.apache.avro.file.CodecFactory.deflateCodec(6)
      case "null" | "none" => org.apache.avro.file.CodecFactory.nullCodec()
      case other => throw new IllegalArgumentException(s"unknown codec $other")
    })
    writer.create(schema, stream)

    def append(r: Row): Unit = {
      val rec = new GenericData.Record(schema)
      st.fields.zipWithIndex.foreach { case (f, i) =>
        rec.put(f.name, toAvroValue(
          schema.getField(f.name).schema(), f.dataType, r.get(i)))
      }
      writer.append(rec)
    }

    def finish(): Unit = writer.close()

    def abort(): Unit =
      try writer.close() catch { case _: Exception => () }
  }

  def write(df: DataFrame, path: String, codec: String = "snappy",
            overwrite: Boolean = false): Unit = {
    val st = df.schema
    val schemaJson = toAvroSchema(st).toString
    require(Seq("snappy", "deflate", "null", "none").contains(codec),
      s"unknown codec $codec (snappy, deflate, none)") // fail on the driver
    val spark = df.sparkSession
    val confMap = confBroadcast(spark)
    val out = new Path(path)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(out)) {
      // Same contract as every Spark writer: destroying an existing
      // dataset requires an explicit opt-in, not a mistyped path.
      if (!overwrite)
        throw new IllegalArgumentException(
          s"GraftAvro.write: $path already exists; pass overwrite = true " +
            "to replace it (ErrorIfExists is the default, as with " +
            "DataFrameWriter.mode)")
      fs.delete(out, true)
    }
    fs.mkdirs(out)
    val stFinal = st
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val execConf = new org.apache.hadoop.conf.Configuration(false)
      confMap.value.foreach { case (k, v) => execConf.set(k, v) }
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val partFs = new Path(path).getFileSystem(execConf)
      val finalPart = new Path(path, f"part-$pid%05d.avro")
      val tmpPart = new Path(path, f".part-$pid%05d-attempt-$attempt.avro.tmp")
      val pw = new AvroPartWriter(stFinal, schemaJson,
        partFs.create(tmpPart, true), codec)
      try {
        var n = 0L
        rows.foreach { r => pw.append(r); n += 1 }
        pw.finish()
        // commit by RENAME ONLY — never delete the destination first: a
        // speculative duplicate killed between a delete and its rename
        // would silently lose the part another attempt committed. A lost
        // race means a COMPLETE part already exists; drop the tmp.
        if (!partFs.rename(tmpPart, finalPart)) {
          require(partFs.exists(finalPart),
            s"rename $tmpPart -> $finalPart failed with no winner present")
          partFs.delete(tmpPart, false)
        }
        Iterator.single(n)
      } catch {
        case e: Throwable =>
          pw.abort()
          try partFs.delete(tmpPart, false) catch { case _: Exception => () }
          throw e
      }
    }.count(): Unit
    // an empty frame can optimize to a ZERO-partition RDD: no task ran, so
    // no part carries the schema — stamp one schema-only part (header, no
    // blocks) so a later read returns an empty frame, not "no .avro files"
    if (!fs.listStatus(out).exists(_.getPath.getName.endsWith(".avro"))) {
      val schema = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      val stream = fs.create(new Path(out, "part-00000.avro"), true)
      try w.create(schema, stream) finally w.close()
    }
    fs.create(new Path(out, "_SUCCESS"), true).close()
  }

  /** Write a frame as avro parts named `$prefix-NNNNN.avro` into an
    * EXISTING directory, with per-part `.stats.json` sidecars — the avro
    * twin of [[GraftFeather.writeParts]] (same tmp+rename commit, same
    * prefix pre-clean so a crashed run's orphans are reclaimed by the
    * retry). Returns (name, committedLen, statsJson) per part written;
    * empty partitions write nothing. */
  private[graft] def writeParts(df: DataFrame, dir: String, prefix: String,
                                codec: String = "snappy")
      : Seq[(String, Long, String)] = {
    require(prefix.nonEmpty && !prefix.contains("/") && !prefix.startsWith("."),
      s"writeParts prefix must be a plain name fragment, got '$prefix'")
    val st = df.schema
    val schemaJson = toAvroSchema(st).toString
    require(Seq("snappy", "deflate", "null", "none").contains(codec),
      s"unknown codec $codec (snappy, deflate, none)")
    val spark = df.sparkSession
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(out) && fs.getFileStatus(out).isDirectory,
      s"writeParts: $dir is not an existing directory")
    fs.listStatus(out).iterator
      .filter(e => !e.isDirectory && e.getPath.getName.startsWith(prefix + "-"))
      .foreach(e => fs.delete(e.getPath, false))
    val confMap = confBroadcast(spark)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val execConf = new org.apache.hadoop.conf.Configuration(false)
        confMap.value.foreach { case (k, v) => execConf.set(k, v) }
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val partFs = new Path(dir).getFileSystem(execConf)
        val finalPart = new Path(dir, f"$prefix-$pid%05d.avro")
        val tmpPart = new Path(dir, f".$prefix-$pid%05d-attempt-$attempt.avro.tmp")
        val pw = new AvroPartWriter(st, schemaJson,
          partFs.create(tmpPart, true), codec)
        val stats = new FeatherStats.Collector(st)
        try {
          rows.foreach { r => pw.append(r); stats.observe(r) }
          pw.finish()
          val statsJson = FeatherStats.toJson(Seq(stats.snapshotAndReset()))
          if (!partFs.rename(tmpPart, finalPart)) {
            require(partFs.exists(finalPart),
              s"rename $tmpPart -> $finalPart failed with no winner present")
            partFs.delete(tmpPart, false)
          } else {
            val sc = partFs.create(
              new Path(dir, finalPart.getName + ".stats.json"), true)
            try sc.write(statsJson.getBytes("UTF-8"))
            finally sc.close()
          }
          Iterator.single((finalPart.getName,
            partFs.getFileStatus(finalPart).getLen, statsJson))
        } catch {
          case e: Throwable =>
            pw.abort()
            try partFs.delete(tmpPart, false) catch { case _: Exception => () }
            throw e
        }
      }
    }.collect().toSeq
  }

  /** Stamp one header-only avro part (schema, zero blocks) — the avro
    * twin of [[GraftFeather.stampSchemaOnly]]: a table whose every row
    * was deleted must still read back as an EMPTY frame with its schema.
    * Returns (name, committedLen). */
  private[graft] def stampSchemaOnly(fs: org.apache.hadoop.fs.FileSystem,
                                     dir: Path, name: String,
                                     st: StructType): (String, Long) = {
    val schema = toAvroSchema(st)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    val stream = fs.create(new Path(dir, name), true)
    try w.create(schema, stream) finally w.close()
    name -> fs.getFileStatus(new Path(dir, name)).getLen
  }
}
