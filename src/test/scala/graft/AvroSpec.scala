package graft

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.io.GraftAvro

/** GraftAvro decode pinned against a FOREIGN file: the fixture is written
  * with the raw Avro API (its own schema, unions, enums, logical types),
  * not GraftAvro.write — so this checks the reader's schema mapping and
  * value conversion, not a reader/writer pair agreeing with itself.
  * (io_avro_roundtrip covers the write→read pair against the oracle.) */
class AvroSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String) = s"${sys.props("java.io.tmpdir")}/graft_avro_test/$n"

  private def writeForeign(path: String): Schema = {
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"ext_event","namespace":"ext","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"tag","type":["null","string"],"default":null},
        |  {"name":"kind","type":{"type":"enum","name":"Kind","symbols":["A","B"]}},
        |  {"name":"score","type":["null","double"],"default":null},
        |  {"name":"day","type":{"type":"int","logicalType":"date"}},
        |  {"name":"at","type":{"type":"long","logicalType":"timestamp-micros"}},
        |  {"name":"amount","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}},
        |  {"name":"xs","type":{"type":"array","items":"int"}},
        |  {"name":"kv","type":{"type":"map","values":"long"}},
        |  {"name":"inner","type":{"type":"record","name":"Inner","fields":[
        |    {"name":"a","type":"int"},{"name":"b","type":["null","string"],"default":null}]}}
        |]}""".stripMargin)
    val dir = new java.io.File(path)
    dir.mkdirs()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(3))
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    def rec(id: Long, tag: String, kind: String, score: java.lang.Double,
            day: Int, at: Long, cents: Long, xs: Seq[Int],
            kv: Map[String, Long], a: Int, b: String): GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("id", id)
      r.put("tag", tag)
      r.put("kind", new GenericData.EnumSymbol(
        schema.getField("kind").schema(), kind))
      r.put("score", score)
      r.put("day", day)
      r.put("at", at)
      r.put("amount", java.nio.ByteBuffer.wrap(
        java.math.BigInteger.valueOf(cents).toByteArray))
      r.put("xs", xs.map(Int.box).asJava)
      r.put("kv", kv.map { case (k, v) => k -> Long.box(v) }.asJava)
      val inner = new GenericData.Record(
        schema.getField("inner").schema())
      inner.put("a", a)
      inner.put("b", b)
      r.put("inner", inner)
      r
    }
    // day 19723 = 2024-01-01; at = 2024-01-01T00:00:00.000001Z in micros
    w.append(rec(1L, "x", "A", 1.5, 19723, 1704067200000001L, 123456L,
      Seq(1, 2, 3), Map("k1" -> 10L), 7, "s"))
    w.append(rec(2L, null, "B", null, 19724, 1704153600500000L, -250L,
      Seq(), Map(), 8, null))
    w.close()
    schema
  }

  test("reads a foreign-written file: unions, enum, logical types, nesting") {
    import org.apache.spark.sql.types._
    val path = tmp("foreign")
    writeForeign(path)
    val df = GraftAvro.read(spark, path)
    val st = df.schema
    assert(st("tag").dataType == StringType && st("tag").nullable)
    assert(st("kind").dataType == StringType)
    assert(st("day").dataType == DateType)
    assert(st("at").dataType == TimestampType)
    assert(st("amount").dataType == DecimalType(10, 2))
    assert(st("xs").dataType == ArrayType(IntegerType))
    assert(st("kv").dataType == MapType(StringType, LongType))
    assert(st("inner").dataType.isInstanceOf[StructType])

    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getLong(0) == 1L && r1.getString(1) == "x" && r1.getString(2) == "A")
    assert(r1.getDouble(3) == 1.5)
    assert(r1.getDate(4).toString == "2024-01-01")
    assert(r1.getTimestamp(5).getTime == 1704067200000L) // micros floor to ms
    assert(r1.getDecimal(6) == new java.math.BigDecimal("1234.56"))
    assert(r1.getSeq[Int](7) == Seq(1, 2, 3))
    assert(r1.getMap[String, Long](8) == Map("k1" -> 10L))
    assert(r1.getStruct(9).getInt(0) == 7 && r1.getStruct(9).getString(1) == "s")
    val r2 = rows(1)
    assert(r2.isNullAt(1) && r2.isNullAt(3))
    assert(r2.getDecimal(6) == new java.math.BigDecimal("-2.50"))
    assert(r2.getSeq[Int](7).isEmpty && r2.getMap[String, Long](8).isEmpty)
    assert(r2.getStruct(9).isNullAt(1))
  }

  test("columns= prunes; missing column fails at analysis") {
    val path = tmp("foreign")
    writeForeign(path)
    val pruned = GraftAvro.read(spark, path, columns = Seq("id", "kind"))
    assert(pruned.columns.toSeq == Seq("id", "kind"))
    assert(pruned.count() == 2)
    intercept[org.apache.spark.sql.AnalysisException] {
      GraftAvro.read(spark, path, columns = Seq("nope")).collect()
    }
  }

  test("random rows roundtrip write→read bit-exactly") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      s <- Gen.option(Gen.listOf(Gen.oneOf(
        Gen.alphaNumChar.map(_.toString), Gen.const("\\"), Gen.const("'"),
        Gen.const("🙂"), Gen.const(" "))).map(_.mkString))
      d <- Gen.oneOf(Gen.chooseNum(-1e12, 1e12),
        Gen.const(Double.NaN), Gen.const(Double.PositiveInfinity))
      xs <- Gen.listOf(Gen.chooseNum(-1000, 1000))
    } yield (id, s, d, xs)
    val rows = Gen.listOfN(80, rowGen)
      .pureApply(Gen.Parameters.default, Seed(17L))
      // distinct ids so the compare can key on them
      .zipWithIndex.map { case ((_, s, d, xs), i) => (i.toLong, s, d, xs) }
    val df = rows.toDF("id", "s", "d", "xs").repartition(4)
    val path = tmp("prop_roundtrip")
    GraftAvro.write(df, path, codec = "snappy", overwrite = true)
    val back = GraftAvro.read(spark, path).orderBy("id").collect()
    assert(back.length == rows.length)
    rows.sortBy(_._1).zip(back).foreach { case ((id, s, d, xs), r) =>
      assert(r.getLong(0) == id)
      assert(Option(r.getString(1)) == s)
      val rd = r.getDouble(2)
      assert(java.lang.Double.doubleToLongBits(rd) ==
        java.lang.Double.doubleToLongBits(d) || (rd.isNaN && d.isNaN))
      assert(r.getSeq[Int](3) == xs)
    }
  }

  test("one multi-block file splits across >1 task with identical rows") {
    import spark.implicits._
    // one .avro FILE with many small blocks: a tight sync interval forces
    // a sync marker every ~200 bytes, so byte-range splits land mid-file
    val schema = SchemaBuilder.record("big").fields()
      .requiredLong("id").requiredString("payload").endRecord()
    val dir = new java.io.File(tmp("split_one_file"))
    dir.mkdirs()
    val f = new java.io.File(dir, "part-00000.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(200)
    // compressed blocks: sync markers sit BETWEEN deflate blocks, so
    // byte-range splitting must work on compressed files too
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(3))
    w.create(schema, f)
    (0 until 5000).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong)
      // high-entropy payload so deflate can't shrink the file below the
      // size needed to produce multiple byte-range splits
      r.put("payload", (0 until 4).map(j =>
        java.lang.Long.toHexString((i * 4L + j) * 0x9E3779B97F4A7C15L)).mkString("-"))
      w.append(r)
    }
    w.close()
    assert(f.length() > 64 * 1024, "fixture must be big enough to split")

    val whole = GraftAvro.read(spark, dir.getPath) // default split: 1 task
    assert(whole.rdd.getNumPartitions == 1)
    val split = GraftAvro.read(spark, dir.getPath, maxSplitBytes = 16 * 1024)
    assert(split.rdd.getNumPartitions > 1,
      s"expected >1 split task, got ${split.rdd.getNumPartitions}")
    // exactly-once across block-ownership boundaries: same multiset of rows
    assert(split.count() == 5000)
    assert(split.select("id").as[Long].collect().sorted.toSeq == (0L until 5000L))
    assert(split.orderBy("id").collect().toSeq ==
      whole.orderBy("id").collect().toSeq)
  }

  test("DV positions are split-stable: previousSync agrees between a " +
       "sequential read and a mid-file sync") {
    // the deletion-vector encoding packs (block sync offset, in-block
    // record ordinal); a DV written by a whole-file scan is applied by
    // byte-range split readers that sync() into the middle — so the
    // block offset previousSync() reports MUST be identical on both
    // paths. This pins that invariant against the runtime avro jar.
    val schema = SchemaBuilder.record("pos").fields()
      .requiredLong("id").requiredString("payload").endRecord()
    val dir = new java.io.File(tmp("pos_stability"))
    dir.mkdirs()
    val f = new java.io.File(dir, "part-00000.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(200)
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(3))
    w.create(schema, f)
    (0 until 3000).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong)
      r.put("payload", (0 until 4).map(j =>
        java.lang.Long.toHexString((i * 4L + j) * 0x9E3779B97F4A7C15L)).mkString("-"))
      w.append(r)
    }
    w.close()
    val conf = spark.sparkContext.hadoopConfiguration
    val len = f.length()
    def positions(start: Long, end: Long): Seq[(Long, Long)] = {
      val open = new java.util.ArrayList[AutoCloseable]()
      try GraftAvro.splitRowsPos(conf, schema.toString, f.getPath,
          start, end, Some(Seq("id")), r => open.add(r): Unit,
          r => open.remove(r): Unit)
        .map { case (pos, row) => (row.getLong(0), pos) }.toSeq
      finally open.asScala.foreach(c =>
        try c.close() catch { case _: Exception => () })
    }
    val whole = positions(0, len).toMap
    assert(whole.size === 3000, "every row gets a distinct position")
    // byte-range splits covering the file: each row's position must match
    // the whole-file read's exactly
    val step = len / 7
    val split = (0 until 7).flatMap { i =>
      positions(i * step, if (i == 6) len else (i + 1) * step)
    }
    assert(split.size === 3000, "splits own each block exactly once")
    split.foreach { case (id, pos) =>
      assert(whole(id) === pos,
        s"row $id: split position $pos != sequential ${whole(id)}")
    }
    // and multiple blocks exist, or the test proves nothing
    assert(whole.values.map(_ >> 24).toSet.size > 5,
      "fixture must span many avro blocks")
  }

  test("schema-mismatched part file fails with the file named") {
    val schemaFull = SchemaBuilder.record("ev").fields()
      .requiredLong("id").requiredString("extra").endRecord()
    val schemaMissing = SchemaBuilder.record("ev").fields()
      .requiredLong("id").endRecord()
    val dir = new java.io.File(tmp("mismatch"))
    dir.mkdirs()
    def put(name: String, schema: Schema): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(dir, name))
      val r = new GenericData.Record(schema)
      r.put("id", 1L)
      if (schema.getField("extra") != null) r.put("extra", "e")
      w.append(r)
      w.close()
    }
    // driver schema comes from the lexicographically-first part (full);
    // the second part lacks `extra` with no default -> unresolvable
    put("part-00000.avro", schemaFull)
    put("part-00001.avro", schemaMissing)
    val e = intercept[Exception] {
      GraftAvro.read(spark, dir.getPath).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m =>
      m.contains("part-00001.avro") && m.contains("extra")),
      s"error chain should name the bad part file: ${chain(e).mkString(" | ")}")
  }

  test("write refuses an existing path unless overwrite = true") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s")
    val path = tmp("overwrite_guard")
    GraftAvro.write(df, path, overwrite = true) // tmp dir may persist across runs
    intercept[IllegalArgumentException] {
      GraftAvro.write(df, path)
    }
    GraftAvro.write(df, path, overwrite = true)
    assert(GraftAvro.read(spark, path).count() == 1)
  }

  test("write emits one part per partition and roundtrips types incl. nulls") {
    import spark.implicits._
    val src = Seq(
      (1L, Some("a"), java.sql.Timestamp.valueOf("2024-06-01 12:00:00.123456"),
        Seq(1.0, 2.5), BigDecimal("12.34")),
      (2L, None, java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        Seq.empty[Double], BigDecimal("-0.01")))
      .toDF("id", "s", "ts", "vs", "dec")
      .withColumn("dec", org.apache.spark.sql.functions
        .col("dec").cast(org.apache.spark.sql.types.DecimalType(10, 2)))
      .repartition(3)
    val path = tmp("write_parts")
    GraftAvro.write(src, path, codec = "deflate", overwrite = true)
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length == 3)
    val back = GraftAvro.read(spark, path).orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getTimestamp(2).getNanos == 123456000)
    assert(back(1).isNullAt(1))
    assert(back(1).getDecimal(4) == new java.math.BigDecimal("-0.01"))
  }

  test("an empty frame roundtrips as an empty frame with the right schema") {
    import spark.implicits._
    // an empty filtered frame optimizes to a zero-partition RDD: the
    // writer must still stamp a schema-carrying part
    val src = Seq((1L, "a")).toDF("id", "s")
      .filter(org.apache.spark.sql.functions.col("id") < 0)
    val path = tmp("empty")
    GraftAvro.write(src, path, overwrite = true)
    val back = GraftAvro.read(spark, path)
    assert(back.schema.fieldNames.toSeq === Seq("id", "s"))
    assert(back.count() === 0)
  }
}
