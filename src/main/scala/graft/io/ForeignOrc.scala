package graft.io

import java.util.TimeZone

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.common.`type`.HiveDecimal
import org.apache.hadoop.hive.ql.exec.vector.{DecimalColumnVector, LongColumnVector, TimestampColumnVector}
import org.apache.orc.{OrcFile, TypeDescription}

/** FOREIGN ORC fixture writer: the raw orc-core Writer API, not Spark's
  * DataSource — a second engine path, so reading these files with the
  * modern Spark ORC reader exercises decode branches a Spark self-roundtrip
  * never touches (mirrors the reference's binary ORC fixtures:
  * python/cudf/cudf/tests/data/orc/TestOrcFile.decimal.orc,
  * TestOrcFile.gmt.orc — timezone stripes, TestOrcFile.RLEv2.orc,
  * exercised by python/cudf/cudf/tests/test_orc.py).
  *
  * Fixture-construction only: rows arrive pre-collected (bounded, ≤ a few
  * thousand) because the raw writer is a single-file driver-side API. The
  * QUERIES that read the fixtures stay fully distributed — this class is
  * the test-corpus generator, not a data path.
  */
object ForeignOrc {

  private def newWriter(file: String, schema: TypeDescription,
                        stripeSize: Long = 64L << 20) = {
    val conf = new Configuration()
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
    Option(p.getParent).foreach(fs.mkdirs(_))
    OrcFile.createWriter(p, OrcFile.writerOptions(conf)
      .setSchema(schema).stripeSize(stripeSize).overwrite(true))
  }

  /** Decimal fixture (TestOrcFile.decimal.orc shape): DECIMAL(9,2) — the
    * precision a modern writer could pack into RLE'd integers — alongside
    * DECIMAL(20,4), which crosses the 18-digit boundary into the unscaled
    * big-integer encoding. `stripeEvery` forces an intermediate footer (=
    * stripe flush) every N rows so the file carries MULTIPLE stripes, pinning
    * the per-stripe decimal decode, not just a single-stripe happy path. */
  def writeDecimals(path: String,
                    rows: Seq[(Long, Int, java.math.BigDecimal, java.math.BigDecimal)],
                    stripeEvery: Int = 500): Unit = {
    val schema = TypeDescription.fromString(
      "struct<l_orderkey:bigint,l_linenumber:int,price_d9:decimal(9,2),price_d20:decimal(20,4)>")
    val w = newWriter(s"$path/part-00000.orc", schema)
    val batch = schema.createRowBatch(512)
    val key = batch.cols(0).asInstanceOf[LongColumnVector]
    val ln = batch.cols(1).asInstanceOf[LongColumnVector]
    val d9 = batch.cols(2).asInstanceOf[DecimalColumnVector]
    val d20 = batch.cols(3).asInstanceOf[DecimalColumnVector]
    var written = 0
    rows.foreach { case (k, l, b9, b20) =>
      val i = batch.size
      key.vector(i) = k
      ln.vector(i) = l.toLong
      d9.set(i, HiveDecimal.create(b9))
      d20.set(i, HiveDecimal.create(b20))
      batch.size += 1
      written += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
      if (written % stripeEvery == 0) w.writeIntermediateFooter()
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
  }

  /** RLEv2 fixture (TestOrcFile.RLEv2.orc shape): four BIGINT columns whose
    * value patterns force the RLEv2 sub-encodings — a strictly-increasing
    * key (DELTA), a constant (SHORT_REPEAT), mostly-small values with rare
    * huge outliers (PATCHED_BASE), and a sign-alternating ramp (zigzag
    * DIRECT). The modern reader must drive all four decoders to
    * reconstruct the rows the oracle recomputes arithmetically. */
  def writeRlev2(path: String, rows: Seq[(Long, Long, Long, Long)]): Unit = {
    val schema = TypeDescription.fromString(
      "struct<okey:bigint,rep:bigint,pb:bigint,zz:bigint>")
    val w = newWriter(s"$path/part-00000.orc", schema)
    val batch = schema.createRowBatch(1024)
    val cols = (0 to 3).map(batch.cols(_).asInstanceOf[LongColumnVector])
    rows.foreach { case (a, b, c, d) =>
      val i = batch.size
      cols(0).vector(i) = a; cols(1).vector(i) = b
      cols(2).vector(i) = c; cols(3).vector(i) = d
      batch.size += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
  }

  /** Boolean-with-nulls multi-stripe fixture
    * (TestOrcFile.boolean_corruption_PR_6636.orc shape): ORC booleans are
    * BIT-PACKED eight to a byte, and a null-bearing present stream that
    * crosses stripe/batch boundaries historically desynchronized the bit
    * cursor (the corruption the reference pins). `b` is a dense boolean,
    * `bn` a nullable one; intermediate footers force multiple stripes so
    * the present/data stream realignment happens mid-file. */
  def writeBooleans(path: String,
                    rows: Seq[(Long, Boolean, Option[Boolean])],
                    stripeEvery: Int = 500): Unit = {
    val schema = TypeDescription.fromString(
      "struct<k:bigint,b:boolean,bn:boolean>")
    val w = newWriter(s"$path/part-00000.orc", schema)
    val batch = schema.createRowBatch(512)
    val key = batch.cols(0).asInstanceOf[LongColumnVector]
    val b = batch.cols(1).asInstanceOf[LongColumnVector]
    val bn = batch.cols(2).asInstanceOf[LongColumnVector]
    bn.noNulls = false
    var written = 0
    rows.foreach { case (k, vb, vbn) =>
      val i = batch.size
      key.vector(i) = k
      b.vector(i) = if (vb) 1L else 0L
      vbn match {
        case Some(x) => bn.isNull(i) = false; bn.vector(i) = if (x) 1L else 0L
        case None => bn.isNull(i) = true; bn.vector(i) = 0L
      }
      batch.size += 1
      written += 1
      if (batch.size == batch.getMaxSize) {
        w.addRowBatch(batch); batch.reset(); bn.noNulls = false
      }
      if (written % stripeEvery == 0) w.writeIntermediateFooter()
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
  }

  /** Timezone-stripe fixture (TestOrcFile.gmt.orc shape): ORC stripe
    * footers record the WRITER's timezone, and a correct reader must use
    * it to reconstruct instants written under a different zone. The write
    * runs with the JVM default zone temporarily set to `writerTz`
    * (restored in a finally; driver-side, no Spark job in flight), so the
    * stored epoch bases are e.g. America/Los_Angeles while the reading
    * session is UTC — if the reader ignored the stripe timezone, every
    * instant would shift by the zone offset and the oracle hash would
    * catch it. */
  def writeTimestamps(path: String, rows: Seq[(Long, java.sql.Timestamp)],
                      writerTz: String): Unit = {
    val prev = TimeZone.getDefault
    TimeZone.setDefault(TimeZone.getTimeZone(writerTz))
    try {
      val schema = TypeDescription.fromString(
        "struct<o_orderkey:bigint,ts:timestamp>")
      val w = newWriter(s"$path/part-00000.orc", schema)
      val batch = schema.createRowBatch(1024)
      val key = batch.cols(0).asInstanceOf[LongColumnVector]
      val ts = batch.cols(1).asInstanceOf[TimestampColumnVector]
      rows.foreach { case (k, t) =>
        val i = batch.size
        key.vector(i) = k
        ts.set(i, t)
        batch.size += 1
        if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
      }
      if (batch.size > 0) w.addRowBatch(batch)
      w.close()
    } finally TimeZone.setDefault(prev)
  }
}
