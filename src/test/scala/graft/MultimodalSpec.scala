package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, HeaderCodec}

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("synthesize → decodeHeader roundtrips metadata as column exprs") {
    import spark.implicits._
    val df = Seq((40, 30, "payload-bytes")).toDF("w", "h", "p")
      .select(Multimodal.synthImageBytes(col("w"), col("h"), col("p")).as("bytes"))
    val meta = Multimodal.decodeHeader(col("bytes"))
    val r = df.select(
      meta.getField("width"), meta.getField("height"), meta.getField("format"),
      octet_length(Multimodal.payloadBytes(col("bytes")))).collect()(0)
    assert((r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3)) == ((40, 30, "IMG", 13)))
  }

  test("decodeBatch runs the codec per partition over typed assets") {
    import spark.implicits._
    val assets = Seq(
      Asset(1L, "IMG00400030abc".getBytes("UTF-8")),
      Asset(2L, "IMG01280256xyzw".getBytes("UTF-8"))).toDS().repartition(2)
    val got = Multimodal.decodeBatch(assets, HeaderCodec)
      .collect().sortBy(_.asset_id)
    assert(got(0).width == 40 && got(0).height == 30 && got(0).payloadLen == 3)
    assert(got(1).width == 128 && got(1).height == 256 && got(1).format == "IMG")
    // checksum is the polyHash fold over payload bytes
    val ck = "abc".getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(got(0).checksum == ck)
  }

  test("ImageIoCodec decodes real JPEG and PNG bytes from the JDK encoders") {
    import spark.implicits._
    // build real bitstreams with the JDK's own encoders — a foreign path
    // relative to the decoder under test
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val assets = Seq(
      Asset(1L, encode("jpeg", 8, 5)),
      Asset(2L, encode("png", 3, 9))).toDS()
    val got = Multimodal.decodeBatch(assets, Multimodal.ImageIoCodec)
      .collect().sortBy(_.asset_id)
    assert(got(0).width == 8 && got(0).height == 5)
    assert(got(0).format.contains("jpeg") || got(0).format.contains("jpg"))
    assert(got(1).width == 3 && got(1).height == 9 && got(1).format == "png")
    // PNG is lossless: the raster checksum must equal the source fold
    var ck = 0L
    for (y <- 0 until 9; x <- 0 until 3)
      ck = (ck * 31 + ((x * 31 + y) & 0xffffff)) % 1000000007L
    assert(got(1).checksum == ck)
    // non-image bytes fail loudly, not silently
    intercept[Exception] {
      Multimodal.ImageIoCodec.decode(Array[Byte](1, 2, 3))
    }
  }

  test("WavCodec parses a JDK-encoded WAV: rate, channels, bits, duration") {
    import spark.implicits._
    // real WAV bytes from javax.sound (a foreign encoder path): 300 frames
    // of 16-bit stereo at 8 kHz
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = new Array[Byte](300 * 4)
    for (i <- pcm.indices) pcm(i) = ((i * 7) % 251).toByte
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 300L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = Multimodal.decodeWavBatch(Seq(Asset(9L, bos.toByteArray)).toDS())
      .collect()(0)
    assert(got.asset_id == 9L && got.sampleRate == 8000 &&
      got.channels == 2 && got.bitsPerSample == 16 && got.nFrames == 300L)
    assert(math.abs(got.durationMs - 37.5) < 1e-9)
    intercept[Exception] {
      Multimodal.WavCodec.decode("nota wav".getBytes)
    }
  }

  test("WavCodec fails fast on crafted chunk sizes instead of spinning") {
    def wav(chunks: (String, Array[Byte])*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      bos.write("RIFF".getBytes); bos.write(le32(0)); bos.write("WAVE".getBytes)
      chunks.foreach { case (id, body) =>
        bos.write(id.getBytes); bos.write(le32(body.length)); bos.write(body)
      }
      bos.toByteArray
    }
    // a chunk size of 0xFFFFFFF8 used to wrap to Int -8 -> zero/negative
    // advance -> infinite executor-task spin; now it must throw promptly
    val evil = wav(("fmt ", new Array[Byte](16)))
    val sizeOff = evil.length - 16 - 4 // the fmt size field
    val crafted = evil.clone()
    crafted(sizeOff) = 0xF8.toByte; crafted(sizeOff + 1) = 0xFF.toByte
    crafted(sizeOff + 2) = 0xFF.toByte; crafted(sizeOff + 3) = 0xFF.toByte
    val e1 = intercept[IllegalArgumentException] { Multimodal.WavCodec.decode(crafted) }
    assert(e1.getMessage.contains("malformed RIFF"))
    // truncated fmt chunk (12 declared bytes, fields read up to +16)
    val short = wav(("fmt ", new Array[Byte](12)))
    val e2 = intercept[IllegalArgumentException] { Multimodal.WavCodec.decode(short) }
    assert(e2.getMessage.contains("fmt"))
    // an unknown chunk claiming bytes past the payload end
    val overrun = wav(("LIST", new Array[Byte](4)), ("fmt ", new Array[Byte](16)))
    val listOff = 12 + 4 // LIST size field
    val bad = overrun.clone()
    bad(listOff) = 0x40.toByte // claims 64 bytes, only 4 + fmt follow
    intercept[IllegalArgumentException] { Multimodal.WavCodec.decode(bad) }
  }

  test("crafted image dimensions hit the pixel guard before allocation") {
    // PNG: the JDK reader does NOT verify the IHDR CRC at header-read
    // time (probed: a patched width reports straight through getWidth),
    // so a flipped dimension byte reaches the raster allocation
    // unchallenged — exactly the shape a corrupt or adversarial asset
    // takes at ingest. (BMP is safe by accident: its reader checks
    // width×height against the data size.)
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val b = bos.toByteArray
    // IHDR width big-endian at offset 16: claim 2^25 pixels wide (×4 high
    // = 2^27 > the 2^26 guard; without the guard this is a >512 MB
    // allocation attempt inside r.read)
    b(16) = 0x02.toByte; b(17) = 0x00.toByte
    b(18) = 0x00.toByte; b(19) = 0x00.toByte
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode(b)
    }
    assert(e.getMessage.contains("decode guard"), e.getMessage)
  }

  test("fuzzed payloads decode or throw — never hang, never OOM") {
    // seeded mutation sweep over REAL encoder output: byte flips and
    // truncations of valid JPEG/PNG/BMP/WAV payloads. The contract under
    // test is executor-safety — every mutant either decodes or raises a
    // catchable exception promptly; any spin or giant allocation shows up
    // as a suite-visible hang/OOM here with a replayable seed.
    val rnd = new scala.util.Random(20260813L)
    def mutate(src: Array[Byte]): Array[Byte] = {
      val base = rnd.nextInt(3) match {
        case 0 => src.clone()
        case 1 => src.take(1 + rnd.nextInt(src.length)) // truncate
        case _ => src ++ Array.fill(rnd.nextInt(16))(rnd.nextInt(256).toByte)
      }
      if (base.nonEmpty)
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte }
      base
    }
    def image(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, x * 31 + y)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val wav = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
      val pcm = new Array[Byte](64 * 4)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, 64L),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    var decoded = 0; var rejected = 0
    def fuzz(src: Array[Byte], rounds: Int)(dec: Array[Byte] => Any): Unit =
      (0 until rounds).foreach { _ =>
        try { dec(mutate(src)); decoded += 1 }
        catch { case scala.util.control.NonFatal(_) => rejected += 1 }
      }
    fuzz(image("jpeg"), 500)(Multimodal.ImageIoCodec.decode)
    fuzz(image("png"), 500)(Multimodal.ImageIoCodec.decode)
    fuzz(image("bmp"), 500)(Multimodal.ImageIoCodec.decode)
    fuzz(wav, 1500)(Multimodal.WavCodec.decode)
    assert(decoded + rejected === 3000)
    // both outcomes must occur, or the sweep isn't exercising anything
    assert(decoded > 0, "no mutant decoded — mutation too destructive")
    assert(rejected > 0, "no mutant rejected — mutation too gentle")
  }

  test("sampleFrameOffsets picks every stride-th frame") {
    import spark.implicits._
    val got = Seq(7).toDF("n")
      .select(Multimodal.sampleFrameOffsets(col("n"), 1024, 3).as("o"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(1L, 3073L, 6145L))
  }
}
