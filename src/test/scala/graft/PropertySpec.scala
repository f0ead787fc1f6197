package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GF
import graft.text.TextFunctions

/** Property layer: ScalaCheck generators in the role of the reference's
  * `rand_dataframe`/fuzzer (cudf/testing/dataset_generator.py:183,
  * _fuzz_testing) — randomized dtype/null/cardinality mixes, FIXED seed so
  * the gate is deterministic. Each property materializes one seeded sample
  * batch as a single DataFrame and compares against an independent
  * Scala-side reference fold (the same pattern as the reference's
  * cudf-vs-pandas `assert_eq`, with plain Scala as the oracle).
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("pymod matches Python sign semantics on random operand mixes") {
    import spark.implicits._
    val cases = sample(Gen.listOfN(500, for {
      a <- Gen.chooseNum(-1000000L, 1000000L)
      b <- Gen.chooseNum(-999L, 999L).suchThat(_ != 0L)
    } yield (a, b)), 42L)
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), GF.pymod(col("a"), col("b")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, m) =>
      val ref = ((a % b) + b) % b // python: result carries the divisor's sign
      assert(m == ref, s"pymod($a, $b) = $m, want $ref")
      assert(if (b > 0) m >= 0 && m < b else m <= 0 && m > b, s"range: pymod($a, $b) = $m")
    }
  }

  test("PolyHash equals the documented fold on random ASCII strings") {
    import spark.implicits._
    val strGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126)).map(_.map(_.toChar).mkString))
    val cases = sample(Gen.listOfN(200, strGen), 7L)
    val got = cases.toDF("s")
      .select(col("s"), TextFunctions.polyHash(col("s")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got.foreach { case (s, h) =>
      val ref = s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
      assert(h == ref, s"polyHash('$s') = $h, want $ref")
    }
  }

  test("JaccardSim is bounded, symmetric, and 1 on self for random token sets") {
    import spark.implicits._
    val toksGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf((0 until 15).map(i => s"t$i"))))
    val cases = sample(Gen.listOfN(200, for {
      a <- toksGen; b <- toksGen
    } yield (a, b)), 11L)
    val got = cases.toDF("a", "b").select(
      col("a"), col("b"),
      TextFunctions.jaccard(col("a"), col("b")).as("jab"),
      TextFunctions.jaccard(col("b"), col("a")).as("jba"),
      TextFunctions.jaccard(col("a"), col("a")).as("jaa"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getSeq[String](0).toSet, r.getSeq[String](1).toSet)
      val (jab, jba, jaa) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val ref = if (a.isEmpty && b.isEmpty) 0.0
        else (a & b).size.toDouble / (a | b).size
      assert(jab == ref, s"jaccard($a, $b) = $jab, want $ref")
      assert(jab == jba, "symmetry")
      assert(jaa == (if (a.isEmpty) 0.0 else 1.0), "self-similarity")
    }
  }

  test("two-phase global cumsum equals a sequential prefix scan, any layout") {
    import spark.implicits._
    val cases = sample(Gen.listOfN(300, Gen.chooseNum(-50L, 50L)), 23L)
    for (parts <- Seq(1, 5, 32)) {
      val df = spark.sparkContext
        .parallelize(cases.zipWithIndex.map { case (v, i) => (i.toLong, v) }, parts)
        .toDF("i", "v")
      val got = graft.ops.OrderedOps.withRunningTotal(df, col("v"), "cum", Seq(col("i")))
        .orderBy("i").select("cum").as[Long].collect().toSeq
      val ref = cases.scanLeft(0L)(_ + _).tail
      assert(got == ref, s"parts=$parts")
    }
  }

  test("aligned Series add is commutative and labels the union, random label sets") {
    import spark.implicits._
    val entryGen = for {
      k <- Gen.chooseNum(0, 60)
      v <- Gen.option(Gen.chooseNum(-100, 100))
    } yield (k.toLong, v.map(_.toDouble))
    // distinct labels per side (the facade's standing unique-index contract)
    def side(seed: Long) =
      sample(Gen.listOfN(40, entryGen), seed).distinctBy(_._1)
    val (la, lb) = (side(31L), side(37L))
    val a = la.toDF("k", "v")
    val b = lb.toDF("k", "v")
    import graft.frame.GdfSeries
    def run(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      GdfSeries(x, "k", "v").add(GdfSeries(y, "k", "v"), "s", fill = Some(lit(0.0)))
        .toDF.collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
    val ab = run(a, b)
    val ba = run(b, a)
    assert(ab == ba, "commutativity under fill")
    assert(ab.keySet == (la.map(_._1) ++ lb.map(_._1)).toSet, "label union")
    val ma = la.toMap; val mb = lb.toMap
    ab.foreach { case (k, got) =>
      val (x, y) = (ma.get(k).flatten, mb.get(k).flatten)
      val ref = if (x.isEmpty && y.isEmpty) None
        else Some(x.getOrElse(0.0) + y.getOrElse(0.0))
      assert(got == ref, s"label $k: got $got, want $ref (x=$x, y=$y)")
    }
  }

  test("minhash signature equals the scalar permutation-hash fold, random fingerprint sets") {
    import spark.implicits._
    val k = 6
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, TextFunctions.HashMod - 1))
    val cases = (1L to 40L).map(seed => sample(gen, seed))
    val df = cases.zipWithIndex.map { case (fps, i) => (i, fps) }.toDF("id", "fps")
      .withColumn("sig", TextFunctions.minhashFromFps(col("fps"), k))
    val got = df.collect().map(r => r.getInt(0) -> r.getSeq[Long](2)).toMap
    cases.zipWithIndex.foreach { case (fps, i) =>
      val ref = (0 until k).map(j =>
        fps.map(f => ((2L * j + 1) * f + j * 7919L) % TextFunctions.HashMod).min)
      assert(got(i) == ref, s"case $i")
    }
  }

  test("simhash equals the scalar bit-vote fold, random token hash sets") {
    import spark.implicits._
    val bits = 16
    val gen = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
    val cases = (1L to 30L).map(seed => sample(gen, seed))
    val df = cases.zipWithIndex.map { case (ts, i) => (i, ts) }.toDF("id", "toks")
      .withColumn("sh", TextFunctions.simhash(col("toks"), bits))
    val got = df.collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    def polyRef(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % TextFunctions.HashMod)
    cases.zipWithIndex.foreach { case (ts, i) =>
      val hs = ts.map(polyRef)
      val ref = (0 until bits).map { j =>
        val vote = hs.map(h => if (((h >> j) & 1L) == 1L) 1L else -1L).sum
        if (vote > 0) 1L << j else 0L
      }.sum
      assert(got(i) == ref, s"case $i tokens $ts")
    }
  }

  test("DomainMix.budgetPrefix equals the sequential per-domain prefix, random rows") {
    import spark.implicits._
    import org.scalacheck.Gen
    val gen = Gen.listOfN(300, for {
      src <- Gen.oneOf("a", "b", "c", "d")
      tok <- Gen.choose(1L, 50L)
      hk <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    } yield (src, tok, hk))
    val rows = sample(gen, 7L).zipWithIndex
      .map { case ((s, t, h), i) => (s, t, h, i.toLong) }
    val df = rows.toDF("src", "tok", "hk", "id")
    val budgets = Map("a" -> 200L, "b" -> 350L, "c" -> 50L, "d" -> 1000L)
    val got = graft.ops.DomainMix
      .budgetPrefix(df, "src", "tok", "hk", "id", "cum",
        s => when(s === "a", 200L).when(s === "b", 350L)
          .when(s === "c", 50L).otherwise(1000L),
        keyBits = 64) // hk here is full-range signed, not polyHash-scale
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: per source, hash-order scan keeping cum <= budget
    val ref = rows.groupBy(_._1).flatMap { case (src, rs) =>
      var cum = 0L
      rs.sortBy(r => (r._3, r._4)).flatMap { r =>
        cum += r._2
        if (cum <= budgets(src)) Some(r._4 -> cum) else None
      }
    }.toMap
    assert(got == ref, s"diff: got-extra=${got.toSet -- ref.toSet}, missing=${ref.toSet -- got.toSet}")
  }

  test("spanCoverage interval-merge fold equals the naive per-position scan") {
    import spark.implicits._
    val span = 8
    val gen = Gen.listOf(Gen.choose(0, 60)).map(_.distinct.sorted)
    val cases = (1L to 60L).map(seed => sample(gen, seed))
    val df = cases.zipWithIndex.map { case (ps, i) => (i, ps) }.toDF("id", "dpos")
      .withColumn("cov", TextFunctions.spanCoverage(col("dpos"), span))
    val got = df.collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    cases.zipWithIndex.foreach { case (ps, i) =>
      val ref = ps.flatMap(p => p until (p + span)).distinct.size.toLong
      assert(got(i) == ref, s"case $i positions $ps: got ${got(i)}, want $ref")
    }
  }

  test("random decimals roundtrip the foreign ORC writer bit-exactly") {
    // fuzz the raw-ORC decimal path the io_orc_foreign_decimal fixture
    // exercises: random unscaled values across the full precision range,
    // including negatives, zero, and the max magnitudes for (9,2)/(20,4)
    val gen = for {
      u9 <- Gen.chooseNum(-999999999L, 999999999L)
      u20 <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
    } yield (java.math.BigDecimal.valueOf(u9, 2),
      java.math.BigDecimal.valueOf(u20, 4))
    val decs = sample(Gen.listOfN(400, gen), 23L) ++ Seq(
      (new java.math.BigDecimal("9999999.99"), new java.math.BigDecimal("9999999999999999.9999")),
      (new java.math.BigDecimal("-9999999.99"), new java.math.BigDecimal("-9999999999999999.9999")),
      (java.math.BigDecimal.valueOf(0, 2), java.math.BigDecimal.valueOf(0, 4)))
    val rows = decs.zipWithIndex.map { case ((d9, d20), i) => (i.toLong, i, d9, d20) }
    val path = s"${sys.props("java.io.tmpdir")}/graft_prop/orc_dec"
    graft.io.ForeignOrc.writeDecimals(path, rows, stripeEvery = 100)
    val back = spark.read.orc(path).orderBy("l_orderkey").collect()
    assert(back.length == rows.length)
    rows.zip(back).foreach { case ((k, _, d9, d20), r) =>
      assert(r.getLong(0) == k)
      assert(r.getDecimal(2).compareTo(d9) == 0, s"row $k d9: ${r.getDecimal(2)} != $d9")
      assert(r.getDecimal(3).compareTo(d20) == 0, s"row $k d20: ${r.getDecimal(3)} != $d20")
    }
  }

  test("random typed rows roundtrip feather bit-exactly across codecs") {
    // fuzz the Arrow IPC write→read pair the io_feather_* queries ride:
    // random nulls, unicode strings, full-range longs, decimal scales,
    // dates, micro timestamps, and variable-length double lists — any
    // value the schema mapping claims to support must survive unchanged
    import spark.implicits._
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      // incl. a surrogate-pair emoji: UTF-8 4-byte sequences must survive
      Gen.listOfN(6, Gen.oneOf("ß", "λ", "中", "🚀", "\t", "\""))
        .map(_.mkString))
    val rowGen = for {
      l <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      s <- Gen.option(strGen)
      d <- Gen.option(Gen.chooseNum(-1e9, 1e9))
      unscaled <- Gen.chooseNum(-99999999999L, 99999999999L)
      days <- Gen.chooseNum(-30000, 30000) // ~1888..2052
      micros <- Gen.chooseNum(-4102444800L, 4102444800L) // ±2100 in seconds
      xs <- Gen.listOfN(3, Gen.chooseNum(-1e6, 1e6))
      n <- Gen.chooseNum(0, 3)
    } yield (l, s, d, BigDecimal(java.math.BigDecimal.valueOf(unscaled, 3)),
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong)),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(micros, 123456000L)),
      xs.take(n))
    val rows = sample(Gen.listOfN(300, rowGen), 41L)
    val src = rows.toDF("l", "s", "d", "dec", "day", "at", "xs")
    for ((codec, batch) <- Seq(("none", 64), ("lz4", 300), ("zstd", 4096))) {
      val path = s"${sys.props("java.io.tmpdir")}/graft_prop/feather_$codec"
      graft.io.GraftFeather.write(src, path, codec = codec,
        overwrite = true, batchSize = batch)
      val back = graft.io.GraftFeather.read(spark, path)
      assert(back.count() == 300, s"codec $codec")
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
        s"codec $codec batch $batch: roundtrip drift")
    }
  }

  test("random bit patterns read back as their unsigned parquet values") {
    // fuzz the UINT widening path: arbitrary raw bits in each physical
    // width must surface as the unsigned interpretation in the widened type
    val gen = for {
      u8 <- Gen.chooseNum(0, 255)
      u16 <- Gen.chooseNum(0, 65535)
      u32 <- Gen.chooseNum(0L, 4294967295L)
      u64 <- Gen.chooseNum(Long.MinValue, Long.MaxValue) // raw signed bits
    } yield (u8, u16, u32, u64)
    val cases = sample(Gen.listOfN(400, gen), 29L) ++ Seq(
      (255, 65535, 4294967295L, -1L), // all-ones in every width
      (0, 0, 0L, 0L),
      (128, 32768, 2147483648L, Long.MinValue)) // exactly the sign bit
    val rows = cases.zipWithIndex.map { case ((a, b, c, d), i) => (i.toLong, a, b, c, d) }
    val path = s"${sys.props("java.io.tmpdir")}/graft_prop/parquet_unsigned"
    graft.io.ForeignParquet.writeUnsigned(path, rows)
    val back = spark.read.parquet(path).orderBy("okey").collect()
    assert(back.length == rows.length)
    val two64 = java.math.BigInteger.ONE.shiftLeft(64)
    rows.zip(back).foreach { case ((k, u8, u16, u32, u64raw), r) =>
      assert(r.getLong(0) == k)
      assert(r.getShort(1).toInt == u8)
      assert(r.getInt(2) == u16)
      assert(r.getLong(3) == u32)
      val expected = {
        val bi = java.math.BigInteger.valueOf(u64raw)
        if (u64raw < 0) bi.add(two64) else bi
      }
      assert(r.getDecimal(4).toBigInteger == expected,
        s"row $k u64: ${r.getDecimal(4)} != $expected (raw $u64raw)")
    }
  }
}
