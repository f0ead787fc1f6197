package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{PolyHashImpl, WordShinglesImpl}
import graft.text.TextFunctions

/** Property-style tests (seeded fuzz) for the native codegen expressions
  * against independent reference implementations — the SURVEY §5 stand-in
  * for cuDF's rand_dataframe fuzzers.
  */
class ExpressionsSpec extends AnyFunSuite {

  private def refPolyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)

  private val rnd = new scala.util.Random(42)
  private def randText(): String = {
    val alphabet = "abcXYZ019 _  "
    (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  test("PolyHashImpl matches the reference fold (fuzz + edges)") {
    for (_ <- 1 to 500) {
      val s = randText()
      assert(PolyHashImpl.hash(UTF8String.fromString(s)) == refPolyHash(s), s"input=[$s]")
    }
    assert(PolyHashImpl.hash(UTF8String.fromString("")) == 0L)
    assert(PolyHashImpl.hash(UTF8String.fromString("héllo")) == refPolyHash("héllo"))
  }

  test("WordShinglesImpl matches a naive sliding-window reference (fuzz)") {
    def ref(s: String, n: Int): Seq[String] = {
      val toks = s.split(" ", -1)
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(_.mkString("_")).toSeq.distinct
    }
    for (_ <- 1 to 500) {
      val s = randText()
      val n = 1 + rnd.nextInt(4)
      val got = WordShinglesImpl.eval(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got == ref(s, n), s"input=[$s] n=$n")
    }
  }

  test("PolyHash expression evaluates in a DataFrame (codegen path)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "x_y z")
    val rows = inputs.toDF("s")
      .select(TextFunctions.polyHash(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == inputs.map(refPolyHash))
  }

  test("PolyHash of null is null") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(TextFunctions.polyHash(col("s")).as("h")).collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
  }

  test("JaccardSim equals the builtin intersect/union formula (fuzz)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1 to 300).map { _ =>
      def arr() = (0 until rnd.nextInt(12)).map(_ => s"t${rnd.nextInt(15)}").distinct
      (arr(), arr())
    }
    val df = rows.toDF("a", "b").select(
      TextFunctions.jaccard(col("a"), col("b")).as("fast"),
      try_divide(size(array_intersect(col("a"), col("b"))).cast("double"),
        size(array_union(col("a"), col("b")))).as("ref"))
    // builtin yields null on empty/empty; JaccardSim defines it as 0.0
    val bad = df.filter(
      !(col("fast") === col("ref") || (col("ref").isNull && col("fast") === 0.0))).count()
    assert(bad == 0)
  }

  test("CosineSim equals the HOF dot/(norm·norm) fold bit-for-bit (fuzz)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1 to 300).map { _ =>
      def vec() = (0 until 16).map(_ => rnd.nextDouble() * 2 - 1)
      (vec(), vec())
    }
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (x, y) => x + y)
    val hofNorm = (c: org.apache.spark.sql.Column) =>
      sqrt(aggregate(transform(c, x => x * x), lit(0.0), (x, y) => x + y))
    val df = rows.toDF("a", "b").select(
      graft.functions.GF.cosine(col("a"), col("b")).as("fast"),
      (hofDot / (hofNorm(col("a")) * hofNorm(col("b")))).as("ref"))
    // exact equality — the kernel folds in the same order as the lambdas
    assert(df.filter(not(col("fast") === col("ref"))).count() == 0)
    // unequal lengths → NULL, mirroring zip_with
    val mix = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(mix.select(graft.functions.GF.cosine(col("a"), col("b"))).head.isNullAt(0))
    // a null ELEMENT → NULL, mirroring the HOF fold's null propagation
    // (not a garbage 0.0 read) — pins the nullable-element contract
    val withNull = Seq((Seq[java.lang.Double](1.0, null, 3.0),
      Seq[java.lang.Double](1.0, 2.0, 3.0))).toDF("a", "b")
    assert(withNull.select(graft.functions.GF.cosine(col("a"), col("b"))).head.isNullAt(0))
  }

  test("shingles expression equals builtin pipeline on real documents") {
    val spark = TestSpark.spark
    val docs = Tables.documents(spark, TestSpark.sfDir).limit(50)
    val builtin = array_distinct(
      TextFunctions.wordNgrams(split(col("text"), " "), 3))
    val diff = docs.select(
      TextFunctions.shingles(col("text")).as("fast"), builtin.as("ref"))
      .filter(not(col("fast") === col("ref")))
      .count()
    assert(diff == 0)
  }

  test("shingleHashes equals distinct(polyHash(shingles)) on real documents") {
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val ref = array_distinct(transform(
      TextFunctions.shingles(col("text")), s => TextFunctions.polyHash(s)))
    val diff = docs.select(
      TextFunctions.shingleHashes(col("text")).as("fast"), ref.as("ref"))
      .filter(not(col("fast") === col("ref")))
      .count()
    assert(diff == 0)
  }

  test("spanHashes equals per-window polyHash(ngram) with duplicates " +
       "kept, in window order (real documents)") {
    val spark = TestSpark.spark
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val ref = transform(
      TextFunctions.wordNgrams(TextFunctions.tokenize(col("text")), 8),
      g => TextFunctions.polyHash(g))
    val diff = docs
      .filter(size(TextFunctions.tokenize(col("text"))) >= 8)
      .select(TextFunctions.spanHashes(col("text"), 8).as("fast"),
        ref.as("ref"))
      .filter(not(col("fast") === col("ref")))
      .count()
    assert(diff == 0)
  }

  test("SimHashImpl matches the builtin-composed vote form (fuzz + docs)") {
    // scala reference: per-token polyhash, ±1 vote per bit, bit set iff sum>0
    def refSimhash(tokens: Seq[String], bits: Int): Long = {
      val votes = new Array[Int](bits)
      for (t <- tokens; h = refPolyHash(t); j <- 0 until bits)
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
      (0 until bits).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }
    for (_ <- 1 to 300) {
      val toks = Seq.fill(rnd.nextInt(20))(randText().takeWhile(_ != ' '))
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      assert(graft.expressions.SimHashImpl.eval(arr, 16) ==
        refSimhash(toks, 16), s"tokens=$toks")
    }
    // and over real documents, against the builtin composition it replaced
    val spark = TestSpark.spark
    val toks = TextFunctions.tokenize(col("text"))
    val hashes = transform(toks, t => TextFunctions.polyHash(t))
    val builtin = (0 until 16).map { j =>
      when(aggregate(hashes, lit(0L),
        (s, h) => s + when(shiftright(h, j) % 2 === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    val diff = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(TextFunctions.simhash(toks, 16).as("fast"), builtin.as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("BoundBucketImpl binary search matches a linear reference (fuzz)") {
    def refSearch(bounds: Seq[Long], v: Long): Int =
      bounds.lastIndexWhere(_ <= v)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(12)
      val bounds = Seq.fill(n)(rnd.nextLong() % 1000).sorted.distinct
      val v = rnd.nextLong() % 1200
      val arr: Array[Any] = bounds.map(Long.box(_): Any).toArray
      assert(graft.expressions.BoundBucketImpl.search(arr, v)
        === refSearch(bounds, v), s"bounds=$bounds v=$v")
    }
    // string family
    val sArr: Array[Any] =
      Array("b", "d", "f").map(s => UTF8String.fromString(s): Any)
    assert(graft.expressions.BoundBucketImpl
      .search(sArr, UTF8String.fromString("a")) === -1)
    assert(graft.expressions.BoundBucketImpl
      .search(sArr, UTF8String.fromString("d")) === 1)
    assert(graft.expressions.BoundBucketImpl
      .search(sArr, UTF8String.fromString("z")) === 2)
  }

  test("BoundBucket expression evaluates through codegen in a DataFrame") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.graft.Bridge
    val bounds: Array[Any] = Array(Long.box(0L), Long.box(100L), Long.box(200L))
    val got = Seq(-5L, 0L, 99L, 150L, 200L, 999L).toDF("v")
      .select(col("v"), Bridge.column(graft.expressions.BoundBucket(
        bounds, Bridge.expression(col("v")))).as("b"))
      .orderBy("v").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((-5L, -1), (0L, 0), (99L, 0), (150L, 1),
      (200L, 2), (999L, 2)))
  }
}
