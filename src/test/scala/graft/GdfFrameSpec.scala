package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.frame.GdfFrame

class GdfFrameSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("head/tail return index-ordered slices") {
    import spark.implicits._
    val f = GdfFrame(Seq(5, 3, 9, 1, 7).toDF("i"), "i")
    assert(f.head(2).as[Int].collect().toSeq == Seq(1, 3))
    assert(f.tail(2).as[Int].collect().toSeq == Seq(7, 9))
  }

  test("shift matches a global-window lag for several partition layouts") {
    import spark.implicits._
    for (parts <- Seq(1, 3, 8)) {
      val base = spark.sparkContext
        .parallelize(scala.util.Random.shuffle((1 to 200).toList), parts)
        .toDF("i").withColumn("v", col("i") * 10)
      for (periods <- Seq(1, 3, -1, -2)) {
        val got = GdfFrame(base, "i").shift("v", "prev", periods)
          .select("i", "prev").collect()
          .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
          .toMap
        (1 to 200).foreach { i =>
          val src = i - periods
          val expected = if (src >= 1 && src <= 200) Some(src * 10) else None
          assert(got(i) == expected, s"parts=$parts periods=$periods i=$i")
        }
      }
    }
  }

  test("a frame-scale shift refuses loudly instead of broadcasting the " +
       "edge set through the driver") {
    import spark.implicits._
    val f = GdfFrame(Seq(1, 2, 3).toDF("i"), "i")
    val e = intercept[IllegalArgumentException] {
      f.shift("i", "prev", periods = 10_000_000)
    }
    assert(e.getMessage.contains("partition-edge rows"), e.getMessage)
    assert(e.getMessage.contains("shuffle"), e.getMessage)
  }

  test("diff subtracts the shifted value") {
    import spark.implicits._
    val base = Seq((1, 10.0), (2, 13.0), (3, 11.5)).toDF("i", "v")
    val got = GdfFrame(base, "i").diff("v", "d")
      .select("i", "d").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(1 -> None, 2 -> Some(3.0), 3 -> Some(-1.5)))
  }

  test("concatAxis1 outer-aligns on the index") {
    import spark.implicits._
    val a = GdfFrame(Seq((1, "a1"), (2, "a2")).toDF("k", "a"), "k")
    val b = GdfFrame(Seq((2, "b2"), (3, "b3")).toDF("k", "b"), "k")
    val got = a.concatAxis1(b).df.orderBy("k")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)), Option(r.getString(2)))).toSeq
    assert(got == Seq((1, Some("a1"), None), (2, Some("a2"), Some("b2")), (3, None, Some("b3"))))
  }

  test("withRangeIndex is 0-based and dense") {
    import spark.implicits._
    val f = GdfFrame(Seq("c", "a", "b").toDF("s"), "s").withRangeIndex("pos", col("s"))
    val got = f.df.orderBy("pos").select("pos", "s").as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "a"), (1L, "b"), (2L, "c")))
  }

  test("reindex left-aligns onto the label set with nulls for misses") {
    import spark.implicits._
    val f = GdfFrame(Seq((1, "a"), (3, "c")).toDF("k", "v"), "k")
    val labels = Seq(1, 2, 3).toDF("lbl")
    val got = f.reindex(labels, "lbl").df.orderBy("k")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSeq
    assert(got == Seq((1, Some("a")), (2, None), (3, Some("c"))))
  }

  test("sortIndex produces index-sorted partitions") {
    import spark.implicits._
    val f = GdfFrame(Seq(5, 1, 4, 2, 3).toDF("k"), "k").sortIndex()
    val perPartition = f.df.rdd.mapPartitions(it => Iterator(it.map(_.getInt(0)).toSeq)).collect()
    assert(perPartition.forall(p => p == p.sorted))
  }

  test("shift on empty frame") {
    import spark.implicits._
    val f = GdfFrame(Seq.empty[(Int, Int)].toDF("i", "v"), "i")
    assert(f.shift("v", "prev").count() == 0)
  }

  test("alignedBinop unions columns and labels with fill-before-op semantics") {
    import spark.implicits._
    // left has (x, shared), right has (shared, z); labels 1 left-only,
    // 2 on both, 3 right-only; shared is NULL on both sides at label 4
    val l = Seq((1, Some(10), Some(1)), (2, Some(20), Some(2)), (4, Some(40), None))
      .toDF("i", "x", "shared")
    val r = Seq((2, Some(200), Some(5)), (3, Some(300), Some(6)), (4, None, Some(7)))
      .toDF("i", "shared", "z")
    val out = GdfFrame.alignedBinop(GdfFrame(l, "i"), GdfFrame(r, "i"),
        fill = Some(lit(0)))(_ + _)
      .df.orderBy("i").collect()
      .map(row => row.getInt(0) -> (1 to 3).map(j =>
        if (row.isNullAt(j)) None else Some(row.getInt(j))))
      .toMap
    // columns ordered (i, x, shared, z)
    assert(out(1) == Seq(Some(10), Some(1), None))    // label on left only: z (right-only col) null
    assert(out(2) == Seq(Some(20), Some(202), Some(5))) // shared filled-before-add both sides
    assert(out(3) == Seq(None, Some(300), Some(6)))   // label on right only: x null
    assert(out(4) == Seq(Some(40), None, Some(7)))    // shared NULL on BOTH sides stays null
  }
}
