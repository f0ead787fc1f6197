package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.OrderedOps

class OrderedOpsSpec extends AnyFunSuite {

  test("withGlobalRowNumber matches a global sort (unique keys)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.sparkContext.parallelize(
      scala.util.Random.shuffle((1 to 1000).toList), 7).toDF("k")
    val got = OrderedOps.withGlobalRowNumber(df, "pos", Seq(col("k")))
      .select("k", "pos").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.zipWithIndex.forall { case ((k, pos), i) => k == i + 1 && pos == i + 1 })
  }

  test("withGlobalRowNumber on empty input") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq.empty[Int].toDF("k")
    assert(OrderedOps.withGlobalRowNumber(df, "pos", Seq(col("k"))).count() == 0)
  }

  test("withGlobalRowNumber honors desc + nulls-first ordering") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(Some(3), None, Some(1), Some(2)).toDF("k")
    val got = OrderedOps.withGlobalRowNumber(df, "pos",
      Seq(col("k").desc_nulls_first))
      .select("k", "pos").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getLong(1))
      .toMap
    assert(got == Map(None -> 1L, Some(3) -> 2L, Some(2) -> 3L, Some(1) -> 4L))
  }

  test("plan has no single-task global Window over the data") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 100).toDF("k")
    val plan = OrderedOps.withGlobalRowNumber(df, "pos", Seq(col("k")))
      .queryExecution.optimizedPlan.toString
    // every Window node must carry a partitionSpec (windowing by __gpid or
    // over the tiny counts frame); a bare windowspecdefinition() with empty
    // partition list over the main data would start with 'windowspecdefinition(k'
    assert(!plan.contains("windowspecdefinition(k#"), plan)
  }

  test("withGlobalFfill equals a sequential scan, nulls spanning partition boundaries") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 200 rows over 32 range partitions (~6 rows each); long null runs make
    // many partitions start with a null, forcing the cross-partition carry;
    // keys 0-9 are all-null so the leading rows must stay null.
    val vals: Seq[(Long, Option[Double])] = (0L until 200L).map { k =>
      k -> (if (k < 10 || (k % 13) < 8) None else Some(k * 1.5))
    }
    val df = vals.map { case (k, v) => (k, v.map(Double.box).orNull) }
      .toDF("k", "v").withColumn("v", col("v").cast("double"))
    val got = OrderedOps.withGlobalFfill(df, col("v"), "f", Seq(col("k")))
      .select("k", "f").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    var carry: Option[Double] = None
    vals.foreach { case (k, v) =>
      if (v.isDefined) carry = v
      assert(got(k) == carry, s"key $k: got ${got(k)}, want $carry")
    }
  }

  test("withGlobalRolling equals a sequential window, tiny blocks forcing replication") {
    val spark = TestSpark.spark
    import spark.implicits._
    val w = 3
    val vals = (0L until 100L).map(k => (k, k * 7 % 23))
    val df = vals.toDF("k", "v")
    val got = OrderedOps
      .withGlobalRolling(df, col("v"), "s", "n", Seq(col("k")), w, block = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    vals.zipWithIndex.foreach { case ((k, _), i) =>
      val frame = vals.slice(math.max(0, i - (w - 1)), i + 1).map(_._2)
      assert(got(k) == ((frame.sum, frame.size.toLong)), s"key $k")
    }
  }
}
