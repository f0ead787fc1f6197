package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{FeatherChanges, ParquetTable}

/** Write-side schema evolution (the option("mergeSchema","true")
  * contract, sources/WriteSchemaEvolution.scala): the refusal matrix,
  * the widened read, the CDF head schema, and the three faces. */
class WriteEvolutionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_wevo_test/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }

  private def base(path: String, format: String): Unit = {
    import spark.implicits._
    (1 to 50).map(i => (i.toLong, s"p$i")).toDF("id", "pay")
      .repartition(1)
      .write.format(format).mode("overwrite")
      .option("snapshots", "true").save(path)
  }
  private def widened = {
    import spark.implicits._
    (51 to 60).map(i => (i.toLong, s"p$i", i * 0.5))
      .toDF("id", "pay", "score").repartition(1)
  }

  for (format <- Seq("feather", "graft-avro")) {
    test(s"$format: un-opted widening append refuses naming the option; " +
         "with mergeSchema the table widens and old rows read null") {
      val path = tmp(s"widen_$format")
      base(path, format)
      val e = intercept[Exception] {
        widened.write.format(format).mode("append").save(path)
      }
      assert(e.getMessage.contains("mergeSchema"))
      assert(e.getMessage.contains("score"))
      widened.write.format(format).mode("append")
        .option("mergeSchema", "true").save(path)
      val back = spark.read.format(format)
        .option("mergeSchema", "true").load(path)
      assert(back.count() === 60)
      assert(back.filter(col("id") === 1L).select("score").head().isNullAt(0))
      assert(back.filter(col("id") === 55L).select("score").head()
        .getDouble(0) === 27.5)
    }

    test(s"$format: a type-conflicting append is refused even WITH " +
         "mergeSchema (merged reads refuse drift by design)") {
      import spark.implicits._
      val path = tmp(s"conflict_$format")
      base(path, format)
      val bad = Seq(("x", "p")).toDF("id", "pay")
      val e = intercept[Exception] {
        bad.write.format(format).mode("append")
          .option("mergeSchema", "true").save(path)
      }
      assert(e.getMessage.contains("type change"))
      // ... and without the option too
      val e2 = intercept[Exception] {
        bad.write.format(format).mode("append").save(path)
      }
      assert(e2.getMessage.contains("type change"))
      // the table is intact
      assert(spark.read.format(format).load(path).count() === 50)
    }

    test(s"$format: a narrowing append (missing column) also needs the " +
         "option; the new rows read null") {
      import spark.implicits._
      val path = tmp(s"narrow_$format")
      base(path, format)
      val narrow = Seq(99L).toDF("id")
      val e = intercept[Exception] {
        narrow.write.format(format).mode("append").save(path)
      }
      assert(e.getMessage.contains("missing column"))
      narrow.write.format(format).mode("append")
        .option("mergeSchema", "true").save(path)
      val back = spark.read.format(format)
        .option("mergeSchema", "true").load(path)
      assert(back.count() === 51)
      assert(back.filter(col("id") === 99L).select("pay").head().isNullAt(0))
    }
  }

  test("a stale producer appending the PRE-evolution schema to an " +
       "evolved table is still gated (the union, not any single file, " +
       "is the authority)") {
    import spark.implicits._
    val path = tmp("stale_producer")
    base(path, "feather") // {id, pay}
    widened.write.format("feather").mode("append")
      .option("mergeSchema", "true").save(path) // union now {id, pay, score}
    // the old producer's frame matches the OLDEST file exactly — but it
    // narrows the evolved union, so it must still name the option
    val stale = Seq((999L, "p999")).toDF("id", "pay")
    val e = intercept[Exception] {
      stale.write.format("feather").mode("append").save(path)
    }
    assert(e.getMessage.contains("missing column") &&
      e.getMessage.contains("score"))
    stale.write.format("feather").mode("append")
      .option("mergeSchema", "true").save(path)
    assert(spark.read.format("feather").option("mergeSchema", "true")
      .load(path).count() === 61)
  }

  test("a case-variant column spelling is refused outright (both " +
       "spellings in the union would make every read ambiguous)") {
    import spark.implicits._
    val path = tmp("case_variant")
    base(path, "feather")
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("id", "Pay")
        .write.format("feather").mode("append")
        .option("mergeSchema", "true").save(path)
    }
    assert(e.getMessage.contains("only by case"))
    assert(spark.read.format("feather").load(path).count() === 50)
  }

  test("an exact re-append (order/nullability differences only) never " +
       "needs the option") {
    import spark.implicits._
    val path = tmp("exact")
    base(path, "feather")
    // reversed column order, same names/types
    Seq(("p99", 99L)).toDF("pay", "id")
      .select("pay", "id")
      .write.format("feather").mode("append").save(path)
    assert(spark.read.format("feather").load(path).count() === 51)
  }

  test("overwrite stays ungated: it replaces the table definition, and " +
       "the old generation still time-travels with its own schema") {
    import spark.implicits._
    val path = tmp("overwrite")
    base(path, "feather")
    Seq((1, "x", true)).toDF("a", "b", "c")
      .write.format("feather").mode("overwrite").save(path)
    val head = spark.read.format("feather").load(path)
    assert(head.columns.toSeq === Seq("a", "b", "c"))
    val v1 = spark.read.format("feather").option("versionAsOf", "1").load(path)
    assert(v1.columns.toSeq === Seq("id", "pay"))
    assert(v1.count() === 50)
  }

  test("CDF serves the widened head schema after an evolved append; " +
       "changesSince null-fills the old generation's change rows") {
    val path = tmp("cdf")
    base(path, "feather")
    widened.write.format("feather").mode("append")
      .option("mergeSchema", "true").save(path)
    val (changes, head) = FeatherChanges.changesSince(spark, path, 0L)
    assert(head === 2L)
    assert(changes.columns.contains("score"),
      "the feed carries the head schema")
    val v1rows = changes.filter(col("_commit_version") === 1L)
    assert(v1rows.count() === 50)
    assert(v1rows.select("score").collect().forall(_.isNullAt(0)),
      "pre-evolution change rows null-fill the new column")
    assert(changes.filter(col("_commit_version") === 2L).count() === 10)
  }

  test("parquet face: ParquetTable.append gates the same way") {
    val path = tmp("pq")
    import spark.implicits._
    ParquetTable.write((1 to 50).map(i => (i.toLong, s"p$i"))
      .toDF("id", "pay").repartition(1), path)
    val e = intercept[Exception] {
      ParquetTable.append(widened, path)
    }
    assert(e.getMessage.contains("mergeSchema"))
    ParquetTable.append(widened, path, mergeSchema = true)
    val back = ParquetTable.read(spark, path)
    assert(back.count() === 60)
    assert(back.filter(col("id") === 1L).select("score").head().isNullAt(0))
    // type conflict refused outright
    val e2 = intercept[Exception] {
      ParquetTable.append(Seq(("x", "p", 1.0)).toDF("id", "pay", "score"),
        path, mergeSchema = true)
    }
    assert(e2.getMessage.contains("type change"))
  }

  test("streaming sink: a stream whose frame schema would widen the " +
       "table is gated at query start") {
    import spark.implicits._
    val path = tmp("stream")
    base(path, "feather")
    val ckpt = tmp("stream_ckpt")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)](spark)
    mem.addData((100L, "s", 1.0))
    val q = mem.toDF().toDF("id", "pay", "score")
      .writeStream.format("feather")
      .option("checkpointLocation", ckpt)
      .start(path)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(e.getMessage.contains("mergeSchema") ||
      Option(e.getCause).exists(_.getMessage.contains("mergeSchema")))
    q.stop()
  }
}
