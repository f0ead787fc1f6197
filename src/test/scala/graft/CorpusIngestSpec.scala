package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CorpusIngest

/** The near-dup-gated corpus ingest loop: within-batch dedup, the
  * persisted-index gate, streaming end-to-end, replay convergence, and
  * the crash-window index repair. */
class CorpusIngestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): (String, String) = {
    val base = s"${sys.props("java.io.tmpdir")}/graft_corpus_ingest/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(base))
    (s"$base/corpus", s"$base/index")
  }

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private val tA = "the quick brown fox jumps over the lazy dog again and again"
  private val tB = "completely different content about distributed query engines here"
  private val tC = "a third unrelated document mentioning arrow feather manifests"

  test("first batch seeds corpus and index; near-dup batch is rejected") {
    val (corpus, index) = tmp("seed")
    val (a1, r1) = CorpusIngest.nearDupIngest(spark,
      docs(1L -> tA, 2L -> tB), corpus, index)
    assert((a1, r1) === (2L, 0L))
    assert(spark.read.format("feather").load(corpus).count() === 2)
    // an exact near-dup of tA (same text, new id) and one fresh doc
    val (a2, r2) = CorpusIngest.nearDupIngest(spark,
      docs(3L -> tA, 4L -> tC), corpus, index)
    assert((a2, r2) === (1L, 1L))
    val ids = spark.read.format("feather").load(corpus)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 2L, 4L))
  }

  test("within-batch near-dups keep the smallest id") {
    val (corpus, index) = tmp("within")
    val (a, r) = CorpusIngest.nearDupIngest(spark,
      docs(10L -> tA, 11L -> tA, 12L -> tB), corpus, index)
    assert((a, r) === (2L, 1L))
    assert(spark.read.format("feather").load(corpus)
      .where(col("doc_id") === 10L).count() === 1)
    assert(spark.read.format("feather").load(corpus)
      .where(col("doc_id") === 11L).count() === 0)
  }

  test("replaying a batch converges: corpus and index unchanged") {
    val (corpus, index) = tmp("replay")
    CorpusIngest.nearDupIngest(spark, docs(1L -> tA, 2L -> tB), corpus, index)
    val batch = docs(3L -> tC)
    CorpusIngest.nearDupIngest(spark, batch, corpus, index)
    val c1 = spark.read.format("feather").load(corpus)
      .orderBy("doc_id").collect().toSeq
    val i1 = spark.read.format("feather").load(index)
      .orderBy("doc_id", "band").collect().toSeq
    // the replay (same batch, e.g. after a sink crash) must be a no-op
    val (a, r) = CorpusIngest.nearDupIngest(spark, batch, corpus, index)
    assert((a, r) === (0L, 1L))
    assert(spark.read.format("feather").load(corpus)
      .orderBy("doc_id").collect().toSeq === c1)
    assert(spark.read.format("feather").load(index)
      .orderBy("doc_id", "band").collect().toSeq === i1)
  }

  test("crash window repair: corpus appended but index not — replay heals") {
    val (corpus, index) = tmp("repair")
    CorpusIngest.nearDupIngest(spark, docs(1L -> tA), corpus, index)
    // simulate the crash: doc 2 landed in the corpus, its keys never did
    docs(2L -> tB).write.format("feather").mode("append")
      .option("snapshots", "true").save(corpus)
    assert(spark.read.format("feather").load(index)
      .where(col("doc_id") === 2L).count() === 0)
    // the replayed batch re-appends nothing but repairs the index
    val (a, r) = CorpusIngest.nearDupIngest(spark, docs(2L -> tB), corpus, index)
    assert((a, r) === (0L, 1L))
    assert(spark.read.format("feather").load(corpus).count() === 2)
    assert(spark.read.format("feather").load(index)
      .where(col("doc_id") === 2L).count() === 8) // 8 bands
    // and a near-dup of doc 2 is now rejected through the repaired index
    val (a2, _) = CorpusIngest.nearDupIngest(spark, docs(9L -> tB), corpus, index)
    assert(a2 === 0L)
  }

  test("streams end-to-end as a foreachBatch sink") {
    val (corpus, index) = tmp("stream")
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        CorpusIngest.nearDupIngest(spark, batch, corpus, index): Unit
      }
      .start()
    try {
      input.addData(1L -> tA, 2L -> tB)
      q.processAllAvailable()
      input.addData(3L -> tA, 4L -> tC) // 3 is a near-dup of 1
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.format("feather").load(corpus)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 2L, 4L))
    // index covers exactly the accepted docs
    assert(spark.read.format("feather").load(index)
      .select("doc_id").distinct().count() === 3)
  }
}
