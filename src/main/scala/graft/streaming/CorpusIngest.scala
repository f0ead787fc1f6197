package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.text.TextFunctions._

/** Near-dup-gated corpus ingest — the standing ingest loop a training
  * corpus actually runs: every arriving batch is checked against the
  * WHOLE corpus-so-far without ever re-hashing the corpus, using the
  * persisted MinHash band index (`dedup_lsh_incremental`'s scale design
  * made a continuous sink).
  *
  * Per batch (a `foreachBatch` body over any stream):
  *   1. within-batch dedup — exact id dups and LSH-bucket near-dups
  *      (smallest doc_id wins, batch-sized work);
  *   2. cross-corpus gate — the batch's band keys equi-join the PERSISTED
  *      index; bucket collisions reject (O(batch + candidates), the
  *      corpus is never re-shingled);
  *   3. survivors append to the snapshotted corpus table (atomic manifest
  *      commit), and their band keys append to the index table.
  *
  * Crash-replay safety WITHOUT cross-table transactions: the two appends
  * can't be atomic together, so the loop is built to converge instead —
  *   - fresh docs are derived by anti-joining the CORPUS's ids, so a
  *     replayed batch (crash after the corpus append) re-appends nothing;
  *   - index keys are derived as "batch docs present in the corpus but
  *     missing from the index", so the same replay REPAIRS an index the
  *     crash left behind. Replaying any batch any number of times leaves
  *     both tables at the same content (pinned in CorpusIngestSpec).
  *
  * At 100 TB: the only corpus-sized inputs are two id-/key-projected
  * column scans (corpus ids, index keys), both equi-joined on short
  * keys; signature work is O(batch); appends are manifest commits.
  */
object CorpusIngest {

  private val NumHashes = 8

  /** (doc_id, band, bkey) MinHash band keys — 8 bands × 1 row, the same
    * construction as the dedup_lsh_* queries (fused shingle hashes; the
    * band key IS the minhash value). */
  def bandKeys(docs: DataFrame): DataFrame = {
    val fp = docs
      .select(col("doc_id"), explode(shingleHashes(col("text"))).as("fp"))
    val hashCols = (0 until NumHashes).map(i =>
      min((lit(2L * i + 1) * col("fp") + lit(i * 7919L)) % lit(HashMod)).as(s"h$i"))
    val sig = fp.groupBy(col("doc_id")).agg(hashCols.head, hashCols.tail: _*)
    val bandCols = (0 until NumHashes).map(i => col(s"h$i").cast(StringType))
    sig.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))
  }

  private def readOrEmpty(spark: SparkSession, path: String,
                          schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.format("feather").load(path)
    else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }

  /** One batch through the gate. `batch` must carry (doc_id: Long,
    * text: String). Returns (accepted, rejected) counts. */
  def nearDupIngest(spark: SparkSession, batch: DataFrame,
                    corpusPath: String, indexPath: String): (Long, Long) = {
    import org.apache.spark.sql.types._
    require(batch.columns.contains("doc_id") && batch.columns.contains("text"),
      s"nearDupIngest batch needs (doc_id, text), got ${batch.columns.mkString(", ")}")
    val b = batch.select("doc_id", "text").dropDuplicates("doc_id")
    val keys = graft.ops.OrderedOps.pinned(bandKeys(b))

    // 1. within-batch near-dups: an id sharing a bucket with a SMALLER id
    val withinDup = keys.select(col("band"), col("bkey"), col("doc_id"))
      .join(keys.select(col("band"), col("bkey"), col("doc_id").as("d2")),
        Seq("band", "bkey"))
      .filter(col("doc_id") > col("d2"))
      .select("doc_id").distinct()

    // 2. cross-corpus gate: persisted ids + persisted band index
    val corpusIds = readOrEmpty(spark, corpusPath,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .select("doc_id")
    val index = readOrEmpty(spark, indexPath,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("band", IntegerType), StructField("bkey", StringType))))
    val vsIndex = keys.join(index.select("band", "bkey"), Seq("band", "bkey"))
      .select("doc_id").distinct()

    val fresh = b
      .join(withinDup, Seq("doc_id"), "left_anti")
      .join(corpusIds, Seq("doc_id"), "left_anti")
      .join(vsIndex, Seq("doc_id"), "left_anti")
      .persist()
    val accepted = fresh.count()
    val rejected = b.count() - accepted

    try {
      if (accepted > 0)
        fresh.write.format("feather").mode("append")
          .option("snapshots", "true").save(corpusPath)

      // 3. index append doubles as crash REPAIR: keys for every batch doc
      // now in the corpus but absent from the index (covers both this
      // batch's fresh docs and a prior replay's orphaned corpus append)
      val inCorpusNow = b.join(
        readOrEmpty(spark, corpusPath,
          StructType(Seq(StructField("doc_id", LongType),
            StructField("text", StringType)))).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val missingKeys = bandKeys(inCorpusNow)
        .join(index.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      if (!missingKeys.isEmpty)
        missingKeys.write.format("feather").mode("append")
          .option("snapshots", "true").save(indexPath)
    } finally fresh.unpersist()
    (accepted, rejected)
  }
}
