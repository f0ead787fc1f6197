package graft

/** Benchmark main: one JSON line with per-query wall seconds.
  *
  * Each query is forced through a `noop`-format write — unlike `.count()`,
  * this evaluates EVERY output column (no column pruning of projections, no
  * EliminateSorts dropping the final orderBy), so expression-heavy queries
  * are actually measured, not reduced to a scan+count.
  *
  * Failures are NOT swallowed: a failed query is recorded with value -1 in a
  * `failed` list and the error printed to stderr, so a broken query can't
  * silently pose as a fast one.
  */
object Bench {
  /** Untimed warmup shared by Bench and TimeQ: JVM/codegen/parquet-footer
    * costs land here, not on whichever query happens to run first. One query
    * per (table, operator class) — measured r6: the first window query of a
    * cold run absorbed ~4 s of JIT that re-timing in isolation showed was
    * not its own cost. Also builds the bucketed-table fixture: bucketing is
    * a write-once cost amortized over every downstream join, so
    * io_bucketed_join times the JOIN, not the write.
    */
  def warmup(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    for (w <- Seq("agg_groupby_q1", "win_rolling_sum", "text_tokenize", "sim_lsh_buckets"))
      try SparkEntry.queries(w)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    try graft.queries.IoQueries.ensureBucketedTables(spark, sfDir)
    catch { case _: Throwable => () }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    warmup(spark, sfDir)
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
    // rc stays 0 by default: the JSON line is the artifact; failures are
    // visible in the `failed` list and on stderr (a nonzero rc would void
    // the whole run over one transient query failure). Consumers gating
    // only on the process rc can opt in to strict mode.
    if (sys.env.get("GRAFT_BENCH_STRICT").contains("1") && failed.nonEmpty)
      sys.exit(1)
  }
}
