package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-coverage registry: one entry per implemented
  * operator from SURVEY.md §2, assembled from per-family QueryPacks.
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * hash-compare correctness gate.
  */
object SparkEntry {

  /** All query packs, one per operator family. */
  val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    AggregationQueries,
    WindowQueries,
    CompactionQueries,
    ReshapeQueries,
    ScalarQueries,
    DatetimeQueries,
    StringQueries,
    ListStructQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    IoQueries,
    UdfQueries,
    IndexQueries,
    SeriesQueries,
    CategoricalQueries,
    MultimodalQueries,
    PipelineQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_groupby_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
