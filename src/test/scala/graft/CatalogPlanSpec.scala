package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for catalog-resolved reads: the exprId-preserving
  * alias Project the claim inserts must be TRANSPARENT to Catalyst —
  * filters and column pruning push through it into the scan, and a
  * time-travel pin serves the pinned snapshot. */
class CatalogPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val warehouse =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_tables"

  test("filters and pruning push through the claimed catalog read " +
       "into the connector scan; TIMESTAMP AS OF resolves by name") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit }
    rm(new java.io.File(s"$warehouse/plan_t"))
    spark.sql("CREATE TABLE graft.plan_t (id BIGINT, pay STRING) " +
      "USING feather").collect(): Unit
    spark.sql("INSERT INTO graft.plan_t " +
      "SELECT id, CAST(id AS STRING) FROM range(0, 1000)").collect(): Unit
    Thread.sleep(30)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(30)
    spark.sql("DELETE FROM graft.plan_t WHERE id < 500").collect(): Unit

    val q = spark.sql(
      "SELECT id FROM graft.plan_t WHERE id = 700")
    val physical = q.queryExecution.executedPlan.toString
    // column pruning reached the feather scan (ReadSchema is id-only)
    assert(physical.contains("ReadSchema: struct<id:bigint>"),
      s"pruning did not reach the scan:\n$physical")
    // the skip-filter pushdown reached the connector (SkipFilters line)
    assert(physical.contains("SkipFilters:") ||
      physical.contains("PushedFilters:"),
      s"filter did not reach the scan:\n$physical")
    assert(q.head().getLong(0) === 700L)

    // TIMESTAMP AS OF through the catalog's public loadTable overload
    val localBetween = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(betweenMs), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.plan_t " +
      s"TIMESTAMP AS OF '$localBetween'").head().getLong(0) === 1000L,
      "the pinned instant predates the delete")
    assert(spark.sql("SELECT count(*) AS n FROM graft.plan_t")
      .head().getLong(0) === 500L)
    spark.sql("DROP TABLE graft.plan_t").collect(): Unit
  }
}
