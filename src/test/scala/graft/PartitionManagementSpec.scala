package graft

import org.scalatest.funsuite.AnyFunSuite

/** SupportsPartitionManagement on GraftTable: SHOW PARTITIONS by name
  * runs through Spark's OWN ShowPartitionsExec (including the filtered
  * PARTITION (k=v) form the old claim refused), and the management verbs
  * (ALTER TABLE ADD/DROP PARTITION) refuse with the statement that
  * actually does the job. The path-spelling claim stays pinned by
  * TableDdlSpec. */
class PartitionManagementSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val warehouse =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_tables"

  private def wipe(name: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$warehouse/$name")): Unit

  test("SHOW PARTITIONS by name via Spark's exec; filtered form works") {
    wipe("pmx")
    spark.sql("CREATE TABLE graft.pmx USING parquet PARTITIONED BY (day) " +
      "AS SELECT id, concat('d', id % 3) AS day FROM range(30)")
      .collect(): Unit
    val all = spark.sql("SHOW PARTITIONS graft.pmx").collect()
      .map(_.getString(0)).toSeq
    assert(all == Seq("day=d0", "day=d1", "day=d2"))
    // the physical plan is Spark's own exec, not a claim-injected local
    // relation
    val plan = spark.sql("SHOW PARTITIONS graft.pmx")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShowPartitions"), plan)
    // the filtered form the claim used to refuse
    val one = spark.sql("SHOW PARTITIONS graft.pmx PARTITION (day='d1')")
      .collect().map(_.getString(0)).toSeq
    assert(one == Seq("day=d1"))
  }

  test("ALTER TABLE ADD/DROP PARTITION refuse with working guidance") {
    val eAdd = intercept[Exception] {
      spark.sql("ALTER TABLE graft.pmx ADD PARTITION (day='d9')").collect()
    }
    assert(eAdd.getMessage.contains("routes each row"), eAdd.getMessage)
    val eDrop = intercept[Exception] {
      spark.sql("ALTER TABLE graft.pmx DROP PARTITION (day='d0')").collect()
    }
    assert(eDrop.getMessage.contains("DELETE FROM"), eDrop.getMessage)
    // the guidance WORKS: the predicate-scoped delete empties the leaf
    spark.sql("DELETE FROM graft.pmx WHERE day = 'd0'").collect(): Unit
    assert(spark.sql("SELECT count(*) FROM graft.pmx WHERE day = 'd0'")
      .head().getLong(0) == 0L)
  }

  test("SHOW PARTITIONS on an unpartitioned named table refuses") {
    wipe("pmflat")
    spark.sql("CREATE TABLE graft.pmflat (id BIGINT) USING feather")
      .collect(): Unit
    val e = intercept[Exception] {
      spark.sql("SHOW PARTITIONS graft.pmflat").collect()
    }
    assert(e.getMessage.contains("not partitioned"), e.getMessage)
    wipe("pmflat")
  }
}
