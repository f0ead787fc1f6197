package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** UDF surfaces (SURVEY §2.10): cuDF's user-function entry points mapped to
  * Spark's typed Dataset API.
  *
  *  - groupby.apply / apply_grouped (core/groupby/groupby.py:384,458):
  *    `groupByKey.flatMapGroups` — arbitrary per-group logic, whole group in
  *    memory. Scale contract matches cuDF's: groups must fit an executor
  *    (cuDF requires them to fit the GPU); the shuffle is one pass keyed by
  *    the group key. Anything expressible as aggregates should use them
  *    instead (they get partial aggregation; this path does not).
  *  - apply_rows (core/dataframe.py:4701): typed `Dataset.map` — per-row
  *    function, embarrassingly parallel, no shuffle. cuDF numba-JITs the
  *    row function; Spark compiles the closure to JVM bytecode — both avoid
  *    interpreter-per-row, though Spark pays encoder serialization at the
  *    typed boundary (documented trade; prefer Column exprs when possible).
  *
  * Both queries pin results against plain-SQL oracles so the typed paths
  * are hash-checked like every other operator.
  */
object UdfQueries extends QueryPack {

  case class LineRow(l_suppkey: Long, l_orderkey: Long, l_linenumber: Int, l_quantity: Double)

  // --- groupby.apply: custom per-group top-2-by-quantity ---------------------
  register("udf_groupby_apply",
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |  row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rk
      |FROM lineitem
      |WHERE l_suppkey <= 50
      |QUALIFY rk <= 2
      |ORDER BY l_suppkey, rk""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 50)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .as[LineRow]
      .groupByKey(_.l_suppkey)
      .flatMapGroups { (key: Long, rows: Iterator[LineRow]) =>
        // arbitrary JVM logic per group — here: stable top-2 by quantity
        rows.toSeq
          .sortBy(r => (-r.l_quantity, r.l_orderkey, r.l_linenumber.toLong))
          .take(2).zipWithIndex
          .map { case (r, i) => (key, r.l_orderkey, r.l_linenumber, r.l_quantity, i + 1) }
      }
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "rk")
      .orderBy("l_suppkey", "rk")
  }

  // --- apply_rows: per-row typed function, no shuffle ------------------------
  register("udf_apply_rows",
    """SELECT l_orderkey, l_linenumber,
      |  l_quantity * 2.0 + l_linenumber AS score,
      |  CASE WHEN l_quantity >= 25 THEN 'H' ELSE 'L' END AS bucket
      |FROM lineitem WHERE l_orderkey <= 300
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 300)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .as[LineRow]
      .map { r =>
        // same IEEE double ops the oracle performs — bit-identical results
        val score = r.l_quantity * 2.0 + r.l_linenumber
        val bucket = if (r.l_quantity >= 25) "H" else "L"
        (r.l_orderkey, r.l_linenumber, score, bucket)
      }
      .toDF("l_orderkey", "l_linenumber", "score", "bucket")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- custom typed Aggregator (UDF aggregation tier): GCD of scaled prices
  //     per priority — partial-aggregating, shuffle carries one long/group --
  register("udf_custom_agg_gcd",
    """SELECT o_orderpriority,
      |  list_reduce(list(CAST(round(o_totalprice * 100) AS BIGINT)),
      |              (a, b) -> gcd(a, b)) AS gcd_cents,
      |  count(*) AS n
      |FROM orders WHERE o_orderkey <= 2000
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val gcdUdaf = udaf(graft.functions.GcdAgg, org.apache.spark.sql.Encoders.scalaLong)
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .groupBy(col("o_orderpriority"))
      .agg(
        gcdUdaf(round(col("o_totalprice") * 100).cast(LongType)).as("gcd_cents"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  // --- mapPartitions (apply_chunks, core/dataframe.py:4799): per-partition
  //     batch function — the escape hatch tier (SURVEY §2.10 last resort) ----
  register("udf_apply_chunks",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(round(l_quantity * (1 - l_discount) * 100) AS BIGINT) AS net_cents
      |FROM lineitem WHERE l_orderkey <= 300
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 300)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
      .as[(Long, Int, Double, Double)]
      .mapPartitions { it =>
        // batch-at-a-time logic; state could be amortized across the chunk
        it.map { case (ok, ln, qty, disc) =>
          (ok, ln, math.round(qty * (1 - disc) * 100))
        }
      }
      .toDF("l_orderkey", "l_linenumber", "net_cents")
      .orderBy("l_orderkey", "l_linenumber")
  }
}
