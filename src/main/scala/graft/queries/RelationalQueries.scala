package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GF._

/** Core relational surface: projection/filter (SURVEY §2.2), joins (§2.3),
  * groupby aggregation (§2.4), sorts/top-k (§2.6).
  *
  * Scale notes (100 TB): every query here filters+projects before shuffling,
  * keeps aggregates partial-final (plain groupBy.agg), and joins dimension
  * tables via broadcast — lineitem/orders never sit on the build side.
  */
object RelationalQueries extends QueryPack {

  // --- §2.4 groupby hash path: TPC-H Q1 shape (sum/avg/count) ---------------
  register("agg_groupby_q1",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val decQ  = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(12, 2))
    val decR  = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(4, 2))
    val li = Tables.lineitem(s, d)
    val oneMinusDisc = (lit(1) - decR(col("l_discount"))).cast(DecimalType(4, 2))
    val onePlusTax   = (lit(1) + decR(col("l_tax"))).cast(DecimalType(4, 2))
    li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(decQ(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(decQ(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(decQ(col("l_extendedprice")) * oneMinusDisc).cast(DoubleType).as("sum_disc_price"),
        sum(decQ(col("l_extendedprice")) * oneMinusDisc * onePlusTax).cast(DoubleType).as("sum_charge"),
        (sum(decQ(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // --- §2.2 boolean-mask filter + projection (pushed to parquet scan) -------
  register("filt_boolean_mask",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity >= 45 AND l_discount >= 0.09 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 45 && col("l_discount") >= 0.09 &&
        col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- §2.3 inner join: fact ⋈ broadcast dims, aggregated -------------------
  register("join_inner",
    """SELECT n_name, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sumMoney(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("n_name"))
  }

  // --- §2.3 left outer join -------------------------------------------------
  register("join_left",
    """SELECT n_nationkey, n_name, count(c_custkey) AS n_cust
      |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(col("c_custkey")).as("n_cust"))
      .orderBy(col("n_nationkey"))
  }

  // --- §2.3 full outer join -------------------------------------------------
  register("join_full",
    """WITH cn AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
      |     sn AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
      |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
      |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM cn FULL OUTER JOIN sn ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    val cn = Tables.customer(s, d).groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = Tables.supplier(s, d).groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  // --- §2.3 left semi (EXISTS) ----------------------------------------------
  register("join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // --- §2.3 left anti (NOT EXISTS) ------------------------------------------
  register("join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // --- §2.3 cross join ------------------------------------------------------
  register("join_cross",
    """SELECT a.r_regionkey AS rk1, b.r_regionkey AS rk2
      |FROM region a CROSS JOIN region b
      |ORDER BY rk1, rk2""".stripMargin) { (s, d) =>
    val a = Tables.region(s, d).select(col("r_regionkey").as("rk1"))
    val b = Tables.region(s, d).select(col("r_regionkey").as("rk2"))
    a.crossJoin(b).orderBy("rk1", "rk2")
  }

  // --- §2.3 conditional (theta) join — join.hpp:687 nested-loop with AST ----
  register("join_conditional",
    """SELECT n_nationkey, r_regionkey
      |FROM nation JOIN region ON n_regionkey > r_regionkey
      |ORDER BY n_nationkey, r_regionkey""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") > col("r_regionkey"))
      .select("n_nationkey", "r_regionkey")
      .orderBy("n_nationkey", "r_regionkey")
  }

  // --- as-of join (pandas/cuDF merge_asof; ops/AsOfJoin union+window form,
  // one shuffle, no range explosion). Clicks pick up the latest prior view
  // per user; µs epoch on both sides (DuckDB's TIMESTAMP is µs — ns would
  // silently truncate in the oracle), (user_id, µs) is duplicate-free. -----
  register("join_asof",
    """WITH u AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id AS click_id,
      |         CAST(NULL AS BIGINT) AS view_id, CAST(NULL AS DOUBLE) AS view_value, 1 AS tag
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts), NULL, event_id, value, 0
      |  FROM events WHERE event_type = 'view'),
      |m AS (
      |  SELECT user_id, tus, click_id, tag,
      |    last_value(view_id IGNORE NULLS) OVER w AS matched_view,
      |    last_value(view_value IGNORE NULLS) OVER w AS matched_value
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, tag
      |               ROWS UNBOUNDED PRECEDING))
      |SELECT click_id, user_id, tus, matched_view, matched_value
      |FROM m WHERE tag = 1 ORDER BY click_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .withColumn("tus", expr("ts_ns div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("tus"),
        col("event_id").as("matched_view"), col("value").as("matched_value"))
    graft.ops.AsOfJoin
      .backward(clicks, views, keyCol = "user_id", tCol = "tus",
        payload = Seq("matched_view", "matched_value"))
      .select("click_id", "user_id", "tus", "matched_view", "matched_value")
      .orderBy("click_id")
  }

  // --- as-of join, direction='forward' (earliest right at or after t) -------
  register("join_asof_forward",
    """WITH u AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id AS click_id,
      |         CAST(NULL AS BIGINT) AS view_id, CAST(NULL AS DOUBLE) AS view_value, 1 AS tag
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts), NULL, event_id, value, 0
      |  FROM events WHERE event_type = 'view'),
      |m AS (
      |  SELECT user_id, tus, click_id, tag,
      |    first_value(view_id IGNORE NULLS) OVER w AS matched_view,
      |    first_value(view_value IGNORE NULLS) OVER w AS matched_value
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, tag DESC
      |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT click_id, user_id, tus, matched_view, matched_value
      |FROM m WHERE tag = 1 ORDER BY click_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .withColumn("tus", expr("ts_ns div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("tus"),
        col("event_id").as("matched_view"), col("value").as("matched_value"))
    graft.ops.AsOfJoin
      .forward(clicks, views, keyCol = "user_id", tCol = "tus",
        payload = Seq("matched_view", "matched_value"))
      .select("click_id", "user_id", "tus", "matched_view", "matched_value")
      .orderBy("click_id")
  }

  // --- as-of join, direction='nearest' (closest in time, backward wins ties) -
  register("join_asof_nearest",
    """WITH u AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id AS click_id,
      |         CAST(NULL AS BIGINT) AS view_id, CAST(NULL AS DOUBLE) AS view_value, 1 AS tag
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts), NULL, event_id, value, 0
      |  FROM events WHERE event_type = 'view'),
      |m AS (
      |  SELECT user_id, tus, click_id, tag,
      |    last_value(CASE WHEN tag = 0
      |        THEN struct_pack(rt := tus, v := view_id, val := view_value) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, tag
      |            ROWS UNBOUNDED PRECEDING) AS b,
      |    first_value(CASE WHEN tag = 0
      |        THEN struct_pack(rt := tus, v := view_id, val := view_value) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, tag
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f
      |  FROM u)
      |SELECT click_id, user_id, tus,
      |  CASE WHEN f IS NULL THEN b.v WHEN b IS NULL THEN f.v
      |       WHEN tus - b.rt <= f.rt - tus THEN b.v ELSE f.v END AS matched_view,
      |  CASE WHEN f IS NULL THEN b.val WHEN b IS NULL THEN f.val
      |       WHEN tus - b.rt <= f.rt - tus THEN b.val ELSE f.val END AS matched_value
      |FROM m WHERE tag = 1 ORDER BY click_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .withColumn("tus", expr("ts_ns div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("tus"),
        col("event_id").as("matched_view"), col("value").as("matched_value"))
    graft.ops.AsOfJoin
      .nearest(clicks, views, keyCol = "user_id", tCol = "tus",
        payload = Seq("matched_view", "matched_value"))
      .select("click_id", "user_id", "tus", "matched_view", "matched_value")
      .orderBy("click_id")
  }

  // --- range join (point-in-interval) via bucketized equi-join --------------
  // Synthetic 7-hour maintenance windows every 5 hours over the events span;
  // counting events per window. ops/RangeJoin quantizes to 1-hour buckets —
  // hash equi-join + residual filter, no BroadcastNestedLoopJoin (PlanSpec).
  register("join_range_bucketed",
    """WITH iv AS (
      |  SELECT i AS interval_id,
      |    1704067200000000 + i * 5 * 3600 * 1000000 AS start_us,
      |    1704067200000000 + (i * 5 + 7) * 3600 * 1000000 AS end_us
      |  FROM range(0, 40) t(i))
      |SELECT interval_id, count(*) AS n_events,
      |  CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
      |FROM iv JOIN events e ON epoch_us(e.ts) >= iv.start_us AND epoch_us(e.ts) < iv.end_us
      |GROUP BY interval_id ORDER BY interval_id""".stripMargin) { (s, d) =>
    val hourUs = 3600L * 1000000L
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val intervals = s.range(0, 40)
      .select(col("id").as("interval_id"),
        (lit(baseUs) + col("id") * 5 * hourUs).as("start_us"),
        (lit(baseUs) + (col("id") * 5 + 7) * hourUs).as("end_us"))
    val points = Tables.events(s, d)
      .select(expr("ts_ns div 1000").as("tus"), col("value"))
    graft.ops.RangeJoin
      .pointInInterval(points, "tus", intervals, "start_us", "end_us", hourUs)
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast(LongType)).cast(DoubleType) / 100).as("sum_value"))
      .orderBy("interval_id")
  }

  // --- skew-salted join (AQE handles moderate skew; explicit salting is the
  // plan-level fix for arbitrary skew — see ops/SkewJoin). Results identical
  // to the plain join, so the oracle is the plain join. ----------------------
  register("join_skew_salted",
    """SELECT s.s_nationkey AS nationkey, count(*) AS n_items,
      |  CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |WHERE l.l_orderkey <= 5000
      |GROUP BY s.s_nationkey ORDER BY nationkey""".stripMargin) { (s, d) =>
    val fact = Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 5000)
      .withColumn("s_suppkey", col("l_suppkey"))
    val dim = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    graft.ops.SkewJoin
      .saltedInnerJoin(fact, dim, "s_suppkey", factIdCol = "l_orderkey", saltFactor = 8)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_qty"))
      .orderBy("nationkey")
  }

  // --- §2.6 sort + top-k (nlargest dataframe.py:4142) -----------------------
  register("sort_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  // --- composite analytics: TPC-H Q3 shape (shipping priority) --------------
  // Not one operator but the composition Catalyst exists for: two
  // dimension-filtered joins into the fact table, decimal-exact revenue
  // aggregation, top-k. The plan to demand at 100 TB: filtered customer
  // broadcast into orders, the orders side shuffled once onto l_orderkey,
  // revenue partial-aggregated map-side, TakeOrdered for the limit (no
  // global sort). Filters reach the scans (PushedFilters on both dates).
  register("rel_q3_shipping_priority",
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  min(o_orderdate) AS orderdate, min(o_orderpriority) AS priority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1995-03-15").cast(DateType))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1995-03-15").cast(DateType))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(12, 2))
          * (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
          .cast(DoubleType).as("revenue"),
        min(col("o_orderdate")).as("orderdate"),
        min(col("o_orderpriority")).as("priority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // --- Q5-shaped composite: 6-table join CYCLE ------------------------------
  // (The reference has no SQL suite; this pins OUR multi-join plan
  // discipline on the classic local-supplier shape: region→nation→supplier
  // fold into one broadcast dim; customer⋈orders and the lineitem probe
  // shuffle only on their join keys; the c_nationkey = s_nationkey edge
  // CLOSES THE CYCLE as an extra equi-condition on the final join — no
  // cartesian anywhere. PlanSpec pins the broadcasts + pushed filters.)
  register("rel_q5_local_supplier",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1992-01-01' AND o_orderdate < DATE '1996-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    // dim chain folds driver-free into ONE broadcast: region(1 row after
    // filter) → nation → supplier, carrying (s_suppkey, s_nationkey, n_name)
    val nr = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val co = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1992-01-01").cast(DateType) &&
        col("o_orderdate") < lit("1996-01-01").cast(DateType))
      .select("o_orderkey", "o_custkey")
      .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey")
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(co, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey")) // closes the cycle
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2))
          * (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // --- Q18-shaped composite: semi-join on an AGGREGATE ----------------------
  // (Large-volume-customer shape: the HAVING aggregate reduces lineitem to
  // a small key set BEFORE any join touches orders/customer — the filter
  // must sit below the joins in the optimized plan, or at 100 TB the join
  // processes the full fact table for nothing. PlanSpec pins
  // aggregate-below-join + TakeOrderedAndProject.)
  register("rel_q18_large_orders",
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey,
      |        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("qty_dec"))
      .filter(col("qty_dec") > lit(250))
      .select(col("l_orderkey"), col("qty_dec").cast(DoubleType).as("total_qty"))
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  // --- Q21-shaped composite: correlated EXISTS / NOT EXISTS self-joins ------
  // (Suppliers-who-kept-orders-waiting shape; the synthetic lineitem has no
  // receipt/commit dates, so l_returnflag = 'R' stands in as the "late"
  // marker — the SHAPE under test is the same: a fact self-semi-join, a
  // fact self-ANTI-join, a broadcast dim chain, and a top-k.
  //
  // Scale decision: the textbook formulation scans lineitem THREE times
  // (l1 + the EXISTS probe + the NOT EXISTS probe), and each probe is a
  // full fact-fact shuffle join — at 100 TB that is 2 extra exabyte-class
  // shuffles. Both correlated subqueries only ask per-ORDER facts ("does
  // another supplier exist", "does another LATE supplier exist"), so they
  // fold into ONE per-order aggregate (distinct suppliers, distinct late
  // suppliers) joined back once: 2 lineitem scans total, one of them
  // pre-shrunk to (orderkey, 2 counts). The oracle runs the EXISTS
  // formulation — the hash match proves the rewrite is semantics-exact.)
  register("rel_q21_waiting_supplier",
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) { (s, d) =>
    // per-order facts both EXISTS probes need:
    //   n_supp  — distinct suppliers on the order
    //   n_late  — distinct suppliers with a late (returnflag='R') line
    // TWO-PHASE instead of a double countDistinct: Spark plans multiple
    // distinct aggregates via Expand (2× every fact row into the first
    // exchange). Pre-aggregating per (orderkey, suppkey) first shuffles
    // the fact ONCE at its natural width, un-Expanded; the second shuffle
    // is per-order and tiny. Values are identical: n_supp = #(ok,sk)
    // groups, n_late = #groups with any 'R' line.
    val orderStats = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_returnflag")
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("is_late"))
      .groupBy(col("l_orderkey").as("st_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"))
    // EXISTS other-supplier      <=> n_supp >= 2
    // NOT EXISTS other-late-supp <=> n_late = 1 (l1's own supplier is late)
    val qualifying = orderStats
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .select("st_orderkey")
    val supJp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")
        .select("n_nationkey")), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey")
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
      .join(qualifying, col("l_orderkey") === col("st_orderkey"), "left_semi")
      .join(broadcast(supJp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  // --- Q17-shaped composite: correlated SCALAR subquery against a per-key
  // aggregate of the same fact ("parts ordered below 20% of their average
  // quantity"). The textbook plan scans lineitem twice and joins fact to
  // fact; this one scans it ONCE — broadcast semi-join on the filtered
  // part keys first (shrinks the fact before any shuffle; the per-partkey
  // average is unchanged because the semi-join keeps EVERY line of a kept
  // part), then ONE shuffle on l_partkey computes the window count+sum and
  // the threshold filter in the same pass. No fact-fact join at all.
  //
  // The q < 0.2*avg boundary is re-expressed as 5*q*cnt < sum over exact
  // DECIMAL quantities — both engines compare exact integers, so a row
  // landing ON the threshold cannot hash-diverge through float rounding;
  // the money output leaves as exact cents floor-divided by 7 (integers
  // below 2^53, FLOOR stable: the true ratio is never within 1/7 of an
  // integer unless exactly integral). The oracle runs the correlated
  // formulation — the hash match proves the rewrite is semantics-exact.
  register("rel_q17_small_quantity",
    """SELECT CAST(FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100
      |                       AS BIGINT) / 7.0) AS BIGINT) AS avg_yearly_cents7
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4' AND p_size < 15
      |  AND 5 * CAST(l_quantity AS DECIMAL(12,2))
      |        * (SELECT COUNT(*) FROM lineitem l2
      |           WHERE l2.l_partkey = p_partkey)
      |      < (SELECT SUM(CAST(l_quantity AS DECIMAL(12,2))) FROM lineitem l3
      |         WHERE l3.l_partkey = p_partkey)""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val pKeys = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#4" && col("p_size") < 15)
      .select(col("p_partkey"))
    val qdec = col("l_quantity").cast(DecimalType(12, 2))
    val flagged = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(pKeys), col("l_partkey") === col("p_partkey"), "left_semi")
      .withColumn("wcnt", count(lit(1))
        .over(Window.partitionBy(col("l_partkey"))))
      .withColumn("wsum", sum(qdec)
        .over(Window.partitionBy(col("l_partkey"))))
      .filter(qdec * lit(5) * col("wcnt") < col("wsum"))
    flagged
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2))).as("sd"))
      .select(floor((col("sd") * 100).cast(LongType) / lit(7.0))
        .cast(LongType).as("avg_yearly_cents7"))
  }

  // --- §2.4 nunique / distinct_count (stream_compaction.hpp:262) ------------
  register("agg_nunique",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy(col("l_returnflag"))
  }
}
