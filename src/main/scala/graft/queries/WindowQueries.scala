package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Window-function surface (SURVEY §2.5; reference cpp/src/rolling, 3,531 LoC
  * + group scans cpp/src/groupby/sort/scan.cpp).
  *
  * cuDF rolling windows are ordered over the frame's implicit row order; the
  * Spark-native re-expression partitions by a grouping key and orders by an
  * explicit sort key (SURVEY §1.4's index-column design). That keeps every
  * window parallel over partitions — no single-partition global Window, which
  * would serialize at 100 TB.
  *
  * Determinism: window order keys are made unique within each partition (the
  * testdata has no uniqueness guarantee on (orderkey, linenumber)), so frame
  * contents are identical across engines.
  */
object WindowQueries extends QueryPack {

  // unique per-supplier ordering for lineitem windows
  private val liOrder = Seq("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")

  // --- fixed-size trailing rolling window (rolling.hpp:57; grouped :194) ----
  register("win_rolling_sum",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
      |    OVER (PARTITION BY l_suppkey
      |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum,
      |  count(*) OVER (PARTITION BY l_suppkey
      |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_n
      |FROM lineitem WHERE l_suppkey <= 20
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(liOrder.map(col): _*)
      .rowsBetween(-2, 0)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("roll_sum", sum(col("l_quantity").cast(DecimalType(12, 2))).over(w).cast(DoubleType))
      .withColumn("roll_n", count(lit(1)).over(w))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "roll_sum", "roll_n")
      .orderBy(col("l_suppkey") +: liOrder.map(col): _*)
  }

  // --- centered window + min_periods (rolling.py:17 center=True) ------------
  register("win_rolling_center",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  min(l_quantity) OVER w AS roll_min,
      |  max(l_quantity) OVER w AS roll_max,
      |  CASE WHEN count(*) OVER w >= 3
      |       THEN CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE) END AS roll_sum_minp
      |FROM lineitem WHERE l_suppkey <= 20
      |WINDOW w AS (PARTITION BY l_suppkey
      |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(liOrder.map(col): _*)
      .rowsBetween(-1, 1)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("roll_min", min(col("l_quantity")).over(w))
      .withColumn("roll_max", max(col("l_quantity")).over(w))
      .withColumn("roll_sum_minp",
        when(count(lit(1)).over(w) >= 3,
          sum(col("l_quantity").cast(DecimalType(12, 2))).over(w).cast(DoubleType)))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "roll_min", "roll_max", "roll_sum_minp")
      .orderBy(col("l_suppkey") +: liOrder.map(col): _*)
  }

  // --- grouped time-range rolling (rolling.hpp:350 — window = interval) -----
  register("win_rolling_time_range",
    """SELECT o_custkey, o_orderkey,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS orders_30d,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
      |FROM orders WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast(TimestampType).cast(LongType))
      .rangeBetween(-2592000L, 0L) // 30 days in seconds
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 50)
      .withColumn("orders_30d", count(lit(1)).over(w))
      .withColumn("spend_30d",
        sum(col("o_totalprice").cast(DecimalType(12, 2))).over(w).cast(DoubleType))
      .select("o_custkey", "o_orderkey", "orders_30d", "spend_30d")
      .orderBy("o_custkey", "o_orderkey")
  }

  // --- LEAD / LAG / shift / diff (aggregation.hpp:80-84; groupby.hpp:278) ---
  register("win_lead_lag",
    """SELECT o_custkey, o_orderkey,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) -
      |       lag(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS diff_price
      |FROM orders WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val pdec = col("o_totalprice").cast(DecimalType(12, 2))
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 50)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("diff_price", (pdec - lag(pdec, 1).over(w)).cast(DoubleType))
      .select("o_custkey", "o_orderkey", "prev_price", "next_price", "diff_price")
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  // --- rank family (sorting.hpp:178 rank_method FIRST/MIN/DENSE/AVERAGE/pct)
  register("win_rank",
    """SELECT c_mktsegment, c_custkey,
      |  row_number() OVER w AS rank_first,
      |  rank() OVER w AS rank_min,
      |  dense_rank() OVER w AS rank_dense,
      |  percent_rank() OVER w AS rank_pct
      |FROM customer WHERE c_custkey <= 300
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 300)
      .withColumn("rank_first", row_number().over(w))
      .withColumn("rank_min", rank().over(w))
      .withColumn("rank_dense", dense_rank().over(w))
      .withColumn("rank_pct", percent_rank().over(w))
      .select("c_mktsegment", "c_custkey", "rank_first", "rank_min", "rank_dense", "rank_pct")
      .orderBy("c_mktsegment", "c_custkey")
  }

  // --- rank na_option = keep / top / bottom (sorting.hpp null_order;
  // pandas rank(na_option)) ---------------------------------------------------
  // keep: null values get a null rank, non-nulls ranked among themselves
  // (nulls sorted LAST so they never shift non-null ranks, then masked);
  // top: nulls rank first; bottom: nulls rank last. All three share one
  // partition shuffle — the two sort orders differ only within partitions.
  register("win_rank_na_option",
    """SELECT c_mktsegment, c_custkey,
      |  CASE WHEN v IS NOT NULL THEN rank() OVER wl END AS rank_keep,
      |  rank() OVER wf AS rank_top,
      |  rank() OVER wl AS rank_bottom
      |FROM (SELECT c_mktsegment, c_custkey, nullif(c_nationkey, 7) AS v
      |      FROM customer WHERE c_custkey <= 300)
      |WINDOW wl AS (PARTITION BY c_mktsegment ORDER BY v ASC NULLS LAST),
      |       wf AS (PARTITION BY c_mktsegment ORDER BY v ASC NULLS FIRST)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, d) =>
    // rank(method='min'): ORDER BY the value alone — equal values (and all
    // nulls) tie to the same min rank, so the output is deterministic
    // without a tie-break column.
    val wl = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("v").asc_nulls_last)
    val wf = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("v").asc_nulls_first)
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 300)
      .select(col("c_mktsegment"), col("c_custkey"),
        nullif(col("c_nationkey"), lit(7)).as("v"))
      .withColumn("rank_keep", when(col("v").isNotNull, rank().over(wl)))
      .withColumn("rank_top", rank().over(wf))
      .withColumn("rank_bottom", rank().over(wl))
      .select("c_mktsegment", "c_custkey", "rank_keep", "rank_top", "rank_bottom")
      .orderBy("c_mktsegment", "c_custkey")
  }

  // --- rank method="average"/"max" (sorting.hpp:31-36 rank_method) ----------
  // Composites over rank_min and the tie count: average = min + (ties−1)/2,
  // max = min + ties − 1. One extra unordered window over (keys, value) —
  // both windows share the same (c_mktsegment) shuffle partitioning, so the
  // second adds no exchange. Ranked on c_nationkey, which is tie-heavy.
  register("win_rank_avg_max",
    """SELECT c_mktsegment, c_custkey, c_nationkey,
      |  rank() OVER w + (count(*) OVER t - 1) / 2.0 AS rank_avg,
      |  rank() OVER w + count(*) OVER t - 1 AS rank_max
      |FROM customer WHERE c_custkey <= 400
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_nationkey),
      |       t AS (PARTITION BY c_mktsegment, c_nationkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_nationkey"))
    val t = Window.partitionBy(col("c_mktsegment"), col("c_nationkey"))
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 400)
      .withColumn("rank_avg", rank().over(w) + (count(lit(1)).over(t) - 1) / 2.0)
      .withColumn("rank_max", rank().over(w) + count(lit(1)).over(t) - 1)
      .select("c_mktsegment", "c_custkey", "c_nationkey", "rank_avg", "rank_max")
      .orderBy("c_mktsegment", "c_custkey")
  }

  // --- group scans: cumsum / cummax / cumcount (groupby/sort/scan.cpp) ------
  register("win_group_scan",
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS cum_spend,
      |  max(o_totalprice) OVER w AS cum_max,
      |  count(*) OVER w - 1 AS cum_count
      |FROM orders WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 50)
      .withColumn("cum_spend",
        sum(col("o_totalprice").cast(DecimalType(12, 2))).over(w).cast(DoubleType))
      .withColumn("cum_max", max(col("o_totalprice")).over(w))
      .withColumn("cum_count", count(lit(1)).over(w) - 1) // cudf cumcount is 0-based
      .select("o_custkey", "o_orderkey", "cum_spend", "cum_max", "cum_count")
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  // --- rolling ARGMIN / ARGMAX (aggregation.cpp rolling kinds): the order
  // key of the frame's extreme row, first occurrence on ties. The frame (≤ 3
  // structs) is materialized once and folded — per-row work bounded by the
  // window size, like win_rolling_apply; lexicographic (value, position)
  // fold gives cuDF's first-occurrence tie rule on both engines.
  register("win_rolling_argminmax",
    """WITH t AS (SELECT l_suppkey, l_quantity,
      |    row_number() OVER (PARTITION BY l_suppkey
      |        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey) AS pos
      |  FROM lineitem WHERE l_suppkey <= 20),
      |f AS (SELECT l_suppkey, pos,
      |    list({'v': l_quantity, 'pos': pos}) OVER (PARTITION BY l_suppkey ORDER BY pos
      |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS frame
      |  FROM t)
      |SELECT l_suppkey, pos,
      |  list_reduce(frame, (a, b) ->
      |    CASE WHEN b.v < a.v THEN b ELSE a END).pos AS argmin_pos,
      |  list_reduce(frame, (a, b) ->
      |    CASE WHEN b.v > a.v THEN b ELSE a END).pos AS argmax_pos
      |FROM f ORDER BY l_suppkey, pos""".stripMargin) { (s, d) =>
    val wPos = Window.partitionBy(col("l_suppkey"))
      .orderBy(liOrder.map(col): _*)
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("pos"))
      .rowsBetween(-2, 0)
    val frame = collect_list(struct(col("l_quantity").as("v"), col("pos"))).over(w)
    // fold keeps the accumulator unless strictly better — first occurrence
    // wins ties, cuDF's argmin/argmax rule (same fold as DuckDB list_reduce)
    val fold = (better: (Column, Column) => Column) =>
      aggregate(slice(col("frame"), lit(2), size(col("frame"))),
        element_at(col("frame"), 1),
        (acc, e) => when(better(e.getField("v"), acc.getField("v")), e).otherwise(acc))
        .getField("pos")
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("pos", row_number().over(wPos))
      .withColumn("frame", frame)
      .withColumn("argmin_pos", fold(_ < _))
      .withColumn("argmax_pos", fold(_ > _))
      .select("l_suppkey", "pos", "argmin_pos", "argmax_pos")
      .orderBy(col("l_suppkey"), col("pos"))
  }

  // --- EXCLUSIVE scan (reduction.hpp:32 scan_type::EXCLUSIVE): the prefix
  // sum NOT including the current row — frame ends at 1 PRECEDING; the
  // group's first row is the scan identity (0 / null-min), pinned with
  // coalesce on both sides.
  register("win_group_scan_exclusive",
    """SELECT o_custkey, o_orderkey,
      |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w, 0) AS DOUBLE) AS excl_sum,
      |  min(o_totalprice) OVER w AS excl_min
      |FROM orders WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 50)
      .withColumn("excl_sum",
        coalesce(sum(col("o_totalprice").cast(DecimalType(12, 2))).over(w), lit(0))
          .cast(DoubleType))
      .withColumn("excl_min", min(col("o_totalprice")).over(w))
      .select("o_custkey", "o_orderkey", "excl_sum", "excl_min")
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  // --- groupby.transform: group aggregate broadcast back to every row
  // (groupby.py transform — same-length output). Unordered per-group window
  // = one shuffle on the key, aggregate computed once per group per
  // partition frame; no join needed.
  register("win_group_transform",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER g AS DOUBLE) AS grp_sum,
      |  max(l_quantity) OVER g AS grp_max,
      |  l_quantity - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER g AS DOUBLE)
      |    / count(*) OVER g AS demeaned
      |FROM lineitem WHERE l_orderkey <= 300
      |WINDOW g AS (PARTITION BY l_orderkey)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val g = Window.partitionBy(col("l_orderkey"))
    val gsum = sum(col("l_quantity").cast(DecimalType(12, 2))).over(g).cast(DoubleType)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 300)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        gsum.as("grp_sum"),
        max(col("l_quantity")).over(g).as("grp_max"),
        (col("l_quantity") - gsum / count(lit(1)).over(g)).as("demeaned"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- exact group median / quantile broadcast to rows (groupby median
  // transform; sort-groupby QUANTILE kind, quantiles.hpp:52). An unordered
  // per-group window evaluates the exact percentile once per group frame —
  // one shuffle on the key, no join; both engines interpolate linearly.
  register("win_group_median",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  round(median(l_quantity) OVER g, 6) AS grp_median,
      |  round(quantile_cont(l_quantity, 0.25) OVER g, 6) AS grp_q1
      |FROM lineitem WHERE l_orderkey <= 300
      |WINDOW g AS (PARTITION BY l_orderkey)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val g = Window.partitionBy(col("l_orderkey"))
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 300)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(percentile(col("l_quantity"), lit(0.5)).over(g), 6).as("grp_median"),
        round(percentile(col("l_quantity"), lit(0.25)).over(g), 6).as("grp_q1"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- cumprod group scan (aggregation.hpp PRODUCT scan): no product window
  // aggregate exists in either engine, so the scan folds the window's value
  // list in WINDOW ORDER — identical fold sequence in both engines, so the
  // double product is bit-deterministic despite fp non-associativity.
  register("win_group_cumprod",
    """SELECT l_orderkey, l_linenumber,
      |  list_reduce(list(1.0 + l_tax) OVER w, (a, b) -> a * b) AS cum_tax_factor
      |FROM lineitem WHERE l_orderkey <= 300
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 300)
      .withColumn("cum_tax_factor",
        aggregate(collect_list(lit(1.0) + col("l_tax")).over(w),
          lit(1.0), (acc, v) => acc * v))
      .select("l_orderkey", "l_linenumber", "cum_tax_factor")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- grouped ffill (replace_nulls grouped, _lib/groupby.pyx:251) ----------
  // nulls synthesized via nullif; ffill = last non-null over preceding frame.
  register("win_group_ffill",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  last_value(nullif(l_discount, 0.0) IGNORE NULLS)
      |    OVER (PARTITION BY l_suppkey
      |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS disc_ffill
      |FROM lineitem WHERE l_suppkey <= 20
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(liOrder.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("disc_ffill",
        last(nullif(col("l_discount"), lit(0.0)), ignoreNulls = true).over(w))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "disc_ffill")
      .orderBy(col("l_suppkey") +: liOrder.map(col): _*)
  }

  // --- ntile / first_value / nth_value over window ---------------------------
  // --- per-group top-k (groupby.head / nlargest-per-group) ------------------
  // The filter on row_number directly above the window lets Spark plan
  // WindowGroupLimit: each map task keeps only k rows per group BEFORE the
  // shuffle and the window sort runs over k·groups rows, not the corpus —
  // the difference between "sort 100 TB" and "sort k rows per group"
  // (pinned in PlanSpec).
  register("win_topk_per_group",
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |QUALIFY row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) <= 3
      |ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    // conditional hash-widen (r20, guide §2.5 input-skew remedy): the
    // partial WindowGroupLimit below the flag exchange must SORT its map
    // partition — on the unsplittable single-row-group fixture that is a
    // full serial sort of the table (Prof: ~1.1 s of the query's 1.5).
    // Hash-spreading by the high-cardinality key first costs one narrow
    // serial shuffle write (no sort-before-repartition: keyed, not
    // round-robin) and makes the sort+prune 32-way parallel; identity on
    // pre-split inputs, and row_number's (price, pk) total order makes the
    // result partitioning-independent.
    graft.ops.ScanParallel.widenBy(
        Tables.lineitem(s, d)
          .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
        col("l_orderkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  register("win_ntile_first",
    """SELECT c_mktsegment, c_custkey,
      |  ntile(4) OVER w AS quartile,
      |  first_value(c_custkey) OVER w AS top_cust,
      |  nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal DESC, c_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_cust
      |FROM customer WHERE c_custkey <= 300
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, 0)
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 300)
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("top_cust", first(col("c_custkey")).over(w))
      .withColumn("second_cust", nth_value(col("c_custkey"), 2).over(wf))
      .select("c_mktsegment", "c_custkey", "quartile", "top_cust", "second_cust")
      .orderBy("c_mktsegment", "c_custkey")
  }

  // --- ungrouped global cumulative sum (reduction scan; pandas cumsum) ------
  // The naive form is a global Window.orderBy — one task. OrderedOps
  // .withRunningTotal does per-partition prefix sums + broadcast offsets, so
  // the scan parallelizes like any other shuffle stage.
  register("win_global_cumsum",
    """SELECT o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_total
      |FROM orders WHERE o_orderkey <= 5000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .filter(col("o_orderkey") <= 5000)
      .select("o_orderkey", "o_totalprice")
    graft.ops.OrderedOps
      .withRunningTotal(base, col("o_totalprice").cast(DecimalType(12, 2)),
        "cum_total", Seq(col("o_orderkey")))
      .select(col("o_orderkey"), col("cum_total").cast(DoubleType).as("cum_total"))
      .orderBy("o_orderkey")
  }

  // --- rolling.apply: custom per-window function (rolling.py:249) -----------
  // The window materializes its frame as a list (collect_list preserves the
  // window ORDER BY), and the user function is a fold over that list — the
  // Spark-shaped equivalent of cuDF's numba-compiled rolling UDF. Here:
  // position-weighted sum Σ value_i·i over the trailing-3 frame, scaled
  // integers so both engines fold exactly.
  register("win_rolling_apply",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(list(CAST(round(l_quantity * 100) AS BIGINT)) OVER w,
      |                   x -> x)),
      |    (acc, v) -> acc + v) AS wsum_plain,
      |  len(list(l_quantity) OVER w) AS frame_n
      |FROM lineitem WHERE l_suppkey <= 20
      |WINDOW w AS (PARTITION BY l_suppkey
      |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(liOrder.map(col): _*)
      .rowsBetween(-2, 0)
    val frame = collect_list(round(col("l_quantity") * 100).cast(LongType)).over(w)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("wsum_plain",
        aggregate(frame, lit(0L), (acc, v) => acc + v))
      .withColumn("frame_n", size(collect_list(col("l_quantity")).over(w)))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "wsum_plain", "frame_n")
      .orderBy(col("l_suppkey") +: liOrder.map(col): _*)
  }

  // --- variable per-row window sizes (rolling.hpp window-column overload;
  // SURVEY §7.4's documented deferral, now implemented). Each row aggregates
  // its trailing w_i rows where w_i = 1 + (l_linenumber % 3). Expressed as a
  // per-group equi-join on the key with a position-range predicate — the
  // join shuffles on the grouping key only, windows stay partition-local.
  register("win_variable_window",
    """WITH p AS (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |    1 + l_linenumber % 3 AS w,
      |    row_number() OVER (PARTITION BY l_suppkey
      |        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey) AS pos
      |  FROM lineitem WHERE l_suppkey <= 10)
      |SELECT a.l_suppkey, a.l_orderkey, a.l_linenumber, a.w,
      |  count(*) AS n_in_window,
      |  CAST(sum(CAST(b.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS var_sum
      |FROM p a JOIN p b
      |  ON b.l_suppkey = a.l_suppkey AND b.pos BETWEEN a.pos - (a.w - 1) AND a.pos
      |GROUP BY a.l_suppkey, a.l_orderkey, a.l_linenumber, a.w
      |ORDER BY a.l_suppkey, a.l_orderkey, a.l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(liOrder.map(col): _*)
    val p = Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 10)
      .withColumn("w", lit(1) + col("l_linenumber") % 3)
      .withColumn("pos", row_number().over(w))
    val a = p.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      col("w"), col("pos"))
    val b = p.select(col("l_suppkey").as("b_suppkey"), col("pos").as("b_pos"),
      col("l_quantity").as("b_qty"))
    a.join(b, col("b_suppkey") === col("l_suppkey") &&
        col("b_pos").between(col("pos") - (col("w") - 1), col("pos")))
      .groupBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("w"))
      .agg(count(lit(1)).as("n_in_window"),
        sum(col("b_qty").cast(DecimalType(12, 2))).cast(DoubleType).as("var_sum"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  // --- grouped bfill (replace_nulls BACKWARD, groupby.py:821) ----------------
  // Mirror of win_group_ffill: first non-null over the FOLLOWING frame. Same
  // per-group window parallelism; no global sort.
  register("win_group_bfill",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  first_value(nullif(l_discount, 0.0) IGNORE NULLS)
      |    OVER (PARTITION BY l_suppkey
      |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS disc_bfill
      |FROM lineitem WHERE l_suppkey <= 20
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(liOrder.map(col): _*)
      .rowsBetween(0, Window.unboundedFollowing)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("disc_bfill",
        first(nullif(col("l_discount"), lit(0.0)), ignoreNulls = true).over(w))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "disc_bfill")
      .orderBy(col("l_suppkey") +: liOrder.map(col): _*)
  }

  // --- rolling COLLECT_LIST / COLLECT_SET (aggregation.cpp rolling kinds) ----
  // The frame's values as a list (order = window order) and as a sorted
  // distinct set, flattened to strings for the cross-engine hash.
  register("win_rolling_collect",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  array_to_string(list(CAST(l_linenumber AS BIGINT))
      |    OVER (PARTITION BY l_suppkey
      |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), ',') AS frame_list,
      |  array_to_string(list_sort(list_distinct(list(CAST(l_linenumber AS BIGINT))
      |    OVER (PARTITION BY l_suppkey
      |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))), ',') AS frame_set
      |FROM lineitem WHERE l_suppkey <= 20
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(liOrder.map(col): _*)
      .rowsBetween(-2, 0)
    val frame = collect_list(col("l_linenumber").cast(LongType)).over(w)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("frame_list", array_join(frame, ","))
      .withColumn("frame_set", array_join(array_sort(array_distinct(frame)), ","))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "frame_list", "frame_set")
      .orderBy(col("l_suppkey") +: liOrder.map(col): _*)
  }

  // --- rolling VARIANCE/STD (rolling.py var/std; cudf rolling aggs) ---------
  // n < 2 in the frame → NULL (pandas ddof=1 semantics). Cross-engine float
  // discipline: values are quantized to cents (exact — quantities are
  // integral doubles), the two window moments Σq and Σq² are INTEGER sums,
  // and var = (n·Σq² − (Σq)²) / (n·(n−1)) / 10⁴ is then a ratio of
  // identical integers on both engines — no summation-order drift before
  // round(…, 6). Same trick as agg_kurt_skew's compact-decimal power sums,
  // applied to a sliding frame.
  register("win_rolling_var",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CASE WHEN cnt > 1 THEN round((cnt * sq2 - sq * sq)
      |      / (cnt * (cnt - 1.0)) / 10000, 6) END AS roll_var,
      |  CASE WHEN cnt > 1 THEN round(sqrt((cnt * sq2 - sq * sq)
      |      / (cnt * (cnt - 1.0)) / 10000), 6) END AS roll_std
      |FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
      |    CAST(sum(q) OVER w AS DOUBLE) AS sq,
      |    CAST(sum(q * q) OVER w AS DOUBLE) AS sq2,
      |    count(*) OVER w AS cnt
      |  FROM (SELECT *, CAST(round(l_quantity * 100) AS BIGINT) AS q
      |        FROM lineitem WHERE l_suppkey <= 20)
      |  WINDOW w AS (PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(liOrder.map(col): _*)
      .rowsBetween(-3, 0)
    val base = Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("q", round(col("l_quantity") * 100).cast(LongType))
      .withColumn("sq", sum(col("q")).over(w).cast(DoubleType))
      .withColumn("sq2", sum(col("q") * col("q")).over(w).cast(DoubleType))
      .withColumn("cnt", count(lit(1)).over(w))
    val variance = (col("cnt") * col("sq2") - col("sq") * col("sq")) /
      (col("cnt") * (col("cnt") - 1.0)) / 10000
    base
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        when(col("cnt") > 1, round(variance, 6)).as("roll_var"),
        when(col("cnt") > 1, round(sqrt(variance), 6)).as("roll_std"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }
}
