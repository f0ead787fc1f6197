package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GF._

/** Full cuDF aggregation-kind inventory (SURVEY §2.4; reference
  * cpp/include/cudf/aggregation.hpp:59-90): SUM, PRODUCT, MIN, MAX,
  * COUNT_VALID, COUNT_ALL, ANY, ALL, SUM_OF_SQUARES, MEAN, VARIANCE, STD,
  * MEDIAN, QUANTILE, ARGMAX, ARGMIN, NUNIQUE, NTH_ELEMENT, COLLECT_LIST,
  * COLLECT_SET, plus reductions (whole-column scalar) and value_counts /
  * mode / cov / corr / kurtosis / skew from the python layer.
  *
  * Determinism engineering for the oracle hash gate (all values in the
  * testdata are 2-decimal doubles):
  *  - VARIANCE/STD are computed from exact decimal sums via the
  *    (Σx² − (Σx)²/n)/(n−1) identity — not the engine's streaming var —
  *    so Spark and DuckDB evaluate the identical double expression.
  *  - ARGMIN/ARGMAX use a lexicographic (value, key) tie-break.
  *  - PRODUCT is folded over scaled integers (x·100 as BIGINT), exact in
  *    both engines, then lowered to double.
  *  - COLLECT_LIST/SET are sorted before comparison.
  *
  * Scale notes: everything is a single partial+final hash aggregate over the
  * fact table — one shuffle on the grouping key, no row explosion. The
  * identity-based variance keeps it a single pass (cuDF's M2/MERGE_M2 partial
  * kinds correspond exactly to Spark's partial aggregation of these sums).
  */
object AggregationQueries extends QueryPack {

  private def decQ(c: Column) = c.cast(DecimalType(12, 2))

  // --- SUM / MIN / MAX / MEAN / COUNT_VALID / COUNT_ALL ---------------------
  // COUNT_VALID vs COUNT_ALL needs nulls: nullif(l_discount, 0.0) introduces
  // them (cudf null_policy {EXCLUDE, INCLUDE}, types.hpp:127).
  register("agg_kinds_basic",
    """SELECT l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      |  count(nullif(l_discount, 0.0)) AS count_valid,
      |  count(*) AS count_all,
      |  CAST(sum(CAST(nullif(l_discount, 0.0) AS DECIMAL(4,2))) AS DOUBLE) AS sum_nullable
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        sum(decQ(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        count(nullif(col("l_discount"), lit(0.0))).as("count_valid"),
        count(lit(1)).as("count_all"),
        sum(nullif(col("l_discount"), lit(0.0)).cast(DecimalType(4, 2)))
          .cast(DoubleType).as("sum_nullable"))
      .orderBy(col("l_linestatus"))
  }

  // --- ANY / ALL (aggregation.hpp ANY, ALL) ---------------------------------
  register("agg_any_all",
    """SELECT l_returnflag,
      |  bool_or(l_discount > 0.09) AS any_high_disc,
      |  bool_and(l_quantity >= 1) AS all_qty_pos,
      |  bool_and(l_tax < 0.05) AS all_low_tax
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        bool_or(col("l_discount") > 0.09).as("any_high_disc"),
        bool_and(col("l_quantity") >= 1).as("all_qty_pos"),
        bool_and(col("l_tax") < 0.05).as("all_low_tax"))
      .orderBy(col("l_returnflag"))
  }

  // --- SUM_OF_SQUARES / VARIANCE / STD via exact-sum identity ---------------
  register("agg_var_std",
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_sq,
      |  (CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |   - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |     * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
      |   / (count(*) - 1) AS var_qty,
      |  sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |   - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |     * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
      |   / (count(*) - 1)) AS std_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val q = decQ(col("l_quantity"))
    val sumSq = sum(q * q).cast(DoubleType)
    val sm = sum(q).cast(DoubleType)
    val n = count(lit(1))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(sumSq.as("sum_sq"), sm.as("s"), n.as("n"))
      .select(
        col("l_returnflag"),
        col("sum_sq"),
        ((col("sum_sq") - col("s") * col("s") / col("n")) / (col("n") - 1)).as("var_qty"),
        sqrt((col("sum_sq") - col("s") * col("s") / col("n")) / (col("n") - 1)).as("std_qty"))
      .orderBy(col("l_returnflag"))
  }

  // --- MEDIAN / QUANTILE (sort-groupby path, cpp/src/groupby/sort) ----------
  register("agg_median_quantile",
    """SELECT l_returnflag,
      |  median(l_quantity) AS med_qty,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.75) AS q75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.75)").as("q75"))
      .orderBy(col("l_returnflag"))
  }

  // --- approximate quantile sketch (the 100-TB quantile tier) ---------------
  // percentile_approx is the mergeable-sketch quantile — fixed per-group
  // state vs exact percentile's full sort — the same exact-vs-sketch
  // pairing as agg_approx_distinct. The oracle checks exact quantiles
  // (engine-matched, as in agg_median_quantile) plus a generous error band
  // on the sketch, valid at any sf; l_quantity spans [1, 50] so an absolute
  // band of 1.0 admits ~2% rank error while still failing on any real
  // sketch regression.
  register("agg_approx_quantile",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS ex50,
      |  quantile_cont(l_quantity, 0.9) AS ex90,
      |  true AS apx50_ok, true AS apx90_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("ex50"),
        expr("percentile(l_quantity, 0.9)").as("ex90"),
        expr("percentile_approx(l_quantity, 0.5, 10000)").as("apx50"),
        expr("percentile_approx(l_quantity, 0.9, 10000)").as("apx90"))
      .select(col("l_returnflag"), col("ex50"), col("ex90"),
        (abs(col("apx50") - col("ex50")) <= 1.0).as("apx50_ok"),
        (abs(col("apx90") - col("ex90")) <= 1.0).as("apx90_ok"))
      .orderBy(col("l_returnflag"))
  }

  // --- ARGMIN / ARGMAX (idxmin/idxmax) with lexicographic tie-break ---------
  register("agg_argmin_argmax",
    """WITH mx AS (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rmax,
      |    row_number() OVER (PARTITION BY l_returnflag
      |                       ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber) AS rmin
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  max(CASE WHEN rmax = 1 THEN l_orderkey END) AS argmax_order,
      |  max(CASE WHEN rmax = 1 THEN l_extendedprice END) AS max_price,
      |  max(CASE WHEN rmin = 1 THEN l_orderkey END) AS argmin_order,
      |  max(CASE WHEN rmin = 1 THEN l_extendedprice END) AS min_price
      |FROM mx WHERE rmax = 1 OR rmin = 1
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    // Spark side: ONE partial+final hash aggregate via max_by/min_by over a
    // unique (value, tie-break) struct — no window, no skewed 3-task sort.
    // The struct composite is unique ((l_orderkey, l_linenumber) is the PK),
    // so max_by/min_by are deterministic; -key inverts tie-break direction so
    // equal prices pick the SMALLEST (orderkey, linenumber), matching the
    // oracle's row_number ordering. (Oracle SQL keeps the window form — it
    // runs once in DuckDB on small data; only the Spark plan must scale.)
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .groupBy(col("l_returnflag"))
      .agg(
        max_by(col("l_orderkey"),
          struct(col("l_extendedprice"), -col("l_orderkey"), -col("l_linenumber")))
          .as("argmax_order"),
        max(col("l_extendedprice")).as("max_price"),
        min_by(col("l_orderkey"),
          struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")))
          .as("argmin_order"),
        min(col("l_extendedprice")).as("min_price"))
      .orderBy(col("l_returnflag"))
  }

  // --- NTH_ELEMENT (aggregation.hpp NTH_ELEMENT; order = shipdate,key) ------
  register("agg_nth_element",
    """WITH r AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_orderpriority, o_orderkey AS nth_orderkey, o_totalprice AS nth_price
      |FROM r WHERE rn = 3 ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 3)
      .select(col("o_orderpriority"), col("o_orderkey").as("nth_orderkey"),
        col("o_totalprice").as("nth_price"))
      .orderBy(col("o_orderpriority"))
  }

  // --- COLLECT_LIST / COLLECT_SET (sorted for cross-engine determinism) -----
  // collected lists flattened to CSV strings — driver compare is not
  // array-aware; collect_list/collect_set still run in the plan.
  register("agg_collect",
    """SELECT l_orderkey,
      |  array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS lines,
      |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
      |FROM lineitem WHERE l_orderkey <= 100
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 100)
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(transform(sort_array(collect_list(col("l_linenumber"))),
          _.cast(StringType)), ",").as("lines"),
        array_join(sort_array(collect_set(col("l_returnflag"))), ",").as("flags"))
      .orderBy(col("l_orderkey"))
  }

  // --- PRODUCT over ALL per-group values (cuDF PRODUCT semantics,
  // aggregation.hpp:60 — not distinct). Groups can exceed what a BIGINT fold
  // holds (108^13 > 2^63), so the fold runs in DOUBLE over the SORTED value
  // list: identical fold order → identical IEEE-754 multiply sequence in
  // both engines → bit-deterministic despite fp non-associativity.
  register("agg_product",
    """SELECT l_orderkey,
      |  list_reduce(list_sort(list(CAST(round((1 + l_tax) * 100) AS DOUBLE))),
      |              (a, b) -> a * b)
      |    / power(100, count(*)) AS tax_factor
      |FROM lineitem WHERE l_orderkey <= 100
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 100)
      .groupBy(col("l_orderkey"))
      .agg(
        (aggregate(
          sort_array(collect_list(round((lit(1) + col("l_tax")) * 100).cast(DoubleType))),
          lit(1.0), (acc, v) => acc * v)
          / pow(lit(100.0), count(lit(1)))).as("tax_factor"))
      .orderBy(col("l_orderkey"))
  }

  // --- value_counts / mode (series.py:5091, :4690) --------------------------
  register("agg_value_counts",
    """SELECT o_orderpriority AS value, count(*) AS count
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY count DESC, value""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("value"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("value"))
  }

  register("agg_mode",
    """WITH vc AS (
      |  SELECT l_returnflag, l_quantity, count(*) AS c,
      |    row_number() OVER (PARTITION BY l_returnflag
      |                       ORDER BY count(*) DESC, l_quantity) AS rn
      |  FROM lineitem GROUP BY l_returnflag, l_quantity)
      |SELECT l_returnflag, l_quantity AS mode_qty, c AS mode_count
      |FROM vc WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("c").desc, col("l_quantity"))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
        col("c").as("mode_count"))
      .orderBy(col("l_returnflag"))
  }

  // --- cov / corr via exact-sum identities (dataframe.py:7448,7465) ---------
  register("agg_cov_corr",
    """WITH s AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
      |  FROM lineitem)
      |SELECT (sxy - sx*sy/n) / (n-1) AS cov_qty_price,
      |  (sxy - sx*sy/n) / (n-1) / (sqrt((sxx - sx*sx/n)/(n-1)) * sqrt((syy - sy*sy/n)/(n-1))) AS corr_qty_price
      |FROM s""".stripMargin) { (s, d) =>
    val x = decQ(col("l_quantity"))
    val y = decQ(col("l_extendedprice"))
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum(x * y).cast(DoubleType).as("sxy"),
        sum(x * x).cast(DoubleType).as("sxx"),
        sum(y * y).cast(DoubleType).as("syy"))
      .select(
        ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)).as("cov_qty_price"),
        (((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
          / (sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
            * sqrt((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1))))
          .as("corr_qty_price"))
  }

  // --- whole-column reductions (reduction.hpp:66; series.py:4110) -----------
  register("agg_reduce_scalar",
    """SELECT
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  min(o_totalprice) AS min_p, max(o_totalprice) AS max_p,
      |  count(*) AS n, count(DISTINCT o_custkey) AS n_cust,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS mean_p
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .agg(
        sum(decQ(col("o_totalprice"))).cast(DoubleType).as("total"),
        min(col("o_totalprice")).as("min_p"),
        max(col("o_totalprice")).as("max_p"),
        count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        (sum(decQ(col("o_totalprice"))).cast(DoubleType) / count(lit(1))).as("mean_p"))
  }

  // --- multi-agg dict normalization (groupby.py:140 agg({'b':['min','mean']}))
  register("agg_multi_per_column",
    """SELECT c_mktsegment,
      |  min(c_acctbal) AS bal_min, max(c_acctbal) AS bal_max,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS bal_mean,
      |  count(*) AS n
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(
        min(col("c_acctbal")).as("bal_min"),
        max(col("c_acctbal")).as("bal_max"),
        (sum(decQ(col("c_acctbal"))).cast(DoubleType) / count(lit(1))).as("bal_mean"),
        count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  // --- kurtosis / skew (dataframe.py:6869,6922; pandas G1/G2 sample-adjusted
  // normalization, matching cuDF). Central moments derived from EXACT scaled-
  // integer power sums (q = 100·x ≤ 5100 so q⁴ ≤ 6.8e14 fits DECIMAL(18,0)
  // per term — the long-backed compact representation; the DECIMAL(28,0)
  // sum accumulator holds 10¹²-row totals losslessly). Both engines evaluate
  // the identical double formula on identical integers — one partial+final
  // hash aggregate, no second pass. Measured: DECIMAL(38,0) terms forced the
  // BigDecimal path and cost 3.2 s at sf0.1; compact 18,0 runs 0.85 s.
  // G1/G2 are scale-invariant in q, so no descaling needed.
  register("agg_kurt_skew",
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(q AS DECIMAL(18,0))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(q*q AS DECIMAL(18,0))) AS DOUBLE) AS s2,
      |    CAST(sum(CAST(q*q*q AS DECIMAL(18,0))) AS DOUBLE) AS s3,
      |    CAST(sum(CAST(q*q*q*q AS DECIMAL(18,0))) AS DOUBLE) AS s4
      |  FROM (SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS q FROM lineitem)
      |  GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |  round(sqrt(CAST(n*(n-1) AS DOUBLE)) / (n-2)
      |    * ((s3 - 3*s1*s2/n + 2*s1*s1*s1/(CAST(n AS DOUBLE)*n))/n)
      |    / power((s2 - s1*s1/n)/n, 1.5), 9) AS skew_q,
      |  round((CAST(n*n - 1 AS DOUBLE) * ((s4 - 4*s1*s3/n + 6*s1*s1*s2/(CAST(n AS DOUBLE)*n)
      |        - 3*s1*s1*s1*s1/(CAST(n AS DOUBLE)*n*n))/n)
      |      / (((s2 - s1*s1/n)/n) * ((s2 - s1*s1/n)/n))
      |    - 3.0*(n-1)*(n-1)) / (CAST(n-2 AS DOUBLE)*(n-3)), 9) AS kurt_q
      |FROM s ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val q = round(col("l_quantity") * 100).cast(LongType)
    val dec = (c: Column) => sum(c.cast(DecimalType(18, 0))).cast(DoubleType)
    val base = Tables.lineitem(s, d)
      .select(col("l_returnflag"), q.as("q"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dec(col("q")).as("s1"),
        dec(col("q") * col("q")).as("s2"),
        dec(col("q") * col("q") * col("q")).as("s3"),
        dec(col("q") * col("q") * col("q") * col("q")).as("s4"))
    val n = col("n"); val s1 = col("s1"); val s2 = col("s2")
    val s3 = col("s3"); val s4 = col("s4")
    val nD = n.cast(DoubleType)
    val m2 = (s2 - s1 * s1 / n) / n
    val m3 = (s3 - lit(3) * s1 * s2 / n + lit(2) * s1 * s1 * s1 / (nD * n)) / n
    val m4 = (s4 - lit(4) * s1 * s3 / n + lit(6) * s1 * s1 * s2 / (nD * n)
      - lit(3) * s1 * s1 * s1 * s1 / (nD * n * n)) / n
    base.select(col("l_returnflag"),
      round(sqrt((n * (n - 1)).cast(DoubleType)) / (n - 2) * m3 / pow(m2, 1.5), 9)
        .as("skew_q"),
      round(((n * n - 1).cast(DoubleType) * m4 / (m2 * m2)
        - lit(3.0) * (n - 1) * (n - 1)) / ((n - 2).cast(DoubleType) * (n - 3)), 9)
        .as("kurt_q"))
      .orderBy(col("l_returnflag"))
  }

  // --- describe (dataframe.py:5323): count/mean/std/min/quartiles/max -------
  // One aggregate pass, then stack() to (stat, value) rows.
  register("agg_describe",
    """WITH a AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS count_v,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS mean_v,
      |    sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |      - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |        * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)) / (count(*) - 1)) AS std_v,
      |    min(l_quantity) AS min_v,
      |    quantile_cont(l_quantity, 0.25) AS q25_v,
      |    quantile_cont(l_quantity, 0.50) AS q50_v,
      |    quantile_cont(l_quantity, 0.75) AS q75_v,
      |    max(l_quantity) AS max_v
      |  FROM lineitem)
      |SELECT stat, value FROM (
      |  SELECT 'count' AS stat, count_v AS value FROM a UNION ALL
      |  SELECT 'mean', mean_v FROM a UNION ALL
      |  SELECT 'std', std_v FROM a UNION ALL
      |  SELECT 'min', min_v FROM a UNION ALL
      |  SELECT '25%', q25_v FROM a UNION ALL
      |  SELECT '50%', q50_v FROM a UNION ALL
      |  SELECT '75%', q75_v FROM a UNION ALL
      |  SELECT 'max', max_v FROM a)
      |ORDER BY stat""".stripMargin) { (s, d) =>
    val qd = decQ(col("l_quantity"))
    val a = Tables.lineitem(s, d)
      .agg(
        count(lit(1)).cast(DoubleType).as("count_v"),
        (sum(qd).cast(DoubleType) / count(lit(1))).as("mean_v"),
        sqrt((sum(qd * qd).cast(DoubleType)
          - sum(qd).cast(DoubleType) * sum(qd).cast(DoubleType) / count(lit(1)))
          / (count(lit(1)) - 1)).as("std_v"),
        min(col("l_quantity")).as("min_v"),
        expr("percentile(l_quantity, 0.25)").as("q25_v"),
        expr("percentile(l_quantity, 0.50)").as("q50_v"),
        expr("percentile(l_quantity, 0.75)").as("q75_v"),
        max(col("l_quantity")).as("max_v"))
    a.select(expr(
      """stack(8,
        |  'count', count_v, 'mean', mean_v, 'std', std_v, 'min', min_v,
        |  '25%', q25_v, '50%', q50_v, '75%', q75_v, 'max', max_v)
        |  AS (stat, value)""".stripMargin))
      .orderBy("stat")
  }

  // --- approximate distinct-count sketch (HyperLogLog++) --------------------
  // The sketch estimate is deterministic (order-independent merge, no
  // randomness). The oracle checks exact distinct counts (DuckDB-computable
  // at ANY scale factor) plus a 5% relative-error band on the sketch (rsd
  // is 2%, so the band holds with huge margin at every sf) — so the gate is
  // sf-independent while still failing on sketch-parameter or merge
  // regressions. Exact sketch values are additionally pinned in
  // AggregationGoldenSpec against the fixed sf0.001 fixture.
  // At 100 TB this is THE distinct-count: fixed ~kB state per group vs
  // countDistinct's shuffle of every distinct value.
  register("agg_approx_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  true AS apx_parts_ok, true AS apx_orders_ok
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    // TWO scans instead of three (r20; guide §2.3/§2.4): the HLL sketches
    // ride the per-column distinct passes instead of a third dedicated
    // pass — an HLL sketch is a pure function of the distinct VALUE SET
    // (registers are maxima over per-value hashes; duplicates are no-ops),
    // so approx_count_distinct over the deduped (flag, key) relation is
    // bit-identical to running it over the raw rows, and it now runs
    // PARALLEL over the post-shuffle dedup partitions rather than inside
    // the serial single-row-group scan. Two countDistincts in one agg
    // would plan an Expand (row multiplier) — measured 11.1 s at sf0.1;
    // a fully fused single-pass variant (2× explode + one dedup) was
    // measured-and-rejected in r20 (warm 1.18 → 2.10 s: the doubled rows
    // make the serial scan-side partial aggregate the bottleneck).
    val li = Tables.lineitem(s, d)
    val ep = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("apx_parts"))
    val eo = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(count(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("apx_orders"))
    ep.join(eo, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        (abs(col("apx_parts") - col("exact_parts"))
          <= col("exact_parts") * 0.05).as("apx_parts_ok"),
        (abs(col("apx_orders") - col("exact_orders"))
          <= col("exact_orders") * 0.05).as("apx_orders_ok"))
      .orderBy(col("l_returnflag"))
  }

  // --- grouping sets / rollup / cube (free Spark extension, SURVEY §2.4) ----
  register("agg_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin) { (s, d) =>
    // HIERARCHICAL re-aggregation instead of .rollup(): Spark plans rollup
    // via Expand — every fact row is tripled (one copy per grouping set)
    // BEFORE the first exchange. count and the exact DECIMAL sum are both
    // re-aggregable, so the two coarser levels are derived from the
    // finest level's tiny result (|flags|·|statuses| rows) instead of
    // from three copies of the fact. Identical values: sum of per-group
    // exact-decimal sums = the direct decimal sum; counts likewise.
    val fine = graft.ops.OrderedOps.pinned(
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(decQ(col("l_quantity"))).as("sq")))
    val lvl1 = fine.groupBy(col("l_returnflag"))
      .agg(sum(col("n")).as("n"), sum(col("sq")).as("sq"))
      .select(col("l_returnflag"), lit(null).cast(StringType).as("l_linestatus"),
        col("n"), col("sq"))
    val total = fine.agg(sum(col("n")).as("n"), sum(col("sq")).as("sq"))
      .select(lit(null).cast(StringType).as("l_returnflag"),
        lit(null).cast(StringType).as("l_linestatus"), col("n"), col("sq"))
    fine.unionByName(lvl1).unionByName(total)
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sq").cast(DoubleType).as("sum_qty"))
      .orderBy(col("flag"), col("status"))
  }

  // --- quantile interpolation modes (types.hpp interpolation enum; ----------
  // quantiles.hpp:52). Spark's percentile() is LINEAR only; LOWER / HIGHER /
  // NEAREST / MIDPOINT come from the sorted position directly: with n values
  // and p·(n−1) = pos, pick rank floor(pos) / ceil(pos) / floor(pos+0.5)
  // (half-up — rint's half-even documented as the one deviation) and compose.
  // Single per-group window + one aggregate — parallel over groups, no
  // global sort.
  register("agg_quantile_interp",
    """WITH v AS (SELECT l_returnflag AS flag, l_quantity AS v,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) - 1 AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem),
      |q AS (SELECT flag,
      |    max(CASE WHEN rn = floor(0.35 * (n - 1)) THEN v END) AS q_lower,
      |    max(CASE WHEN rn = ceil(0.35 * (n - 1)) THEN v END) AS q_higher,
      |    max(CASE WHEN rn = floor(0.35 * (n - 1) + 0.5) THEN v END) AS q_nearest,
      |    max(0.35 * (n - 1) - floor(0.35 * (n - 1))) AS frac
      |  FROM v GROUP BY flag)
      |SELECT flag, q_lower, q_higher, q_nearest,
      |  round((q_lower + q_higher) / 2, 6) AS q_midpoint,
      |  round(q_lower + (q_higher - q_lower) * frac, 6) AS q_linear
      |FROM q ORDER BY flag""".stripMargin) { (s, d) =>
    // Scale path: rank the VALUE HISTOGRAM, not the rows. The groupBy below
    // partial-aggregates map-side, so the shuffle carries (group, value,
    // count) — ≤ groups·|distinct values| rows — and the rank window runs
    // over that tiny relation instead of sorting the fact table (the oracle
    // SQL ranks rows directly; same result, DuckDB's cost). Value v covers
    // 0-based sorted ranks [cum−cnt, cum−1]; each interpolation rank is
    // looked up in that range.
    val p = lit(0.35)
    val hist = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("flag")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("flag"))
    val pos = p * (col("n") - 1)
    val covers = (r: Column) => r.between(col("cum") - col("cnt"), col("cum") - 1)
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("flag"))
      .agg(
        max(when(covers(floor(pos)), col("v"))).as("q_lower"),
        max(when(covers(ceil(pos)), col("v"))).as("q_higher"),
        max(when(covers(floor(pos + 0.5)), col("v"))).as("q_nearest"),
        max(pos - floor(pos)).as("frac"))
      .select(col("flag"), col("q_lower"), col("q_higher"), col("q_nearest"),
        round((col("q_lower") + col("q_higher")) / 2, 6).as("q_midpoint"),
        round(col("q_lower") + (col("q_higher") - col("q_lower")) * col("frac"), 6)
          .as("q_linear"))
      .orderBy(col("flag"))
  }

  // --- min-max scaling (series.py:5213 scale: (x − min)/(max − min)) --------
  // One reduction pass for (min, max), broadcast back over the rows as a
  // codegen projection — the classic two-job normalize, no shuffle of the
  // fact table itself.
  register("agg_scale_minmax",
    """WITH mm AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      |  FROM lineitem WHERE l_orderkey <= 2000)
      |SELECT l_orderkey, l_linenumber,
      |  round((l_extendedprice - lo) / (hi - lo), 6) AS scaled
      |FROM lineitem, mm WHERE l_orderkey <= 2000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val base = Tables.lineitem(s, d).filter(col("l_orderkey") <= 2000)
    val mm = base.agg(min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi"))
    base.crossJoin(broadcast(mm))
      .select(col("l_orderkey"), col("l_linenumber"),
        round((col("l_extendedprice") - col("lo")) / (col("hi") - col("lo")), 6)
          .as("scaled"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- axis=1 (row-wise) reductions (dataframe.py sum/min/max/mean axis=1) --
  // pandas-style horizontal reductions: per-row folds over the column set,
  // pure codegen expressions — no aggregation, no shuffle beyond the output
  // sort. Row-local double arithmetic is order-fixed, so no decimal pattern
  // is needed.
  register("agg_rowwise",
    """SELECT l_orderkey, l_linenumber,
      |  round(l_quantity + l_discount + l_tax, 6) AS row_sum,
      |  least(l_quantity, l_discount, l_tax) AS row_min,
      |  greatest(l_quantity, l_discount, l_tax) AS row_max,
      |  round((l_quantity + l_discount + l_tax) / 3, 6) AS row_mean,
      |  CAST(l_quantity IS NOT NULL AS INT) + CAST(l_discount IS NOT NULL AS INT)
      |    + CAST(l_tax IS NOT NULL AS INT) AS row_count
      |FROM lineitem WHERE l_orderkey <= 500 ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val cols = Seq(col("l_quantity"), col("l_discount"), col("l_tax"))
    val rowSum = cols.reduce(_ + _)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(rowSum, 6).as("row_sum"),
        least(cols: _*).as("row_min"),
        greatest(cols: _*).as("row_max"),
        round(rowSum / 3, 6).as("row_mean"),
        cols.map(c => c.isNotNull.cast(IntegerType)).reduce(_ + _).as("row_count"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- full correlation matrix in ONE pass (dataframe.py:7448 corr) ---------
  // All pairwise correlations of k columns from a single aggregation: k
  // first-moment + k(k+1)/2 second-moment sums, then the k(k-1)/2 corrs are
  // driver-side arithmetic on one row. Inputs are floor-quantized to integer
  // units (tie-free across engines, and correlation is affine-invariant so
  // the quantized corr is the defined semantic); moment products stay in
  // compact DECIMAL(18,0) — long-backed on the fast path at sf0.1, promoted
  // losslessly by the DECIMAL(28,0) sum accumulator at 10¹²-row scale where
  // a BIGINT sum would silently overflow.
  register("agg_corr_matrix",
    """WITH q AS (SELECT CAST(floor(l_quantity * 100) AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice) AS BIGINT) AS y,
      |    CAST(floor(l_discount * 1000000) AS BIGINT) AS z
      |  FROM lineitem),
      |s AS (SELECT count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(z AS DECIMAL(18,0))) AS DOUBLE) AS sz,
      |    CAST(sum(CAST(x*x AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(y*y AS DECIMAL(18,0))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(z*z AS DECIMAL(18,0))) AS DOUBLE) AS szz,
      |    CAST(sum(CAST(x*y AS DECIMAL(18,0))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(x*z AS DECIMAL(18,0))) AS DOUBLE) AS sxz,
      |    CAST(sum(CAST(y*z AS DECIMAL(18,0))) AS DOUBLE) AS syz
      |  FROM q)
      |SELECT
      |  round((sxy - sx*sy/n) / (sqrt(sxx - sx*sx/n) * sqrt(syy - sy*sy/n)), 6) AS corr_qty_price,
      |  round((sxz - sx*sz/n) / (sqrt(sxx - sx*sx/n) * sqrt(szz - sz*sz/n)), 6) AS corr_qty_disc,
      |  round((syz - sy*sz/n) / (sqrt(syy - sy*sy/n) * sqrt(szz - sz*sz/n)), 6) AS corr_price_disc
      |FROM s""".stripMargin) { (s, d) =>
    val dec18 = (c: Column) => sum(c.cast(DecimalType(18, 0))).cast(DoubleType)
    val base = Tables.lineitem(s, d)
      .select(floor(col("l_quantity") * 100).cast(LongType).as("x"),
        floor(col("l_extendedprice")).cast(LongType).as("y"),
        floor(col("l_discount") * 1000000).cast(LongType).as("z"))
      .agg(count(lit(1)).as("n"),
        dec18(col("x")).as("sx"), dec18(col("y")).as("sy"), dec18(col("z")).as("sz"),
        dec18(col("x") * col("x")).as("sxx"), dec18(col("y") * col("y")).as("syy"),
        dec18(col("z") * col("z")).as("szz"), dec18(col("x") * col("y")).as("sxy"),
        dec18(col("x") * col("z")).as("sxz"), dec18(col("y") * col("z")).as("syz"))
    def corr(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column) =
      round((sab - sa * sb / col("n")) /
        (sqrt(saa - sa * sa / col("n")) * sqrt(sbb - sb * sb / col("n"))), 6)
    base.select(
      corr(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy")).as("corr_qty_price"),
      corr(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz")).as("corr_qty_disc"),
      corr(col("syz"), col("sy"), col("sz"), col("syy"), col("szz")).as("corr_price_disc"))
  }

  // --- groupby(dropna=True): null keys form NO group ------------------------
  // (groupby.py dropna; pandas default.) A REAL cross-engine divergence:
  // Spark's groupBy (and SQL GROUP BY) keep a null-key group, so the cuDF
  // default needs an explicit null-key filter BEFORE the aggregation — which
  // also pushes to the scan, shrinking the shuffle by the null fraction.
  // The dropped mass is accounted in a sentinel row so the oracle proves
  // rows were dropped rather than silently missing.
  register("agg_groupby_dropna",
    """WITH k AS (SELECT nullif(lang, 'de') AS key, n_chars FROM documents)
      |SELECT * FROM (
      |  SELECT key, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      |  FROM k WHERE key IS NOT NULL GROUP BY key
      |  UNION ALL
      |  SELECT '__dropped__', count(*), CAST(sum(n_chars) AS BIGINT)
      |  FROM k WHERE key IS NULL)
      |ORDER BY key""".stripMargin) { (s, d) =>
    val k = Tables.documents(s, d)
      .select(nullif(col("lang"), lit("de")).as("key"), col("n_chars"))
    val grouped = k.filter(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    val dropped = k.filter(col("key").isNull)
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .select(lit("__dropped__").as("key"), col("n"), col("chars"))
    grouped.unionByName(dropped).orderBy("key")
  }
}
