package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.frame.{GdfSeries, MultiIndexFrame}
import graft.functions.GF

/** Oracle-gated coverage for the Series and MultiIndex facades
  * (SURVEY §1.4; reference python/cudf/cudf/core/series.py:1331 binop
  * dispatch, core/multiindex.py, core/reshape.py:843 stack / :924 unstack).
  *
  * Every query here drives [[graft.frame.GdfSeries]] /
  * [[graft.frame.MultiIndexFrame]] — NOT hand-inlined SQL-ish plans — so the
  * facade semantics (outer alignment, fill-before-op, both-null-stays-null,
  * dynamic pivot-value discovery, dropna stack) are what the DuckDB oracle
  * actually checks.
  *
  * Scale notes: alignment is one shuffle join on the label; unstack is one
  * hash aggregation whose pivot-value discovery is a bounded distinct on the
  * level column (spark.sql.pivotMaxValues caps it); stack is a generator
  * projection (no shuffle); groupbyLevel/aggDict are plain hash aggregations
  * with map-side partials. Nothing funnels through the driver.
  */
object SeriesQueries extends QueryPack {

  // --- Series.add with fill_value: outer alignment (series.py:1331) ---------
  // Label bands: 0-199 left-only, 200-299 on both sides, 300-399 right-only.
  // Right values are NULLed at custkey%10==0, so right-only-with-NULL labels
  // exercise the pandas rule "a label missing (or NaN) on BOTH sides stays
  // NaN even with fill_value"; every other label gets fill-before-add.
  register("series_aligned_binop",
    """WITH l AS (SELECT o_custkey AS custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lv
      |  FROM orders WHERE o_custkey < 300 GROUP BY 1),
      |r AS (SELECT c_custkey AS custkey,
      |    CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS rv
      |  FROM customer WHERE c_custkey BETWEEN 200 AND 399)
      |SELECT COALESCE(l.custkey, r.custkey) AS custkey,
      |  CASE WHEN l.lv IS NULL AND r.rv IS NULL THEN NULL
      |       ELSE round(COALESCE(l.lv, 0) + COALESCE(r.rv, 0), 2) END AS total
      |FROM l FULL OUTER JOIN r ON l.custkey = r.custkey
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val spend = Tables.orders(s, d)
      .filter(col("o_custkey") < 300)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(GF.sumMoney(col("o_totalprice")).as("spend"))
    val bal = Tables.customer(s, d)
      .filter(col("c_custkey").between(200, 399))
      .select(col("c_custkey").as("custkey"),
        when(col("c_custkey") % 10 === 0, lit(null).cast(DoubleType))
          .otherwise(col("c_acctbal")).as("bal"))
    GdfSeries(spend, "custkey", "spend")
      .add(GdfSeries(bal, "custkey", "bal"), "total", fill = Some(lit(0.0)))
      .toDF
      .withColumn("total", round(col("total"), 2))
  }

  // --- Series.combine_first: this side wins where present (series.py) -------
  register("series_combine_first",
    """WITH a AS (SELECT c_custkey AS custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS v
      |  FROM customer WHERE c_custkey <= 250),
      |b AS (SELECT c_custkey AS custkey, c_acctbal + 1000.0 AS v
      |  FROM customer WHERE c_custkey BETWEEN 150 AND 400)
      |SELECT COALESCE(a.custkey, b.custkey) AS custkey, COALESCE(a.v, b.v) AS bal
      |FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val s1 = Tables.customer(s, d)
      .filter(col("c_custkey") <= 250)
      .select(col("c_custkey").as("custkey"),
        when(col("c_custkey") % 7 === 0, lit(null).cast(DoubleType))
          .otherwise(col("c_acctbal")).as("v"))
    val s2 = Tables.customer(s, d)
      .filter(col("c_custkey").between(150, 400))
      .select(col("c_custkey").as("custkey"), (col("c_acctbal") + 1000.0).as("v"))
    GdfSeries(s1, "custkey", "v")
      .combineFirst(GdfSeries(s2, "custkey", "v"), "bal")
      .toDF
  }

  // --- MultiIndex.groupby(level=[0,1]) (multiindex.py _get_grouper) ---------
  register("mi_groupby_level",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val mi = MultiIndexFrame(
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_quantity"),
      Seq("l_returnflag", "l_linestatus", "l_orderkey"))
    mi.groupbyLevel(Seq(0, 1))(
        Seq(GF.sumMoney(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // --- unstack with RUNTIME value discovery (reshape.py:924) ----------------
  // No hardcoded pivot-value list anywhere on the Spark side: the column set
  // (A/N/R) is discovered from the data by Spark's pivot, exactly as the
  // DuckDB PIVOT discovers its own — retiring the §2.7 "static values only"
  // partial.
  register("mi_unstack_dynamic",
    """SELECT * FROM (
      |  PIVOT (SELECT l_linestatus, l_returnflag,
      |           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |         FROM lineitem GROUP BY 1, 2)
      |  ON l_returnflag USING first(qty) GROUP BY l_linestatus)
      |ORDER BY l_linestatus""".stripMargin) { (s, d) =>
    val agg = Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"), col("l_returnflag"))
      .agg(GF.sumMoney(col("l_quantity")).as("qty"))
    MultiIndexFrame(agg, Seq("l_linestatus", "l_returnflag"))
      .unstack("l_returnflag", "qty")
      .df
      .orderBy("l_linestatus")
  }

  // --- unstack → stack roundtrip, pandas dropna semantics (reshape.py:843) --
  // One (status, flag) combination is filtered out so the unstacked frame has
  // a real NULL cell; stack() emits it and the pandas-default dropna filter
  // removes it — the roundtrip restores exactly the 5 input rows.
  register("mi_stack_roundtrip",
    """SELECT l_linestatus, l_returnflag,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem WHERE NOT (l_linestatus = 'O' AND l_returnflag = 'A')
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val agg = Tables.lineitem(s, d)
      .filter(!(col("l_linestatus") === "O" && col("l_returnflag") === "A"))
      .groupBy(col("l_linestatus"), col("l_returnflag"))
      .agg(GF.sumMoney(col("l_quantity")).as("qty"))
    MultiIndexFrame(agg, Seq("l_linestatus", "l_returnflag"))
      .unstack("l_returnflag", "qty")
      .stack("l_returnflag", "qty")
      .df
      .filter(col("qty").isNotNull) // pandas stack(dropna=True)
      .orderBy("l_linestatus", "l_returnflag")
  }

  // --- dict-style multi-agg → flattened two-level names + outer selector ----
  // (dataframe.py groupby.agg(dict) → MultiIndex columns; selectOuter is the
  // df[col] outer-level selection over the flattened names.)
  register("mi_agg_dict",
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
      |  CAST(min(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_min,
      |  CAST(max(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_max
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val base = Tables.lineitem(s, d).select(
      col("l_returnflag"), col("l_linestatus"),
      GF.dec2(col("l_quantity")).as("qty"))
    MultiIndexFrame(base, Seq("l_returnflag", "l_linestatus"))
      .aggDict(Seq(0), Seq(
        "qty" -> Seq("sum", "min", "max"),
        "l_linestatus" -> Seq("count")))
      .selectOuter("qty")
      .df
      .select(col("l_returnflag"),
        col("qty_sum").cast(DoubleType).as("qty_sum"),
        col("qty_min").cast(DoubleType).as("qty_min"),
        col("qty_max").cast(DoubleType).as("qty_max"))
      .orderBy("l_returnflag")
  }

  // --- xs cross-section + swaplevel + sort_index + head ---------------------
  // xs compiles to a pushed-down filter; swaplevel is pure metadata (level
  // order only — zero data movement); head is TakeOrderedAndProject.
  register("mi_xs_swap",
    """SELECT l_linestatus, l_orderkey, l_linenumber, l_quantity
      |FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linestatus, l_linenumber LIMIT 50""".stripMargin) { (s, d) =>
    val mi = MultiIndexFrame(
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_quantity"),
      Seq("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber"))
    mi.xs("R", "l_returnflag")
      .swapLevel(0, 1) // (l_orderkey, l_linestatus, l_linenumber)
      .head(50)
  }

  // --- Series.update: other's non-null values overwrite, labels stay ours ---
  // (series.py:3574). LEFT join on the label — the label set is this
  // series', unlike combine_first's union; corrections present only in the
  // other series are ignored.
  register("series_update",
    """WITH a AS (SELECT c_custkey AS custkey, c_acctbal AS v
      |  FROM customer WHERE c_custkey <= 300),
      |b AS (SELECT c_custkey AS custkey,
      |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE -c_acctbal END AS v
      |  FROM customer WHERE c_custkey BETWEEN 200 AND 500)
      |SELECT a.custkey AS custkey, COALESCE(b.v, a.v) AS bal
      |FROM a LEFT JOIN b ON a.custkey = b.custkey
      |ORDER BY a.custkey""".stripMargin) { (s, d) =>
    val a = Tables.customer(s, d)
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("custkey"), col("c_acctbal").as("v"))
    val b = Tables.customer(s, d)
      .filter(col("c_custkey").between(200, 500))
      .select(col("c_custkey").as("custkey"),
        when(col("c_custkey") % 5 === 0, lit(null).cast(DoubleType))
          .otherwise(-col("c_acctbal")).as("v"))
    GdfSeries(a, "custkey", "v")
      .update(GdfSeries(b, "custkey", "v"), "bal")
      .toDF
  }

  // --- DataFrame.add(other, fill_value): index AND column alignment ---------
  // (dataframe.py _binaryop; ColumnAccessor column union + _align_objs row
  // union). Frame A(spend, cnt) per 1995 customer, frame B(cnt, maxp) per
  // 1996 customer: the result carries columns {spend, cnt, maxp} over the
  // label union — spend/maxp live on one side only (other side all-null, so
  // label-present rows get value+fill and label-absent rows stay null), cnt
  // is filled-before-add on both. One full-outer shuffle join, then codegen.
  register("frame_aligned_add",
    """WITH a AS (SELECT o_custkey AS custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
      |    count(*) AS cnt
      |  FROM orders WHERE year(o_orderdate) = 1995 AND o_custkey <= 400 GROUP BY 1),
      |b AS (SELECT o_custkey AS custkey, count(*) AS cnt, max(o_totalprice) AS maxp
      |  FROM orders WHERE year(o_orderdate) = 1996 AND o_custkey <= 400 GROUP BY 1)
      |SELECT COALESCE(a.custkey, b.custkey) AS custkey,
      |  round(a.spend, 2) AS spend,
      |  CASE WHEN a.cnt IS NULL AND b.cnt IS NULL THEN NULL
      |       ELSE COALESCE(a.cnt, 0) + COALESCE(b.cnt, 0) END AS cnt,
      |  b.maxp AS maxp
      |FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val a = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1995 && col("o_custkey") <= 400)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(GF.sumMoney(col("o_totalprice")).as("spend"), count(lit(1)).as("cnt"))
    val b = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1996 && col("o_custkey") <= 400)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("cnt"), max(col("o_totalprice")).as("maxp"))
    graft.frame.GdfFrame
      .alignedBinop(graft.frame.GdfFrame(a, "custkey"),
        graft.frame.GdfFrame(b, "custkey"), fill = Some(lit(0)))(_ + _)
      .df
      .withColumn("spend", round(col("spend"), 2))
      .orderBy("custkey")
  }

  // --- Series.map with a Series argument (series.py map) --------------------
  // Values looked up in the other series' index; misses → null, labels
  // preserved. The dict side is filtered to n_nationkey < 13 so roughly
  // half the customers exercise the unmatched→null path.
  register("series_map",
    """SELECT c.c_custkey AS custkey, n.n_name AS nation_name
      |FROM customer c LEFT JOIN (SELECT n_nationkey, n_name FROM nation
      |                           WHERE n_nationkey < 13) n
      |  ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_custkey <= 500
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
      .filter(col("c_custkey") <= 500)
      .select(col("c_custkey").as("custkey"), col("c_nationkey"))
    val dict = Tables.nation(s, d)
      .filter(col("n_nationkey") < 13)
      .select(col("n_nationkey"), col("n_name"))
    GdfSeries(cust, "custkey", "c_nationkey")
      .map(GdfSeries(dict, "n_nationkey", "n_name"), "nation_name")
      .toDF
  }

  // --- reindex: conform a frame onto a new label set (frame.py reindex;
  // dataframe.py:2890) -------------------------------------------------------
  // Labels come from ANOTHER relation (the common distributed case — e.g.
  // conforming a feature table onto the training-id universe). Semantics:
  // left-align onto the label set; labels absent from the frame produce
  // all-null rows; frame rows absent from the labels are dropped. One
  // shuffle join on the label; at scale either side may be the big one, so
  // no broadcast hint — AQE picks it when a side is small.
  register("series_reindex",
    """WITH lbl AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_custkey <= 350),
      |v AS (SELECT c_custkey AS custkey, c_acctbal AS bal, c_nationkey AS nk
      |      FROM customer WHERE c_custkey <= 300)
      |SELECT lbl.custkey, v.bal, v.nk
      |FROM lbl LEFT JOIN v USING (custkey)
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val labels = Tables.orders(s, d)
      .filter(col("o_custkey") <= 350)
      .select(col("o_custkey").as("lbl")).distinct()
    val frame = Tables.customer(s, d)
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("custkey"),
        col("c_acctbal").as("bal"), col("c_nationkey").as("nk"))
    graft.frame.GdfFrame(frame, "custkey")
      .reindex(labels, "lbl")
      .df
      .orderBy("custkey")
  }
}
