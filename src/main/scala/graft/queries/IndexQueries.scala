package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.frame.GdfFrame

/** Index/order facade coverage (SURVEY §1.4, §7.1): head/tail in index
  * order, shift/diff along the index with boundary-exact distributed
  * windows, concat(axis=1) outer alignment, materialized RangeIndex.
  */
object IndexQueries extends QueryPack {

  // --- head/tail in index order (frame.py head/tail) ------------------------
  register("idx_head_tail",
    """SELECT * FROM (
      |  SELECT 'head' AS part, c_custkey, c_acctbal FROM customer
      |  ORDER BY c_custkey LIMIT 5)
      |UNION ALL
      |SELECT * FROM (
      |  SELECT 'tail' AS part, c_custkey, c_acctbal FROM customer
      |  ORDER BY c_custkey DESC LIMIT 5)
      |ORDER BY part, c_custkey""".stripMargin) { (s, d) =>
    val f = GdfFrame(Tables.customer(s, d).select("c_custkey", "c_acctbal"), "c_custkey")
    f.head(5).withColumn("part", lit("head"))
      .unionByName(f.tail(5).withColumn("part", lit("tail")))
      .select("part", "c_custkey", "c_acctbal")
      .orderBy("part", "c_custkey")
  }

  // --- shift / diff along the index (dataframe.py:3089) ---------------------
  register("idx_shift_diff",
    """SELECT o_orderkey,
      |  lag(o_totalprice, 1) OVER (ORDER BY o_orderkey) AS prev_price,
      |  o_totalprice - lag(o_totalprice, 1) OVER (ORDER BY o_orderkey) AS price_diff
      |FROM orders WHERE o_orderkey <= 3000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .filter(col("o_orderkey") <= 3000)
      .select("o_orderkey", "o_totalprice")
    val f = GdfFrame(base, "o_orderkey")
    val shifted = f.shift("o_totalprice", "prev_price")
    shifted
      .withColumn("price_diff", col("o_totalprice") - col("prev_price"))
      .select("o_orderkey", "prev_price", "price_diff")
      .orderBy("o_orderkey")
  }

  // --- negative shift: values from LATER rows (pandas shift(-n)) ------------
  // Same two-phase boundary-repair algorithm, run over the flipped sort.
  register("idx_shift_neg",
    """SELECT o_orderkey,
      |  lead(o_totalprice, 2) OVER (ORDER BY o_orderkey) AS next2
      |FROM orders WHERE o_orderkey <= 3000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .filter(col("o_orderkey") <= 3000)
      .select("o_orderkey", "o_totalprice")
    GdfFrame(base, "o_orderkey")
      .shift("o_totalprice", "next2", periods = -2)
      .select("o_orderkey", "next2")
      .orderBy("o_orderkey")
  }

  // --- shift with periods=3 (multi-row boundary repair) ---------------------
  register("idx_shift3",
    """SELECT o_orderkey,
      |  lag(o_totalprice, 3) OVER (ORDER BY o_orderkey) AS prev3
      |FROM orders WHERE o_orderkey <= 3000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .filter(col("o_orderkey") <= 3000)
      .select("o_orderkey", "o_totalprice")
    GdfFrame(base, "o_orderkey")
      .shift("o_totalprice", "prev3", periods = 3)
      .select("o_orderkey", "prev3")
      .orderBy("o_orderkey")
  }

  // --- concat(axis=1): outer index alignment (reshape.py:13 _align_objs) ----
  register("idx_concat_axis1",
    """SELECT coalesce(c.c_custkey, s.s_suppkey) AS key,
      |  c.c_acctbal AS cust_bal, s.s_acctbal AS supp_bal
      |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 150) c
      |FULL OUTER JOIN (SELECT s_suppkey, s_acctbal FROM supplier WHERE s_suppkey <= 150) s
      |  ON c.c_custkey = s.s_suppkey
      |ORDER BY key""".stripMargin) { (s, d) =>
    val c = GdfFrame(
      Tables.customer(s, d).filter(col("c_custkey") <= 150)
        .select(col("c_custkey").as("key"), col("c_acctbal").as("cust_bal")), "key")
    val sup = GdfFrame(
      Tables.supplier(s, d).filter(col("s_suppkey") <= 150)
        .select(col("s_suppkey").as("key"), col("s_acctbal").as("supp_bal")), "key")
    c.concatAxis1(sup).df
      .select("key", "cust_bal", "supp_bal")
      .orderBy("key")
  }

  // --- materialized RangeIndex (index.py RangeIndex; two-phase numbering) ---
  register("idx_range_index",
    """SELECT row_number() OVER (ORDER BY n_name) - 1 AS pos, n_name
      |FROM nation ORDER BY pos""".stripMargin) { (s, d) =>
    GdfFrame(Tables.nation(s, d).select("n_name"), "n_name")
      .withRangeIndex("pos", col("n_name")).df
      .select("pos", "n_name")
      .orderBy("pos")
  }

  // --- interval_range (reference core/index.py:2620) ------------------------
  // Fixed-frequency IntervalIndex generation: interval_range(start=0,
  // end=7000, freq=7, closed='right'). Built on spark.range — the
  // DISTRIBUTED generator source (partitions split the id space across
  // executors; no driver-side materialization, unlike a literal VALUES
  // relation), with the bounds as pure per-row arithmetic on top.
  register("idx_interval_range",
    """SELECT CAST(i AS BIGINT) AS idx,
      |  CAST(i * 7 AS BIGINT) AS lo, CAST((i + 1) * 7 AS BIGINT) AS hi,
      |  'right' AS closed
      |FROM generate_series(0, 999) t(i) ORDER BY idx""".stripMargin) { (s, _) =>
    s.range(0, 1000)
      .select(col("id").as("idx"),
        (col("id") * 7).as("lo"), ((col("id") + 1) * 7).as("hi"),
        lit("right").as("closed"))
      .orderBy("idx")
  }

  // --- reverse: flip row order (series.py reverse; copying.hpp reverse) -----
  // Order is index semantics, not storage: the reversed frame is the same
  // rows under a descending-built RangeIndex (two-phase numbering — no
  // single-task window).
  register("idx_reverse",
    """WITH t AS (SELECT n_name, n_nationkey,
      |    row_number() OVER (ORDER BY n_name DESC) - 1 AS pos FROM nation)
      |SELECT pos, n_name, n_nationkey FROM t ORDER BY pos""".stripMargin) { (s, d) =>
    GdfFrame(Tables.nation(s, d).select("n_name", "n_nationkey"), "n_name")
      .withRangeIndex("pos", col("n_name").desc).df
      .select("pos", "n_name", "n_nationkey")
      .orderBy("pos")
  }

  // --- GLOBAL forward-fill along the index (fillna method='ffill' without a
  // grouping key; replace.hpp replace_nulls(replace_policy::PRECEDING)) -----
  // The filling value can live in an earlier range partition, so this runs
  // OrderedOps' two-phase construction: parallel per-partition last-non-null
  // + a broadcast cross-partition carry (win_group_ffill is the easy grouped
  // case; this is the global one).
  register("idx_global_ffill",
    """SELECT o_orderkey, v,
      |  last_value(v IGNORE NULLS) OVER (ORDER BY o_orderkey
      |    ROWS UNBOUNDED PRECEDING) AS filled
      |FROM (SELECT o_orderkey,
      |        CASE WHEN o_orderkey % 7 < 3 THEN NULL ELSE o_totalprice END AS v
      |      FROM orders)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 < 3, lit(null)).otherwise(col("o_totalprice")).as("v"))
    graft.ops.OrderedOps
      .withGlobalFfill(base, col("v"), "filled", Seq(col("o_orderkey")))
      .select("o_orderkey", "v", "filled")
      .orderBy("o_orderkey")
  }

  // --- GLOBAL rolling window along the index (pandas rolling on the whole
  // frame, no grouping key) ---------------------------------------------------
  // The block-replication construction (OrderedOps.withGlobalRolling): the
  // naive plan is a single-task Window.orderBy over 100 TB; here the only
  // global structure is the numbering's per-partition counts. Cents
  // quantization keeps the rolling sum integer-exact cross-engine.
  register("win_global_rolling",
    """SELECT o_orderkey,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS roll_cents,
      |  count(*) OVER w AS roll_n
      |FROM orders
      |WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    graft.ops.OrderedOps
      .withGlobalRolling(base, col("cents"), "roll_cents", "roll_n",
        Seq(col("o_orderkey")), w = 5)
      .select("o_orderkey", "roll_cents", "roll_n")
      .orderBy("o_orderkey")
  }

  // --- take: gather rows by ordinal position (copying.hpp gather;
  // frame.py take) -----------------------------------------------------------
  // Positions are resolved against the frame's index ORDER (not its storage
  // order): a RangeIndex is materialized with the same two-phase numbering
  // head/tail use, then the position set filters it. The position list is a
  // broadcast-scale literal — the filter is an isin() pushed to the rows,
  // no join, no sort of the full table.
  register("idx_take",
    """WITH t AS (SELECT n_name, n_nationkey,
      |    row_number() OVER (ORDER BY n_name) - 1 AS pos FROM nation)
      |SELECT pos, n_name, n_nationkey FROM t
      |WHERE pos IN (0, 3, 7, 11, 19, 24)
      |ORDER BY pos""".stripMargin) { (s, d) =>
    val positions = Seq(0L, 3L, 7L, 11L, 19L, 24L)
    GdfFrame(Tables.nation(s, d).select("n_name", "n_nationkey"), "n_name")
      .withRangeIndex("pos", col("n_name")).df
      .filter(col("pos").isin(positions: _*))
      .select("pos", "n_name", "n_nationkey")
      .orderBy("pos")
  }
}
