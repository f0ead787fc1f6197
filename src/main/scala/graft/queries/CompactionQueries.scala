package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GF

/** Stream-compaction + null-handling surface (SURVEY §2.2; reference
  * cpp/include/cudf/stream_compaction.hpp, replace.hpp, copying.hpp).
  *
  * The testdata has no nulls, so null-op queries synthesize them with
  * nullif() — identically on both engines — to pin EXCLUDE/INCLUDE null
  * semantics (types.hpp:127).
  */
object CompactionQueries extends QueryPack {

  // --- isin (dataframe.py:5975) — literal list + large-set semi-join form ---
  register("filt_isin",
    """SELECT o_orderkey, o_orderpriority FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderkey <= 2000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") && col("o_orderkey") <= 2000)
      .select("o_orderkey", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  // --- where / mask (frame.py:827,884) ---------------------------------------
  register("filt_where_mask",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 100000 THEN o_totalprice END AS price_where,
      |  CASE WHEN o_totalprice > 100000 THEN -1.0 ELSE o_totalprice END AS price_mask
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val df = Tables.orders(s, d).filter(col("o_orderkey") <= 2000)
    df.select(
      col("o_orderkey"),
      GF.where(col("o_totalprice"), col("o_totalprice") > 100000, lit(null)).as("price_where"),
      GF.mask(col("o_totalprice"), col("o_totalprice") > 100000, lit(-1.0)).as("price_mask"))
      .orderBy("o_orderkey")
  }

  // --- clip (frame.py:700; replace.hpp:202) ----------------------------------
  register("filt_clip",
    """SELECT c_custkey, least(greatest(c_acctbal, 1000.0), 5000.0) AS bal_clipped
      |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 1000)
      .select(col("c_custkey"),
        GF.clip(col("c_acctbal"), lit(1000.0), lit(5000.0)).as("bal_clipped"))
      .orderBy("c_custkey")
  }

  // --- drop_nulls (stream_compaction.hpp:69; frame.py:1079 dropna) ----------
  register("filt_dropna",
    """SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
      |WHERE nullif(l_discount, 0.0) IS NOT NULL AND l_orderkey <= 500
      |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .withColumn("disc_n", nullif(col("l_discount"), lit(0.0)))
      .na.drop(Seq("disc_n"))
      .select("l_orderkey", "l_linenumber", "l_discount")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  // --- dropna(thresh=k): keep rows with at least k non-nulls (frame.py:1079)
  register("filt_dropna_thresh",
    """SELECT l_orderkey, l_linenumber, d1, d2
      |FROM (SELECT l_orderkey, l_linenumber,
      |        nullif(l_discount, 0.0) AS d1, nullif(l_tax, 0.0) AS d2
      |      FROM lineitem WHERE l_orderkey <= 500)
      |WHERE (CASE WHEN d1 IS NULL THEN 0 ELSE 1 END
      |     + CASE WHEN d2 IS NULL THEN 0 ELSE 1 END) >= 1
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("d1"),
        nullif(col("l_tax"), lit(0.0)).as("d2"))
      .na.drop(minNonNulls = 1, Seq("d1", "d2"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- duplicated() mask (series.py duplicated; keep=False marks ALL copies)
  register("set_duplicated_mask",
    """SELECT l_suppkey, l_quantity, l_orderkey, l_linenumber,
      |  count(*) OVER (PARTITION BY l_suppkey, l_quantity) > 1 AS is_dup
      |FROM lineitem WHERE l_suppkey <= 10
      |ORDER BY l_suppkey, l_quantity, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"), col("l_quantity"))
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 10)
      .withColumn("is_dup", count(lit(1)).over(w) > 1)
      .select("l_suppkey", "l_quantity", "l_orderkey", "l_linenumber", "is_dup")
      .orderBy("l_suppkey", "l_quantity", "l_orderkey", "l_linenumber")
  }

  // --- fillna (replace.hpp:50 replace_nulls) ---------------------------------
  register("filt_fillna",
    """SELECT l_orderkey, l_linenumber, l_partkey,
      |  coalesce(nullif(l_discount, 0.0), -9.99) AS disc_filled
      |FROM lineitem WHERE l_orderkey <= 500
      |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .withColumn("disc_filled", nullif(col("l_discount"), lit(0.0)))
      .na.fill(Map("disc_filled" -> -9.99))
      .select("l_orderkey", "l_linenumber", "l_partkey", "disc_filled")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  // --- find_and_replace (replace.hpp:151; dataframe.py:4889 replace) --------
  register("filt_replace",
    """SELECT o_orderkey,
      |  CASE o_orderpriority WHEN '1-URGENT' THEN 'P1' WHEN '2-HIGH' THEN 'P2'
      |       ELSE o_orderpriority END AS priority
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .na.replace("o_orderpriority", Map("1-URGENT" -> "P1", "2-HIGH" -> "P2"))
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"))
      .orderBy("o_orderkey")
  }

  // --- df.query(expr) string predicates (dataframe.py:4610) -----------------
  // cuDF compiles the query string through its own parser to a libcudf AST
  // (cpp ast/expressions.hpp); here the string IS Spark SQL and Catalyst is
  // the compiler — filters still push down to the scan.
  register("filt_query",
    """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      |WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O' AND o_orderkey <= 5000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(expr("o_totalprice > 150000.0 AND o_orderstatus = 'O' AND o_orderkey <= 5000"))
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  // --- select_dtypes (dataframe.py select_dtypes) ---------------------------
  // Projection by column TYPE, resolved from the schema on the driver (a
  // pure metadata operation — no Spark job); the frame's index column is
  // always kept. Here: the double-typed columns of lineitem, keyed for
  // deterministic ordering by a composite index.
  register("filt_select_dtypes",
    """SELECT l_orderkey * 10 + l_linenumber AS idx,
      |  l_quantity, l_extendedprice, l_discount, l_tax
      |FROM lineitem WHERE l_orderkey <= 400 ORDER BY idx""".stripMargin) { (s, d) =>
    val base = Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 400)
      .withColumn("idx", col("l_orderkey") * 10 + col("l_linenumber"))
    graft.frame.GdfFrame(base, "idx")
      .selectDtypes(Seq(DoubleType))
      .df
      .select("idx", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .orderBy("idx")
  }

  // --- df.query(expr) with @local references (utils/queryutils.py:38) ------
  // `@name` binds a caller-side value; QueryLocals renders each binding as a
  // properly-escaped SQL literal BEFORE Catalyst parses, so bound values
  // constant-fold and push down to the scan like hand-written literals
  // (including the IN-list form for collection locals).
  register("filt_query_local",
    """SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority FROM orders
      |WHERE o_totalprice > CAST(120000.5 AS DOUBLE)
      |  AND o_orderstatus IN ('O', 'F')
      |  AND o_orderpriority <> '1-URGENT''S'
      |  AND o_orderkey <= 4000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val locals = Map[String, Any](
      "cutoff" -> 120000.5,
      "statuses" -> Seq("O", "F"),
      "quoted" -> "1-URGENT'S", // exercises single-quote escaping
      "kmax" -> 4000L)
    Tables.orders(s, d)
      .filter(graft.ops.QueryLocals.queryExpr(
        "o_totalprice > @cutoff and o_orderstatus in @statuses " +
          "and o_orderpriority <> @quoted and o_orderkey <= @kmax",
        locals))
      .select("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  // --- seeded random sample (frame.py:1785 sample(random_state=n)) ----------
  // The distributed-reproducible form: per-row uniform from a keyed hash of
  // (seed, key) — unlike Bernoulli rand(), the decision is a pure function of
  // the row, stable under repartitioning/retries at any scale, and the
  // oracle replicates it exactly. ~15% target fraction.
  register("filt_sample_seeded",
    s"""SELECT o_orderkey, o_totalprice FROM orders
       |WHERE ${graft.queries.SqlFrag.polyHash("'seed42_' || CAST(o_orderkey AS VARCHAR)")} % 1000 < 150
       |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val u = graft.text.TextFunctions.polyHash(
      concat(lit("seed42_"), col("o_orderkey").cast(StringType))) % 1000
    Tables.orders(s, d)
      .filter(u < 150)
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // --- merge_sorted (merge.hpp:96): k-way merge of pre-sorted tables --------
  // Spark expresses this as union + sort; with range-partitioned inputs the
  // sort is a streaming merge per partition (SortMergeExec over presorted
  // runs), not a full re-sort of either input.
  register("set_merge_sorted",
    """SELECT key, src FROM (
      |  SELECT c_custkey AS key, 'c' AS src FROM customer WHERE c_custkey <= 300
      |  UNION ALL
      |  SELECT s_suppkey AS key, 's' AS src FROM supplier WHERE s_suppkey <= 300)
      |ORDER BY key, src""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("key"), lit("c").as("src"))
    val sup = Tables.supplier(s, d).filter(col("s_suppkey") <= 300)
      .select(col("s_suppkey").as("key"), lit("s").as("src"))
    c.unionByName(sup).orderBy("key", "src")
  }

  // --- sample (copying.hpp:913) — deterministic hash-split form -------------
  // cuDF sample(random_state=n) is seeded; the distributed-safe equivalent is
  // a key-hash split (stable under repartitioning, unlike Bernoulli sampling).
  register("filt_sample_hash",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_orderkey % 10 = 3 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(GF.pymod(col("o_orderkey"), lit(10)) === 3)
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // --- stratified sampling: per-group fractions via salted hash -------------
  // The training-data mixing step (sampleBy / cuDF sample with per-class
  // weights): keep a row iff its salted content hash lands under the
  // group's threshold. Pure projection + filter — deterministic,
  // re-runnable, pushes to the scan, zero shuffle; changing the mix is a
  // literal map edit, not a re-shuffle.
  register("filt_sample_stratified",
    """WITH h AS (SELECT doc_id, lang,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split('salt42_' || CAST(doc_id AS VARCHAR), ''),
      |      ch -> CAST(ascii(ch) AS BIGINT))), (h, c) -> (h * 31 + c) % 1000000007) % 1000 AS u
      |  FROM documents)
      |SELECT doc_id, lang FROM h
      |WHERE u < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 ELSE 100 END
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.text.TextFunctions.polyHash
    val u = polyHash(concat(lit("salt42_"), col("doc_id").cast(StringType))) % 1000
    val threshold = when(col("lang") === "en", 500)
      .when(col("lang") === "de", 250).otherwise(100)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), u.as("u"))
      .filter(col("u") < threshold)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  // --- fixed-size per-group sample: k rows per group, hash order ------------
  // The third sampling tier next to rate-based (filt_sample_stratified) and
  // weight-based (filt_sample_weighted): EXACTLY k survivors per group,
  // reproducible because the order key is a keyed hash. Plans as
  // row_number ≤ k over the hash order — Spark's WindowGroupLimit prunes to
  // k rows per group MAP-SIDE before the shuffle, so the exchange carries
  // ~k·groups rows, not the corpus (the win_topk_per_group machinery
  // applied to sampling).
  register("filt_sample_fixed_k",
    s"""WITH h AS (SELECT doc_id, lang,
       |    ${graft.queries.SqlFrag.polyHash("'ksamp_' || CAST(doc_id AS VARCHAR)")} AS u
       |  FROM documents),
       |r AS (SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn FROM h)
       |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM r
       |WHERE rn <= 20 ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.text.TextFunctions.polyHash
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("u"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        polyHash(concat(lit("ksamp_"), col("doc_id").cast(StringType))).as("u"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("doc_id"), col("lang"), col("rn").cast(LongType).as("rn"))
      .orderBy("doc_id")
  }

  // --- dropna(axis=1): drop COLUMNS containing any null ---------------------
  // (frame.py dropna(axis=1); the column-axis twin of filt_dropna.) Column
  // survival is decided by ONE aggregation of per-column null counts; the
  // single collected row is schema-sized metadata (like Spark's own
  // dynamic pivot-value discovery and reshape_pivot_dynamic) — the data
  // itself never leaves the executors. The oracle pins the dynamically
  // discovered schema statically: the two injected-sparse columns must
  // vanish, the dense ones must survive.
  register("filt_dropna_axis1",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_tax FROM lineitem
      |WHERE l_orderkey <= 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val base = Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        when(col("l_discount") < 0.05, lit(null)).otherwise(col("l_discount"))
          .as("disc_sparse"),
        when(col("l_returnflag") === "R", lit(null)).otherwise(col("l_returnflag"))
          .as("flag_sparse"),
        col("l_tax"))
    val nullCounts = base
      .select(base.columns.map(c => sum(col(c).isNull.cast(LongType)).as(c)): _*)
      .collect()(0)
    val keep = base.columns.filter(c => nullCounts.getAs[Long](c) == 0L)
    base.select(keep.map(col): _*).orderBy("l_orderkey", "l_linenumber")
  }

  // --- weighted (πps) sampling: inclusion probability ∝ row weight ----------
  // Poisson sampling with p_i = min(1, k·w_i/W): the deterministic weighted
  // form of sample() used for training-mix assembly when longer documents
  // should be proportionally likelier to survive. The decision is
  // u_i·W < k·w_i·10⁶ with u_i a keyed-hash uniform — pure integer
  // arithmetic (no transcendentals, so the oracle is bit-exact), stable
  // under repartitioning/retries. W rides a broadcast one-row aggregate
  // (documented nested-loop exemption, the agg_scale_minmax pattern); the
  // corpus side stays a scan-fused filter — zero data-bearing shuffles.
  register("filt_sample_weighted",
    s"""WITH w AS (SELECT doc_id, n_chars AS wt,
       |    ${graft.queries.SqlFrag.polyHash("'wsamp_' || CAST(doc_id AS VARCHAR)")} % 1000000 AS u
       |  FROM documents),
       |t AS (SELECT CAST(sum(wt) AS BIGINT) AS tot FROM w)
       |SELECT doc_id, wt, round(50.0 * wt / tot, 6) AS incl_prob
       |FROM w, t
       |WHERE u * tot < 50 * wt * 1000000
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.text.TextFunctions.polyHash
    val w = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars").as("wt"),
        (polyHash(concat(lit("wsamp_"), col("doc_id").cast(StringType))) % 1000000).as("u"))
    val tot = w.agg(sum(col("wt")).as("tot"))
    w.crossJoin(broadcast(tot))
      .filter(col("u") * col("tot") < lit(50L) * col("wt") * 1000000L)
      .select(col("doc_id"), col("wt"),
        round(lit(50.0) * col("wt") / col("tot"), 6).as("incl_prob"))
      .orderBy("doc_id")
  }

  // --- drop_duplicates keep=first in index order (stream_compaction.hpp:238,
  //     duplicate_keep_option :210; order-honoring via row_number, §7.4) ----
  register("set_drop_duplicates",
    """SELECT l_suppkey, l_quantity, l_orderkey, l_linenumber FROM lineitem
      |WHERE l_suppkey <= 20
      |QUALIFY row_number() OVER (PARTITION BY l_suppkey, l_quantity
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey) = 1
      |ORDER BY l_suppkey, l_quantity""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"), col("l_quantity"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_suppkey", "l_quantity", "l_orderkey", "l_linenumber")
      .orderBy("l_suppkey", "l_quantity")
  }

  // keep="last" (duplicate_keep_option KEEP_LAST, stream_compaction.hpp:212):
  // same single-shuffle window rank, index order flipped — the LAST
  // occurrence in index order survives.
  register("set_drop_duplicates_last",
    """SELECT l_suppkey, l_quantity, l_orderkey, l_linenumber FROM lineitem
      |WHERE l_suppkey <= 20
      |QUALIFY row_number() OVER (PARTITION BY l_suppkey, l_quantity
      |    ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC, l_partkey DESC) = 1
      |ORDER BY l_suppkey, l_quantity""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"), col("l_quantity"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
        col("l_linenumber").desc, col("l_partkey").desc)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_suppkey", "l_quantity", "l_orderkey", "l_linenumber")
      .orderBy("l_suppkey", "l_quantity")
  }

  // --- drop_duplicates keep=none (rows that are unique, keep_option KEEP_NONE)
  register("set_drop_duplicates_none",
    """SELECT l_suppkey, l_quantity FROM lineitem
      |WHERE l_suppkey <= 20
      |GROUP BY l_suppkey, l_quantity HAVING count(*) = 1
      |ORDER BY l_suppkey, l_quantity""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .groupBy(col("l_suppkey"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") === 1)
      .select("l_suppkey", "l_quantity")
      .orderBy("l_suppkey", "l_quantity")
  }

  // --- unique / factorize (series.py:5023; frame.py:3608) -------------------
  // factorize codes assigned in sorted order (deterministic cross-engine
  // variant of first-appearance order, which is partition-dependent).
  // Codes come from the two-phase global numbering in OrderedOps — no
  // single-task Window.orderBy; scales to any number of distinct values.
  register("set_factorize",
    """SELECT p_type AS value, dense_rank() OVER (ORDER BY p_type) - 1 AS code
      |FROM (SELECT DISTINCT p_type FROM part) ORDER BY value""".stripMargin) { (s, d) =>
    val uniques = Tables.part(s, d).select(col("p_type").as("value")).distinct()
    graft.ops.OrderedOps
      .withGlobalRowNumber(uniques, "pos", Seq(col("value")))
      .select(col("value"), (col("pos") - 1).as("code"))
      .orderBy("value")
  }

  // --- set ops: intersect / except (Spark-native; SURVEY §2.7) --------------
  register("set_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  register("set_except",
    """SELECT n_nationkey AS nationkey FROM nation
      |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin) { (s, d) =>
    Tables.nation(s, d).select(col("n_nationkey").as("nationkey"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  // --- concat rows with column union (reshape.py:90, join="outer") ----------
  register("set_concat_rows",
    """SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal, NULL AS nationkey FROM customer WHERE c_custkey <= 100
      |UNION ALL
      |SELECT s_suppkey, s_name, NULL, s_nationkey FROM supplier WHERE s_suppkey <= 100
      |ORDER BY key, name""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_custkey") <= 100)
      .select(col("c_custkey").as("key"), col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val sup = Tables.supplier(s, d).filter(col("s_suppkey") <= 100)
      .select(col("s_suppkey").as("key"), col("s_name").as("name"),
        col("s_nationkey").cast(IntegerType).as("nationkey"))
    c.unionByName(sup, allowMissingColumns = true).orderBy("key", "name")
  }

  // concat(join="inner") (core/reshape.py:90): column INTERSECTION instead
  // of union — one-side-only columns are dropped, no null padding.
  register("set_concat_rows_inner",
    """SELECT c_custkey AS key, c_name AS name FROM customer WHERE c_custkey <= 100
      |UNION ALL
      |SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey <= 100
      |ORDER BY key, name""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_custkey") <= 100)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
    val sup = Tables.supplier(s, d).filter(col("s_suppkey") <= 100)
      .select(col("s_suppkey").as("key"), col("s_name").as("name"),
        col("s_nationkey").as("nationkey"))
    val common = c.columns.filter(sup.columns.contains).toSeq
    c.select(common.map(col): _*)
      .unionByName(sup.select(common.map(col): _*))
      .orderBy("key", "name")
  }

  // --- searchsorted / lower_bound (search.hpp:69; frame.py:2518) ------------
  // positions of probe values in the sorted column = count of rows < probe,
  // expressed as a broadcastable theta-join aggregate (no global sort).
  register("sort_searchsorted",
    """SELECT p.v AS probe,
      |  count(CASE WHEN o.o_totalprice < p.v THEN 1 END) AS lower_bound,
      |  count(CASE WHEN o.o_totalprice <= p.v THEN 1 END) AS upper_bound
      |FROM (VALUES (50000.0), (150000.0), (300000.0)) p(v)
      |CROSS JOIN orders o GROUP BY p.v ORDER BY probe""".stripMargin) { (s, d) =>
    val probes = s.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(50000.0),
        org.apache.spark.sql.Row(150000.0),
        org.apache.spark.sql.Row(300000.0)),
      StructType(Seq(StructField("v", DoubleType, nullable = false))))
    Tables.orders(s, d)
      .crossJoin(broadcast(probes))
      .groupBy(col("v").as("probe"))
      .agg(
        count(when(col("o_totalprice") < col("v"), 1)).as("lower_bound"),
        count(when(col("o_totalprice") <= col("v"), 1)).as("upper_bound"))
      .orderBy("probe")
  }

  // --- is_sorted / monotonic (sorting.hpp:96; frame.py:3573) ----------------
  register("sort_is_sorted",
    """SELECT o_custkey,
      |  bool_and(o_totalprice >= prev OR prev IS NULL) AS is_monotonic_by_date
      |FROM (SELECT o_custkey, o_totalprice,
      |        lag(o_totalprice) OVER (PARTITION BY o_custkey
      |            ORDER BY o_orderdate, o_orderkey) AS prev
      |      FROM orders WHERE o_custkey <= 50)
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 50)
      .withColumn("prev", lag(col("o_totalprice"), 1).over(w))
      .groupBy(col("o_custkey"))
      .agg(bool_and(col("o_totalprice") >= col("prev") || col("prev").isNull)
        .as("is_monotonic_by_date"))
      .orderBy("o_custkey")
  }

  // --- multi-column sort with explicit null ordering (sorting.hpp:114) ------
  register("sort_multi_nulls",
    """SELECT l_orderkey, l_linenumber, l_partkey,
      |  nullif(l_discount, 0.0) AS disc_n,
      |  row_number() OVER (ORDER BY nullif(l_discount, 0.0) ASC NULLS FIRST,
      |                     l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey) AS pos
      |FROM lineitem WHERE l_orderkey <= 200
      |ORDER BY pos""".stripMargin) { (s, d) =>
    // stable argsort via two-phase global numbering (OrderedOps) — the full
    // composite key is unique, no single-task Window.orderBy anywhere.
    val ord = Seq(
      col("disc_n").asc_nulls_first,
      col("l_extendedprice").desc,
      col("l_orderkey").asc, col("l_linenumber").asc, col("l_partkey").asc)
    val base = Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 200)
      .withColumn("disc_n", nullif(col("l_discount"), lit(0.0)))
    graft.ops.OrderedOps
      .withGlobalRowNumber(base, "pos", ord)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("disc_n"), col("pos").cast(IntegerType).as("pos"))
      .orderBy("pos")
  }
}
