package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GF

/** Reshape surface (SURVEY §2.7; reference core/reshape.py, lists/explode.hpp,
  * cudf cut / get_dummies / pivot / melt).
  */
object ReshapeQueries extends QueryPack {

  // --- melt wide→long (reshape.py:394; Spark stack()) -----------------------
  register("reshape_melt",
    """SELECT l_orderkey, l_linenumber, l_partkey, variable, value FROM (
      |  SELECT l_orderkey, l_linenumber, l_partkey, 'quantity' AS variable, l_quantity AS value
      |  FROM lineitem WHERE l_orderkey <= 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_partkey, 'discount', l_discount
      |  FROM lineitem WHERE l_orderkey <= 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_partkey, 'tax', l_tax
      |  FROM lineitem WHERE l_orderkey <= 100)
      |ORDER BY l_orderkey, l_linenumber, l_partkey, variable""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        expr("stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax) AS (variable, value)"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "variable")
  }

  // --- pivot long→wide (reshape.py:843; groupBy().pivot().agg) --------------
  register("reshape_pivot",
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS A,
      |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS N,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS R
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType))
      .orderBy("l_linestatus")
  }

  // --- pivot with RUNTIME value discovery (reshape.py:843 pivot_table) ------
  // No hardcoded value list on either side: Spark's .pivot(col) collects the
  // distinct priorities at plan time (bounded by spark.sql.pivotMaxValues),
  // DuckDB's PIVOT discovers its own. Priority strings contain spaces — the
  // discovered names are used verbatim as column names by both engines.
  register("reshape_pivot_dynamic",
    """SELECT * FROM (
      |  PIVOT (SELECT o_orderstatus, o_orderpriority,
      |           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
      |         FROM orders GROUP BY 1, 2)
      |  ON o_orderpriority USING first(tp) GROUP BY o_orderstatus)
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority") // values discovered from the data
      .agg(GF.sumMoney(col("o_totalprice")))
      .orderBy("o_orderstatus")
  }

  // --- explode / posexplode (lists/explode.hpp:63,107) ----------------------
  register("reshape_explode",
    """SELECT vec_id, unnest(embedding) AS val
      |FROM embeddings WHERE vec_id <= 20
      |ORDER BY vec_id, val""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .filter(col("vec_id") <= 20)
      .select(col("vec_id"), explode(col("embedding")).as("val"))
      .orderBy("vec_id", "val")
  }

  register("reshape_posexplode",
    """SELECT vec_id, unnest(range(0, len(embedding))) AS pos, unnest(embedding) AS val
      |FROM embeddings WHERE vec_id <= 20
      |ORDER BY vec_id, pos""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .filter(col("vec_id") <= 20)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .orderBy("vec_id", "pos")
  }

  // --- explode_outer: null lists keep their row (explode.hpp outer variants)
  register("reshape_explode_outer",
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 0 THEN NULL
      |         ELSE list_slice(string_split(text, ' '), 1, 3) END AS arr
      |  FROM documents WHERE doc_id <= 50)
      |SELECT doc_id, unnest(arr) AS tok FROM t WHERE arr IS NOT NULL
      |UNION ALL
      |SELECT doc_id, NULL FROM t WHERE arr IS NULL
      |ORDER BY doc_id, tok""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 50)
      .withColumn("arr",
        when(col("doc_id") % 10 === 0, lit(null))
          .otherwise(slice(split(col("text"), " "), 1, 3)))
      .select(col("doc_id"), explode_outer(col("arr")).as("tok"))
      .orderBy("doc_id", "tok")
  }

  // --- posexplode_outer (lists/explode.hpp:193) -----------------------------
  register("reshape_posexplode_outer",
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 0 THEN NULL
      |         ELSE list_slice(string_split(text, ' '), 1, 3) END AS arr
      |  FROM documents WHERE doc_id <= 50)
      |SELECT doc_id, CAST(unnest(range(0, len(arr))) AS INT) AS pos, unnest(arr) AS tok
      |FROM t WHERE arr IS NOT NULL
      |UNION ALL
      |SELECT doc_id, CAST(NULL AS INT), CAST(NULL AS VARCHAR) FROM t WHERE arr IS NULL
      |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 50)
      .withColumn("arr",
        when(col("doc_id") % 10 === 0, lit(null))
          .otherwise(slice(split(col("text"), " "), 1, 3)))
      .select(col("doc_id"), posexplode_outer(col("arr")).as(Seq("pos", "tok")))
      .orderBy("doc_id", "pos")
  }

  // --- label encoding (categorical.py label_encoding; factorize applied
  // back to rows). The dictionary is built once (sorted-distinct codes via
  // two-phase numbering) and BROADCAST-joined back — dictionary-encode at
  // scale without any global window over the data.
  register("reshape_label_encode",
    """SELECT o_orderkey, o_orderpriority,
      |  dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS code
      |FROM orders WHERE o_orderkey <= 2000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val rows = Tables.orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .select("o_orderkey", "o_orderpriority")
    val dict = graft.ops.OrderedOps.withGlobalRowNumber(
      rows.select(col("o_orderpriority")).distinct(), "pos", Seq(col("o_orderpriority")))
      .select(col("o_orderpriority"), (col("pos") - 1).as("code"))
    rows.join(broadcast(dict), Seq("o_orderpriority"))
      .select("o_orderkey", "o_orderpriority", "code")
      .orderBy("o_orderkey")
  }

  // --- qcut: quantile binning (reshape qcut; quartile edges computed once,
  // broadcast into a CASE over the rows — two aggregate passes, no sort) ----
  register("reshape_qcut",
    """WITH q AS (SELECT quantile_cont(o_totalprice, 0.25) AS q1,
      |                  quantile_cont(o_totalprice, 0.50) AS q2,
      |                  quantile_cont(o_totalprice, 0.75) AS q3
      |           FROM orders WHERE o_orderkey <= 2000)
      |SELECT o_orderkey,
      |  CASE WHEN o_totalprice <= q1 THEN 0 WHEN o_totalprice <= q2 THEN 1
      |       WHEN o_totalprice <= q3 THEN 2 ELSE 3 END AS bucket
      |FROM orders, q WHERE o_orderkey <= 2000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d).filter(col("o_orderkey") <= 2000)
    val q = base.agg(
      expr("percentile(o_totalprice, 0.25)").as("q1"),
      expr("percentile(o_totalprice, 0.50)").as("q2"),
      expr("percentile(o_totalprice, 0.75)").as("q3"))
    base.crossJoin(broadcast(q))
      .select(col("o_orderkey"),
        when(col("o_totalprice") <= col("q1"), 0)
          .when(col("o_totalprice") <= col("q2"), 1)
          .when(col("o_totalprice") <= col("q3"), 2)
          .otherwise(3).as("bucket"))
      .orderBy("o_orderkey")
  }

  // --- hash_partition / scatter_by_map (partitioning.hpp:67,239) ------------
  // The scatter map is an explicit per-row target-partition column; Spark's
  // repartition(n, col) IS the scatter (one shuffle, map-side routing).
  // Output verifies placement by per-partition counts, which the oracle
  // reproduces from the same map function.
  register("reshape_scatter_partition",
    """SELECT CAST(o_orderkey % 8 AS BIGINT) AS p, count(*) AS n,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders GROUP BY o_orderkey % 8 ORDER BY p""".stripMargin) { (s, d) =>
    val parts = 8
    Tables.orders(s, d)
      .withColumn("p", GF.pymod(col("o_orderkey"), lit(parts)).cast(LongType))
      .repartition(parts, col("p"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("p")
  }

  // --- get_dummies / one-hot (reshape.py:566) -------------------------------
  register("reshape_get_dummies",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pri_1_urgent,
      |  CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS pri_2_high,
      |  CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS pri_3_medium
      |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    def dummy(v: String) = when(col("o_orderpriority") === v, 1).otherwise(0)
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 1000)
      .select(col("o_orderkey"),
        dummy("1-URGENT").as("pri_1_urgent"),
        dummy("2-HIGH").as("pri_2_high"),
        dummy("3-MEDIUM").as("pri_3_medium"))
      .orderBy("o_orderkey")
  }

  // --- cut / label_bins (core/cut.py:15; labeling/label_bins.hpp:72) --------
  register("reshape_cut",
    """SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INT) AS bin,
      |  count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(least(floor(col("o_totalprice") / 50000), lit(9)).cast(IntegerType).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  // --- sequence / repeat / tile (filling.hpp:175,121; reshape interleave) ---
  register("reshape_sequence_repeat",
    """SELECT r_regionkey, unnest(range(0, r_regionkey + 1)) AS seq_val,
      |  repeat(r_name, 2) AS name_x2
      |FROM region ORDER BY r_regionkey, seq_val""".stripMargin) { (s, d) =>
    Tables.region(s, d)
      .select(col("r_regionkey"),
        explode(sequence(lit(0), col("r_regionkey"))).as("seq_val"),
        repeat(col("r_name"), 2).as("name_x2"))
      .orderBy("r_regionkey", "seq_val")
  }

  // --- tile (frame.py:2489 tile — repeat the whole table n times) -----------
  // Join-free: each row emits its n copies via a per-row sequence explode
  // (a cross join against a range table would be the naive shape); the
  // (tile_idx, index) pair reproduces cuDF's repeated-table row order.
  register("reshape_tile",
    """SELECT unnest(range(0, 3)) AS tile_idx, n_nationkey, n_name
      |FROM nation ORDER BY tile_idx, n_nationkey""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .select(explode(sequence(lit(0), lit(2))).as("tile_idx"),
        col("n_nationkey"), col("n_name"))
      .orderBy("tile_idx", "n_nationkey")
  }

  // --- interleave_columns (reshape.hpp:49) via array+explode ----------------
  register("reshape_interleave",
    """SELECT n_nationkey, unnest([CAST(n_name AS VARCHAR), CAST(n_regionkey AS VARCHAR)]) AS v
      |FROM nation ORDER BY n_nationkey, v""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        explode(array(col("n_name").cast(StringType),
          col("n_regionkey").cast(StringType))).as("v"))
      .orderBy("n_nationkey", "v")
  }

  // --- transpose (dataframe.py:4292) — small-data contract, via melt+pivot --
  register("reshape_transpose",
    """SELECT variable,
      |  CAST(sum(CASE WHEN r_regionkey = 0 THEN v END) AS DOUBLE) AS r0,
      |  CAST(sum(CASE WHEN r_regionkey = 1 THEN v END) AS DOUBLE) AS r1,
      |  CAST(sum(CASE WHEN r_regionkey = 2 THEN v END) AS DOUBLE) AS r2
      |FROM (
      |  SELECT r_regionkey, 'regionkey' AS variable, CAST(r_regionkey AS DOUBLE) AS v FROM region
      |  UNION ALL
      |  SELECT r_regionkey, 'name_len', CAST(length(r_name) AS DOUBLE) FROM region)
      |GROUP BY variable ORDER BY variable""".stripMargin) { (s, d) =>
    Tables.region(s, d)
      .select(col("r_regionkey"),
        expr("stack(2, 'regionkey', CAST(r_regionkey AS DOUBLE), 'name_len', CAST(length(r_name) AS DOUBLE)) AS (variable, v)"))
      .groupBy(col("variable"))
      .pivot("r_regionkey", Seq("0", "1", "2"))
      .agg(sum(col("v")).cast(DoubleType))
      .withColumnRenamed("0", "r0").withColumnRenamed("1", "r1").withColumnRenamed("2", "r2")
      .orderBy("variable")
  }

  // --- digitize: bin index against sorted edges (series.py digitize;
  // np.digitize right=False ⇒ index = count of edges ≤ v). Same family as
  // sort_searchsorted but per-row over the full column. The edge list is a
  // tiny literal array: per-row HOF over ≤ |edges| elements, fully fused
  // into the scan projection — zero shuffles.
  register("reshape_digitize",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  len(list_filter([10.0, 20.0, 30.0, 40.0], e -> l_quantity >= e)) AS bin
      |FROM lineitem WHERE l_orderkey <= 400
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val edges = array(Seq(10.0, 20.0, 30.0, 40.0).map(lit): _*)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 400)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        size(filter(edges, e => col("l_quantity") >= e)).as("bin"))
      .orderBy("l_orderkey", "l_linenumber")
  }
}
