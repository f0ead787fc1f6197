package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.frame.GdfCategorical

/** Categorical dtype coverage (SURVEY §2 gap closed round 4; reference
  * python/cudf/cudf/core/column/categorical.py). Every query drives the
  * [[graft.frame.GdfCategorical]] facade — data-as-codes + small dictionary,
  * all fact-touching verbs broadcast joins.
  */
object CategoricalQueries extends QueryPack {

  // --- astype('category') → .cat.codes → decode roundtrip -------------------
  register("cat_codes_roundtrip",
    """WITH dict AS (SELECT c_mktsegment AS category,
      |    CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS INTEGER) AS code
      |  FROM (SELECT DISTINCT c_mktsegment FROM customer))
      |SELECT c_custkey, d.code AS code, d.category AS segment
      |FROM customer c JOIN dict d ON c.c_mktsegment = d.category
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    GdfCategorical
      .fromColumn(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        "c_mktsegment", "code")
      .decoded("segment")
      .select("c_custkey", "code", "segment")
      .orderBy("c_custkey")
  }

  // --- rename_categories + reorder_categories -------------------------------
  // rename touches only the k-row dictionary; reorder re-codes the facts
  // through a code→code broadcast map — the raw strings never travel again.
  register("cat_rename_reorder",
    """WITH m AS (SELECT c_custkey,
      |    CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'auto'
      |                      WHEN 'MACHINERY' THEN 'machines'
      |                      ELSE c_mktsegment END AS segment
      |  FROM customer),
      |o AS (SELECT * FROM (VALUES ('machines', 0), ('HOUSEHOLD', 1),
      |      ('FURNITURE', 2), ('BUILDING', 3), ('auto', 4)) t(segment, code))
      |SELECT o.code AS code, o.segment AS segment, count(*) AS n
      |FROM m JOIN o USING (segment) GROUP BY 1, 2 ORDER BY code""".stripMargin) { (s, d) =>
    GdfCategorical
      .fromColumn(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        "c_mktsegment", "code")
      .renameCategories(Map("AUTOMOBILE" -> "auto", "MACHINERY" -> "machines"))
      .reorderCategories(Seq("machines", "HOUSEHOLD", "FURNITURE", "BUILDING", "auto"))
      .decoded("segment")
      .groupBy("code", "segment").agg(count(lit(1)).as("n"))
      .orderBy("code")
  }

  // --- remove_categories: removed rows → null code, survivors re-coded ------
  register("cat_remove_null_codes",
    """WITH d AS (SELECT c_custkey,
      |    CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'HOUSEHOLD' THEN 1
      |                      WHEN 'MACHINERY' THEN 2 END AS code,
      |    CASE WHEN c_mktsegment IN ('BUILDING', 'FURNITURE') THEN NULL
      |         ELSE c_mktsegment END AS segment
      |  FROM customer)
      |SELECT code, segment, count(*) AS n FROM d
      |GROUP BY 1, 2 ORDER BY code""".stripMargin) { (s, d) =>
    GdfCategorical
      .fromColumn(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        "c_mktsegment", "code")
      .removeCategories(Seq("BUILDING", "FURNITURE"))
      .decoded("segment")
      .groupBy("code", "segment").agg(count(lit(1)).as("n"))
      .orderBy("code")
  }

  // --- ordered-categorical comparisons (categorical.py as_ordered;
  // pandas ordered=True) ------------------------------------------------------
  // After reorder_categories the DICTIONARY ORDER is the comparison order:
  // min/max/> follow codes, not lexicographic labels (under this order
  // MACHINERY < BUILDING < AUTOMOBILE < …, so lexicographic min/max would
  // give different rows). Aggregations run on the int codes — the cheapest
  // possible shuffle payload — and labels are restored from the driver-side
  // dictionary metadata, no join needed.
  register("cat_ordered_minmax",
    """WITH d AS (SELECT c_nationkey,
      |    CASE c_mktsegment WHEN 'MACHINERY' THEN 0 WHEN 'BUILDING' THEN 1
      |      WHEN 'AUTOMOBILE' THEN 2 WHEN 'FURNITURE' THEN 3
      |      WHEN 'HOUSEHOLD' THEN 4 END AS code
      |  FROM customer),
      |lbl AS (SELECT * FROM (VALUES (0, 'MACHINERY'), (1, 'BUILDING'),
      |    (2, 'AUTOMOBILE'), (3, 'FURNITURE'), (4, 'HOUSEHOLD')) t(code, seg))
      |SELECT c_nationkey,
      |  min(code) AS min_code, (SELECT seg FROM lbl WHERE code = min(d.code)) AS min_seg,
      |  max(code) AS max_code, (SELECT seg FROM lbl WHERE code = max(d.code)) AS max_seg,
      |  CAST(sum(CASE WHEN code > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_building
      |FROM d GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    val order = Seq("MACHINERY", "BUILDING", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD")
    val cat = GdfCategorical
      .fromColumn(Tables.customer(s, d).select("c_nationkey", "c_mktsegment"),
        "c_mktsegment", "code")
      .reorderCategories(order)
    val labels = array(cat.categories.map(lit): _*) // driver-side dictionary
    val pivot = cat.categories.indexOf("BUILDING")
    cat.facts
      .groupBy(col("c_nationkey"))
      .agg(min(col("code")).as("min_code"), max(col("code")).as("max_code"),
        sum((col("code") > pivot).cast("long")).as("n_above_building"))
      .select(col("c_nationkey"),
        col("min_code"), element_at(labels, col("min_code") + 1).as("min_seg"),
        col("max_code"), element_at(labels, col("max_code") + 1).as("max_seg"),
        col("n_above_building"))
      .orderBy("c_nationkey")
  }
}
