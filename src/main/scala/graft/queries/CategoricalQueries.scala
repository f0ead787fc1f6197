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
}
