package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.frame.GdfCategorical

/** Pins GdfCategorical's pandas semantics (core/column/categorical.py,
  * tests/test_categorical.py): codes in sorted category order, rename is
  * dictionary-only, remove null-codes dropped rows and re-codes survivors,
  * add appends at the end, reorder re-codes the facts.
  */
class CategoricalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def cat() = {
    import spark.implicits._
    GdfCategorical.fromColumn(
      Seq((1, "b"), (2, "a"), (3, "b"), (4, "c")).toDF("id", "v"), "v", "code")
  }

  private def dictMap(c: GdfCategorical): Map[String, Int] =
    c.dict.collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  private def rows(c: GdfCategorical): Map[Int, (Option[Int], Option[String])] =
    c.decoded("v").select("id", "code", "v").collect().map { r =>
      r.getInt(0) -> ((if (r.isNullAt(1)) None else Some(r.getInt(1))),
        Option(r.getString(2)))
    }.toMap

  test("fromColumn assigns codes in sorted category order; decode roundtrips") {
    val c = cat()
    assert(dictMap(c) == Map("a" -> 0, "b" -> 1, "c" -> 2))
    assert(rows(c) == Map(
      1 -> (Some(1), Some("b")), 2 -> (Some(0), Some("a")),
      3 -> (Some(1), Some("b")), 4 -> (Some(2), Some("c"))))
  }

  test("fromColumn fails fast past the cardinality cap instead of collecting") {
    import spark.implicits._
    val highCard = (1 to 50).map(i => (i, s"label_$i")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      GdfCategorical.fromColumn(highCard, "v", "code", maxCategories = 10)
    }
    assert(e.getMessage.contains("not categorical"))
    // The same column is fine when the caller raises the cap explicitly.
    assert(GdfCategorical.fromColumn(highCard, "v", "code", maxCategories = 50)
      .categories.size == 50)
  }

  test("renameCategories relabels the dictionary; codes and facts untouched") {
    val c = cat().renameCategories(Map("a" -> "alpha"))
    assert(dictMap(c) == Map("alpha" -> 0, "b" -> 1, "c" -> 2))
    assert(rows(c)(2) == (Some(0), Some("alpha")))
  }

  test("removeCategories nulls removed rows and re-codes survivors") {
    val c = cat().removeCategories(Seq("b"))
    assert(dictMap(c) == Map("a" -> 0, "c" -> 1)) // c re-coded 2 → 1
    assert(rows(c) == Map(
      1 -> (None, None), 2 -> (Some(0), Some("a")),
      3 -> (None, None), 4 -> (Some(1), Some("c"))))
  }

  test("addCategories appends fresh codes at the end; no row has them") {
    val c = cat().addCategories(Seq("z", "y"))
    assert(dictMap(c) == Map("a" -> 0, "b" -> 1, "c" -> 2, "z" -> 3, "y" -> 4))
    assert(c.decoded("v").filter(col("v").isin("z", "y")).count() == 0)
  }

  test("reorderCategories re-codes facts to follow the new order") {
    val c = cat().reorderCategories(Seq("c", "b", "a"))
    assert(dictMap(c) == Map("c" -> 0, "b" -> 1, "a" -> 2))
    assert(rows(c) == Map(
      1 -> (Some(1), Some("b")), 2 -> (Some(2), Some("a")),
      3 -> (Some(1), Some("b")), 4 -> (Some(0), Some("c"))))
  }

  test("verbs compose: rename → reorder keeps the relabeled names") {
    val c = cat()
      .renameCategories(Map("a" -> "alpha"))
      .reorderCategories(Seq("c", "alpha", "b"))
    assert(dictMap(c) == Map("c" -> 0, "alpha" -> 1, "b" -> 2))
    assert(rows(c)(2) == (Some(1), Some("alpha")))
  }
}
