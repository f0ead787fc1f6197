package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GF

/** List/struct operator surface (SURVEY §2.8 Lists/Structs; reference
  * cpp/src/lists = 3,583 LoC, py accessor core/column/lists.py, structs/).
  *
  * Operates on embeddings.embedding (Array[Float]) and tokenized
  * documents.text — per-row lambda ops stay inside codegen via
  * transform/filter/aggregate/zip_with higher-order functions.
  */
object ListStructQueries extends QueryPack {

  // --- element access / contains / count (extract.hpp, contains.hpp) -------
  register("list_basic",
    """SELECT vec_id, len(embedding) AS n,
      |  embedding[1] AS first_v, embedding[-1] AS last_v,
      |  list_contains(list_transform(embedding, x -> x > 0.5), true) AS any_gt_half
      |FROM embeddings WHERE vec_id <= 100 ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .filter(col("vec_id") <= 100)
      .select(col("vec_id"),
        size(col("embedding")).as("n"),
        element_at(col("embedding"), 1).as("first_v"),
        element_at(col("embedding"), -1).as("last_v"),
        array_contains(transform(col("embedding"), _ > 0.5f), true).as("any_gt_half"))
      .orderBy("vec_id")
  }

  // --- transform / filter / reduce lambdas (segmented ops; SURVEY lists) ----
  register("list_lambda",
    """SELECT vec_id,
      |  round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2), (a, b) -> a + b), 6) AS sum2x,
      |  len(list_filter(embedding, x -> x > 0.9)) AS n_gt_09
      |FROM embeddings WHERE vec_id <= 100 ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .filter(col("vec_id") <= 100)
      .select(col("vec_id"),
        round(aggregate(transform(col("embedding"), x => x.cast(DoubleType) * 2),
          lit(0.0), (a, b) => a + b), 6).as("sum2x"),
        size(filter(col("embedding"), x => x > 0.9f)).as("n_gt_09"))
      .orderBy("vec_id")
  }

  // --- sort_lists / drop_list_duplicates / slice (sorting.hpp, gather.hpp) --
  // outputs flattened to '|'-joined strings — the driver's pandas compare
  // can't sort array cells; the list ops themselves still run in the plan.
  register("list_sort_distinct",
    """WITH t AS (SELECT doc_id, list_slice(string_split(text, ' '), 1, 12) AS toks
      |           FROM documents WHERE doc_id <= 100)
      |SELECT doc_id, array_to_string(list_sort(toks), '|') AS sorted_toks,
      |  array_to_string(list_sort(list_distinct(toks)), '|') AS distinct_toks,
      |  array_to_string(list_slice(toks, 2, 4), '|') AS slice_toks
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = slice(split(col("text"), " "), 1, 12)
    Tables.documents(s, d)
      .filter(col("doc_id") <= 100)
      .select(col("doc_id"),
        array_join(sort_array(toks), "|").as("sorted_toks"),
        array_join(sort_array(array_distinct(toks)), "|").as("distinct_toks"),
        array_join(slice(toks, 2, 3), "|").as("slice_toks"))
      .orderBy("doc_id")
  }

  // --- concatenate_rows / flatten (combine.hpp:61; lists leaves) ------------
  register("list_concat_flatten",
    """SELECT a.vec_id,
      |  len(list_concat(list_slice(a.embedding, 1, 4), list_slice(b.embedding, 1, 4))) AS cat_len,
      |  round(list_reduce(CAST(list_concat(list_slice(a.embedding, 1, 4), list_slice(b.embedding, 1, 4)) AS DOUBLE[]),
      |        (x, y) -> x + y), 6) AS cat_sum,
      |  len(flatten([list_slice(a.embedding, 1, 4), list_slice(b.embedding, 1, 4)])) AS flat_len
      |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      |WHERE a.vec_id <= 100 ORDER BY a.vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id"), slice(col("embedding"), 1, 4).as("ea"))
    val b = e.select((col("vec_id") - 1).as("vec_id"), slice(col("embedding"), 1, 4).as("eb"))
    a.join(b, Seq("vec_id"))
      .filter(col("vec_id") <= 100)
      .select(col("vec_id"),
        size(concat(col("ea"), col("eb"))).as("cat_len"),
        round(aggregate(concat(col("ea"), col("eb")), lit(0.0),
          (x, y) => x + y.cast(DoubleType)), 6).as("cat_sum"),
        size(flatten(array(col("ea"), col("eb")))).as("flat_len"))
      .orderBy("vec_id")
  }

  // --- zip_with (vector ops over paired lists; basis of dot product) --------
  register("list_zip_dot",
    """SELECT a.vec_id,
      |  round(list_reduce(list_transform(range(1, len(a.embedding) + 1),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]), (x, y) -> x + y), 6) AS dot_next
      |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      |WHERE a.vec_id <= 100 ORDER BY a.vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id"), col("embedding").as("ea"))
    val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
    a.join(b, Seq("vec_id"))
      .filter(col("vec_id") <= 100)
      .select(col("vec_id"),
        round(aggregate(
          zip_with(col("ea"), col("eb"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
          lit(0.0), (acc, v) => acc + v), 6).as("dot_next"))
      .orderBy("vec_id")
  }

  // --- struct create + field access (structs/; struct.py:154) ---------------
  // struct is built and accessed in the plan; the struct VALUE is flattened
  // to a canonical string for the driver's compare (no raw struct output).
  register("struct_ops",
    """SELECT n_nationkey,
      |  '{' || struct_pack(name := n_name, region := n_regionkey).name || ','
      |      || CAST(struct_pack(name := n_name, region := n_regionkey).region AS VARCHAR) || '}' AS info,
      |  struct_pack(name := n_name, region := n_regionkey).name AS name_field,
      |  struct_pack(name := n_name, region := n_regionkey).region AS region_field
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    val st = struct(col("n_name").as("name"), col("n_regionkey").as("region"))
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        concat(lit("{"), st.getField("name"), lit(","),
          st.getField("region").cast(StringType), lit("}")).as("info"),
        st.getField("name").as("name_field"),
        st.getField("region").as("region_field"))
      .orderBy("n_nationkey")
  }

  // --- interval as struct (IntervalDtype → struct(left,right), SURVEY §1.2) -
  register("struct_interval",
    """SELECT o_orderkey,
      |  struct_pack(left := CAST(floor(o_totalprice / 100000) * 100000 AS DOUBLE),
      |              right := CAST((floor(o_totalprice / 100000) + 1) * 100000 AS DOUBLE)).left AS bin_left,
      |  struct_pack(left := CAST(floor(o_totalprice / 100000) * 100000 AS DOUBLE),
      |              right := CAST((floor(o_totalprice / 100000) + 1) * 100000 AS DOUBLE)).right AS bin_right,
      |  o_totalprice >= floor(o_totalprice / 100000) * 100000 AS in_bin
      |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val lo = floor(col("o_totalprice") / 100000) * 100000
    // interval modeled as struct(left,right) (SURVEY §1.2); fields projected
    // out of the struct in the final select so the compare stays hashable
    val bin = struct(lo.cast(DoubleType).as("left"),
      ((floor(col("o_totalprice") / 100000) + 1) * 100000).cast(DoubleType).as("right"))
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 1000)
      .select(col("o_orderkey"),
        bin.getField("left").as("bin_left"),
        bin.getField("right").as("bin_right"),
        (col("o_totalprice") >= lo).as("in_bin"))
      .orderBy("o_orderkey")
  }

  // --- segmented_gather (lists/gather.hpp:56): per-row element gather by an
  // index list — a fixed pick list and a full reverse permutation. Pure
  // per-row HOF (transform over the index array), no shuffle. Out-of-range
  // indexes are exercised implicitly by the docs-length filter staying ≥ 5.
  register("list_gather",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |           WHERE doc_id <= 100 AND len(string_split(text, ' ')) >= 5)
      |SELECT doc_id,
      |  array_to_string(list_transform([3, 1, 5], i -> toks[CAST(i AS INT)]), '|') AS gathered,
      |  array_to_string(list_transform(range(len(toks), 0, -1), i -> toks[CAST(i AS INT)]), '|') AS reversed_toks
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") <= 100)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"),
        array_join(expr("transform(array(3, 1, 5), i -> element_at(toks, i))"), "|")
          .as("gathered"),
        array_join(expr("transform(sequence(size(toks), 1, -1), i -> element_at(toks, i))"), "|")
          .as("reversed_toks"))
      .orderBy("doc_id")
  }
}
