package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.io.GraftIO
import graft.io.GraftIO.CsvOptions

/** IO surface coverage (SURVEY §2.1): CSV/JSON/ORC read+write with cuDF
  * option mapping, parquet writer with partition_cols.
  *
  * Each query WRITES the format under test (to the local tmp dir) and reads
  * it back; the oracle checks roundtrip fidelity against the original
  * parquet table. This pins the full writer→reader option path (types,
  * nulls, dates, delimiters) without requiring the oracle engine to read
  * the intermediate files.
  */
object IoQueries extends QueryPack {

  private def tmp(name: String): String =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_io/$name"

  // --- CSV roundtrip: header + inferred-free explicit dtype ----------------
  // (cudf/io/csv.py:15 dtype=, header=; csv.hpp:48)
  register("io_csv_roundtrip",
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val src = Tables.customer(s, d).filter(col("c_custkey") <= 1000)
    val path = tmp("csv_roundtrip")
    GraftIO.writeCsv(src, path, header = true)
    GraftIO.readCsv(s, path, CsvOptions(
      header = true,
      dtype = Some(StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))))))
      .orderBy("c_custkey")
  }

  // --- CSV options: custom sep, no header + names, na_values --------------
  // (csv.hpp: delimiter, names, na_values; cudf/io/csv.py keep_default_na)
  register("io_csv_options",
    """SELECT l_orderkey, l_linenumber, nullif(l_discount, 0.0) AS disc_n,
      |  l_returnflag
      |FROM lineitem WHERE l_orderkey <= 200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val src = Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("disc_n"), col("l_returnflag"))
    val path = tmp("csv_options")
    GraftIO.writeCsv(src, path, header = false, sep = "|", naRep = "NA")
    GraftIO.readCsv(s, path, CsvOptions(
      header = false, sep = "|",
      names = Seq("l_orderkey", "l_linenumber", "disc_n", "l_returnflag"),
      naValues = Seq("NA"),
      dtype = Some(StructType(Seq(
        StructField("c0", LongType), StructField("c1", IntegerType),
        StructField("c2", DoubleType), StructField("c3", StringType))))))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- CSV usecols projection (csv.hpp usecols; pushes column pruning) -----
  register("io_csv_usecols",
    """SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 500
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val src = Tables.customer(s, d).filter(col("c_custkey") <= 500)
    val path = tmp("csv_usecols")
    GraftIO.writeCsv(src, path, header = true)
    GraftIO.readCsv(s, path, CsvOptions(
      header = true,
      usecols = Seq("c_custkey", "c_acctbal"),
      dtype = Some(StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))))))
      .orderBy("c_custkey")
  }

  // --- JSON-lines roundtrip (cudf/io/json.py:14, lines=True engine) --------
  register("io_json_roundtrip",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""") { (s, d) =>
    val src = Tables.nation(s, d)
    val path = tmp("json_roundtrip")
    GraftIO.writeJson(src, path)
    GraftIO.readJson(s, path, Some(StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))))
      .orderBy("n_nationkey")
  }

  // --- ORC roundtrip (cudf/io/orc.py:225; zstd compression) ----------------
  register("io_orc_roundtrip",
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val src = Tables.supplier(s, d)
    val path = tmp("orc_roundtrip")
    GraftIO.writeOrc(src, path)
    GraftIO.readOrc(s, path).orderBy("s_suppkey")
  }

  // --- ORC predicate pushdown read (stripe-stats skipping, orc.py:225) -----
  register("io_orc_filtered",
    """SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > 5000
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val path = tmp("orc_filtered")
    GraftIO.writeOrc(Tables.supplier(s, d), path)
    GraftIO.readOrc(s, path)
      .filter(col("s_acctbal") > 5000)
      .select("s_suppkey", "s_acctbal")
      .orderBy("s_suppkey")
  }

  // --- parquet writer with partition_cols (cudf/io/parquet.py:262) ---------
  // hive-style dirs; read-back re-discovers the partition column and prunes
  // on it (the filter below reads only one leaf directory).
  register("io_parquet_partitioned",
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_orderkey <= 5000
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val src = Tables.orders(s, d).filter(col("o_orderkey") <= 5000)
    val path = tmp("parquet_partitioned")
    GraftIO.writeParquet(src, path, partitionCols = Seq("o_orderpriority"))
    GraftIO.readParquet(s, path)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType).as("total"))
      .orderBy("o_orderpriority")
  }

  // --- bucketed tables: co-located join with NO shuffle ---------------------
  // Both sides written bucketed+sorted by the join key (8 buckets): Spark's
  // scan exposes the bucket hash-partitioning, so the sort-merge join needs
  // no Exchange on either side (asserted in PlanSpec). This is THE pattern
  // for repeated large-scale joins on a stable key — at 100 TB, bucketing
  // the fact table once removes the dominant shuffle from every downstream
  // join on that key.
  register("io_bucketed_join",
    """SELECT o.o_custkey AS custkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  max(c.c_mktsegment) AS segment
      |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |WHERE o.o_orderkey <= 5000
      |GROUP BY o.o_custkey ORDER BY custkey""".stripMargin) { (s, d) =>
    // drop catalog entries AND stale locations (a fresh in-memory catalog
    // doesn't know about directories a previous session left behind)
    for (t <- Seq("graft_orders_b", "graft_customer_b")) {
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$t")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    }
    Tables.orders(s, d).filter(col("o_orderkey") <= 5000)
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_orders_b")
    Tables.customer(s, d)
      .write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_customer_b")
    val o = s.table("graft_orders_b")
    val c = s.table("graft_customer_b")
    o.join(c, o.col("o_custkey") === c.col("c_custkey"))
      .groupBy(o.col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType).as("total"),
        max(col("c_mktsegment")).as("segment"))
      .orderBy("custkey")
  }

  // --- parquet partition pruning: read back ONE partition ------------------
  register("io_parquet_pruned",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_orderkey <= 5000 AND o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val src = Tables.orders(s, d).filter(col("o_orderkey") <= 5000)
    val path = tmp("parquet_pruned")
    GraftIO.writeParquet(src, path, partitionCols = Seq("o_orderpriority"))
    GraftIO.readParquet(s, path)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }
}
