package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GF

/** Scalar binary/unary operator surface (SURVEY §2.8; reference
  * cpp/include/cudf/binaryop.hpp:36-73, unary.hpp:30-52, round.hpp:70).
  *
  * Everything is a codegen'd column expression over a filtered projection —
  * the whole query is one WholeStageCodegen span over the parquet scan.
  */
object ScalarQueries extends QueryPack {

  // --- binary arithmetic incl. python-semantics MOD variants ----------------
  register("expr_binops_arith",
    """SELECT l_orderkey, l_linenumber, l_partkey,
      |  l_partkey + l_suppkey AS add_v, l_partkey - l_suppkey AS sub_v,
      |  l_linenumber * l_suppkey AS mul_v,
      |  CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE) AS truediv_v,
      |  CAST(floor(CAST(l_partkey AS DOUBLE) / CAST(l_suppkey + 1 AS DOUBLE)) AS BIGINT) AS floordiv_v,
      |  l_partkey % (l_suppkey + 1) AS cmod_v,
      |  ((l_partkey % (l_suppkey + 1)) + (l_suppkey + 1)) % (l_suppkey + 1) AS pymod_v,
      |  power(l_linenumber, 2) AS pow_v
      |FROM lineitem WHERE l_orderkey <= 500
      |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    val sup1 = col("l_suppkey") + 1
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        (col("l_partkey") + col("l_suppkey")).as("add_v"),
        (col("l_partkey") - col("l_suppkey")).as("sub_v"),
        (col("l_linenumber") * col("l_suppkey")).as("mul_v"),
        GF.truediv(col("l_extendedprice"), col("l_quantity")).as("truediv_v"),
        GF.floordiv(col("l_partkey").cast(DoubleType), sup1.cast(DoubleType))
          .cast(LongType).as("floordiv_v"),
        (col("l_partkey") % sup1).as("cmod_v"),
        GF.pymod(col("l_partkey"), sup1).as("pymod_v"),
        pow(col("l_linenumber"), 2).as("pow_v"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  // --- bitwise / shift ops (binaryop.hpp SHIFT_*, BITWISE_*) ----------------
  register("expr_binops_bitwise",
    """SELECT p_partkey,
      |  p_size << 1 AS shl_v, p_size >> 1 AS shr_v,
      |  p_size & 7 AS and_v, p_size | 8 AS or_v, xor(p_size, 5) AS xor_v,
      |  ~p_size AS not_v
      |FROM part WHERE p_partkey <= 1000 ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") <= 1000)
      .select(col("p_partkey"),
        shiftleft(col("p_size"), 1).as("shl_v"),
        shiftright(col("p_size"), 1).as("shr_v"),
        col("p_size").bitwiseAND(7).as("and_v"),
        col("p_size").bitwiseOR(8).as("or_v"),
        col("p_size").bitwiseXOR(5).as("xor_v"),
        bitwise_not(col("p_size")).as("not_v"))
      .orderBy("p_partkey")
  }

  // --- unary math (unary.hpp SIN..CBRT; rounded to absorb libm ulp skew) ----
  register("expr_unary_math",
    """SELECT c_custkey,
      |  round(sin(c_acctbal / 10000), 9) AS sin_v,
      |  round(cos(c_acctbal / 10000), 9) AS cos_v,
      |  round(exp(c_acctbal / 10000), 9) AS exp_v,
      |  round(ln(abs(c_acctbal) + 1), 9) AS log_v,
      |  round(sqrt(abs(c_acctbal)), 9) AS sqrt_v,
      |  round(cbrt(abs(c_acctbal)), 9) AS cbrt_v,
      |  CAST(ceil(c_acctbal) AS BIGINT) AS ceil_v,
      |  CAST(floor(c_acctbal) AS BIGINT) AS floor_v,
      |  abs(c_acctbal) AS abs_v
      |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val x = col("c_acctbal")
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 1000)
      .select(col("c_custkey"),
        round(sin(x / 10000), 9).as("sin_v"),
        round(cos(x / 10000), 9).as("cos_v"),
        round(exp(x / 10000), 9).as("exp_v"),
        round(log(abs(x) + 1), 9).as("log_v"),
        round(sqrt(abs(x)), 9).as("sqrt_v"),
        round(cbrt(abs(x)), 9).as("cbrt_v"),
        ceil(x).as("ceil_v"), floor(x).as("floor_v"),
        abs(x).as("abs_v"))
      .orderBy("c_custkey")
  }

  // --- round half-up vs half-even (round.hpp:70 half_even/half_up) ----------
  // Half-way cases only exist in decimal space (doubles never sit exactly on
  // .x5), so rounding-mode semantics are pinned on DECIMAL(12,2) inputs.
  register("expr_round_modes",
    """SELECT c_custkey,
      |  CAST(round(CAST(c_acctbal AS DECIMAL(12,2)), 1) AS DOUBLE) AS round_half_up,
      |  CAST((n - d + CASE WHEN d > 5 THEN 10 WHEN d < 5 THEN 0
      |        WHEN (((n - d) // 10) % 2 + 2) % 2 = 0 THEN 0 ELSE 10 END) AS DOUBLE) / 100 AS round_half_even,
      |  CAST(round(CAST(c_acctbal AS DECIMAL(12,2)), -2) AS DOUBLE) AS round_neg_digits
      |FROM (SELECT c_custkey, c_acctbal,
      |        CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS n,
      |        ((CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) % 10) + 10) % 10 AS d
      |      FROM customer WHERE c_custkey <= 1000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val dec = col("c_acctbal").cast(DecimalType(12, 2))
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 1000)
      .select(col("c_custkey"),
        round(dec, 1).cast(DoubleType).as("round_half_up"),
        bround(dec, 1).cast(DoubleType).as("round_half_even"),
        round(dec, -2).cast(DoubleType).as("round_neg_digits"))
      .orderBy("c_custkey")
  }

  // --- casts (unary.hpp:111; DuckDB CAST rounds, cuDF/Spark truncate — the
  //     oracle uses trunc() to pin cuDF's toward-zero semantics) ------------
  register("expr_cast",
    """SELECT c_custkey,
      |  CAST(trunc(c_acctbal) AS BIGINT) AS to_long,
      |  CAST(c_custkey AS DOUBLE) AS to_double,
      |  CAST(c_acctbal AS VARCHAR) AS to_string,
      |  CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS roundtrip_long
      |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 1000)
      .select(col("c_custkey"),
        col("c_acctbal").cast(LongType).as("to_long"),
        col("c_custkey").cast(DoubleType).as("to_double"),
        col("c_acctbal").cast(StringType).as("to_string"),
        col("c_custkey").cast(StringType).cast(LongType).as("roundtrip_long"))
      .orderBy("c_custkey")
  }

  // --- null predicates + null-safe ops (unary.hpp:81 is_null; NULL_EQUALS,
  //     NULL_MAX/MIN; nan_policy types.hpp:135) ------------------------------
  // --- isclose + nans_to_nulls (frame.py isclose, nans_to_nulls) ------------
  // numpy-contract approximate equality (|a−b| ≤ atol + rtol·|b|, equal_nan
  // variant) and the NaN→null bridge between the two missing-value
  // representations (SURVEY §1.3). Pure IEEE arithmetic/comparisons;
  // rtol=0.25 is a power of two so the scaled tolerance is exact; both
  // engines order NaN above all values so the non-equal_nan branch agrees.
  register("expr_isclose_nan",
    """WITH t AS (SELECT l_orderkey, l_linenumber, l_partkey, l_tax, l_discount,
      |    CASE WHEN l_orderkey % 7 = 0 THEN CAST('nan' AS DOUBLE) ELSE l_tax END AS nanv
      |  FROM lineitem WHERE l_orderkey <= 500)
      |SELECT l_orderkey, l_linenumber, l_partkey,
      |  abs(l_tax - l_discount) <= 1e-8 + 1e-5 * abs(l_discount) AS close_default,
      |  abs(l_tax - l_discount) <= 1e-8 + 0.25 * abs(l_discount) AS close_rtol,
      |  (isnan(nanv) AND isnan(nanv))
      |    OR abs(nanv - nanv) <= 1e-8 + 1e-5 * abs(nanv) AS nan_eq,
      |  abs(nanv - nanv) <= 1e-8 + 1e-5 * abs(nanv) AS nan_ne,
      |  CASE WHEN isnan(nanv) THEN NULL ELSE nanv END AS nulled
      |FROM t ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    val nanv = when(col("l_orderkey") % 7 === 0, lit(Double.NaN))
      .otherwise(col("l_tax"))
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .withColumn("nanv", nanv)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        GF.isclose(col("l_tax"), col("l_discount")).as("close_default"),
        GF.isclose(col("l_tax"), col("l_discount"), rtol = 0.25).as("close_rtol"),
        GF.isclose(col("nanv"), col("nanv"), equalNan = true).as("nan_eq"),
        GF.isclose(col("nanv"), col("nanv")).as("nan_ne"),
        GF.nansToNulls(col("nanv")).as("nulled"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  register("expr_null_ops",
    """SELECT l_orderkey, l_linenumber, l_partkey,
      |  nullif(l_discount, 0.0) IS NULL AS is_null_v,
      |  nullif(l_discount, 0.0) IS NOT NULL AS is_valid_v,
      |  nullif(l_discount, 0.0) IS NOT DISTINCT FROM nullif(l_tax, 0.0) AS null_eq,
      |  greatest(nullif(l_discount, 0.0), nullif(l_tax, 0.0)) AS null_max,
      |  least(nullif(l_discount, 0.0), nullif(l_tax, 0.0)) AS null_min,
      |  isnan(CASE WHEN l_discount > 0.05 THEN CAST('nan' AS DOUBLE) ELSE l_discount END) AS nan_probe,
      |  CASE WHEN isnan(CASE WHEN l_discount > 0.05 THEN CAST('nan' AS DOUBLE) ELSE l_discount END)
      |       THEN -1.0 ELSE l_discount END AS nanvl_v
      |FROM lineitem WHERE l_orderkey <= 300
      |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    val dn = nullif(col("l_discount"), lit(0.0))
    val tn = nullif(col("l_tax"), lit(0.0))
    // NaN ≠ null (types.hpp:135 nan_policy): synthesize NaNs, test isnan+nanvl
    val nanCol = when(col("l_discount") > 0.05, lit(Double.NaN)).otherwise(col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 300)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        dn.isNull.as("is_null_v"),
        dn.isNotNull.as("is_valid_v"),
        GF.nullEquals(dn, tn).as("null_eq"),
        GF.nullMax(dn, tn).as("null_max"),
        GF.nullMin(dn, tn).as("null_min"),
        isnan(nanCol).as("nan_probe"),
        nanvl(nanCol, lit(-1.0)).as("nanvl_v"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  // --- decimal32/64 arithmetic (types.hpp:229 DECIMAL32/64; fixed_point
  // add/sub/mul are exact — division is engine-specific in result scale, so
  // the surface pins +,−,× and explicit rescaling via round) ----------------
  register("expr_decimal",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(4,2)) AS DOUBLE) AS dec_add,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS dec_sub,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(4,2)) AS DOUBLE) AS dec_mul,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(4,2)), 2) AS DOUBLE) AS dec_mul_rescaled
      |FROM lineitem WHERE l_orderkey <= 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val price = col("l_extendedprice").cast(DecimalType(12, 2))
    val tax = col("l_tax").cast(DecimalType(4, 2))
    val disc = col("l_discount").cast(DecimalType(4, 2))
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        (price + tax).cast(DoubleType).as("dec_add"),
        (price - disc).cast(DoubleType).as("dec_sub"),
        (price * tax).cast(DoubleType).as("dec_mul"),
        round(price * tax, 2).cast(DoubleType).as("dec_mul_rescaled"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- Spark-compatible murmur3 hash (types.hpp:333 HASH_SPARK_MURMUR3 —
  //     the reference ships a Spark-bit-compatible hash; Spark IS the
  //     reference implementation here, so the oracle is a golden literal
  //     table. Inputs are LITERAL (bigint key + TPC-H-format name string),
  //     not table rows, so the golden is valid at ANY scale factor — the
  //     query pins ONLY the hash implementations, not the dataset --------
  register("expr_hash_murmur3",
    """SELECT * FROM (VALUES
      |  (0, -1093816050, '83791d5040f24a425b59e8f9ef801409', -1611614044712855306, 150),
      |  (1, -1019145397, '1a81c7ee249d75989db905270e18d3bd', -1273194175839338384, 3),
      |  (2, -1236958300, '64a127b26abaa261372ac715ccf8104d', 4230275052035904739, 100),
      |  (3, 1109282735, '4b540ee8f5a3c2d0586ee20d46e0e49d', 8790310100283397219, 135),
      |  (4, 1620450021, '9c1892e34176c1a7d49f3797b87b9120', 316677342281141099, 21),
      |  (5, 1985496350, '73be20b2c916735379f5a0702c99844c', -5570647415552356329, 150),
      |  (6, -1117509934, '7e5972bbf0112d9ff4a2fa6a2b65cca3', -5102247309164607512, 66),
      |  (7, -122441681, 'd60fe91dfe072cbf230f0466bdd1ee34', -4322517095852596783, 119),
      |  (8, 1208212362, 'b5187d715e4fb941ce716a2918cebbd3', -6210387787695566441, 162),
      |  (9, -119114515, '86e0fe1bed5a93bd7fe999115601a59d', -6779273362615130559, 85),
      |  (10, 1623661346, 'fbedcddd668970ed933c5c459144c1ab', -4111994317867864847, 146),
      |  (11, -803109076, '704ebdf235ac385b8c06b20ea318ba78', -5443359310541977166, 124),
      |  (12, -1547564386, 'd3f90a2bfa53314e33640255542fc7ae', -8055872669115236803, 14),
      |  (13, 2096405692, '87ea8e7ad257b99deaccc39863a4c1bd', -8634557501709187542, 92),
      |  (14, 559504794, '9ef7a334c6caff68ecc99d1d66ba731c', 4750634036745744549, 194),
      |  (15, 964135357, '961288b59d432a10734056d2fccb4b37', -1728440964537798077, 157),
      |  (16, -1733889583, '75dbb64eb0ff47bb4160bd2acc5b0c6c', -4177512028953191414, 17),
      |  (17, 272001927, '773eb1baa048911e3b1afb7da2564bfd', 2664143128668371311, 127),
      |  (18, -862294309, '56bd63286667ddff65a379815e7d7d3c', 2633404807699057550, 91),
      |  (19, 1548867029, '9094ae162f0e3e014c52efb677360696', 4629955984357864070, 29),
      |  (20, -535560678, 'bba8fa7740cbff2e51bfe6b14e40cd04', 8712587351026243346, 122)
      |) t(c_custkey, murmur3, md5_hex, xx64, hash_enc) ORDER BY c_custkey""".stripMargin) { (s, _) =>
    import s.implicits._
    (0 to 20).map(i => (i.toLong, f"Customer#$i%09d")).toDF("c_custkey", "c_name")
      .select(col("c_custkey").cast(IntegerType).as("c_custkey"),
        hash(col("c_custkey"), col("c_name")).as("murmur3"),
        md5(col("c_name").cast(BinaryType)).as("md5_hex"),
        xxhash64(col("c_custkey"), col("c_name")).as("xx64"),
        // hash_encode (series.py:5358): hash → [0, stop) feature encoding
        pmod(hash(col("c_custkey"), col("c_name")), lit(200)).as("hash_enc"))
      .orderBy("c_custkey")
  }

  // --- byte_cast (reshape.hpp:95): int32 → its 4 bytes, both endiannesses ---
  // Pure per-row bit arithmetic (shift + mask), flattened to a CSV string
  // for the cross-engine hash; no UDF, fully codegen'd.
  register("expr_byte_cast",
    """SELECT c_custkey,
      |  concat_ws(',',
      |    CAST((c_custkey >> 24) & 255 AS VARCHAR), CAST((c_custkey >> 16) & 255 AS VARCHAR),
      |    CAST((c_custkey >> 8) & 255 AS VARCHAR), CAST(c_custkey & 255 AS VARCHAR)) AS be_bytes,
      |  concat_ws(',',
      |    CAST(c_custkey & 255 AS VARCHAR), CAST((c_custkey >> 8) & 255 AS VARCHAR),
      |    CAST((c_custkey >> 16) & 255 AS VARCHAR), CAST((c_custkey >> 24) & 255 AS VARCHAR)) AS le_bytes
      |FROM customer WHERE c_custkey <= 1000 ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val b = (n: Int) => (shiftright(col("c_custkey"), n) bitwiseAND 255).cast(StringType)
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 1000)
      .select(col("c_custkey"),
        concat_ws(",", b(24), b(16), b(8), b(0)).as("be_bytes"),
        concat_ws(",", b(0), b(8), b(16), b(24)).as("le_bytes"))
      .orderBy("c_custkey")
  }
}
