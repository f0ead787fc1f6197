package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GF

/** Approximate-nearest-neighbor search over the embeddings table (north-star
  * extension).
  *
  * Three tiers, by scale:
  *  1. brute-force top-k: exact, O(q·n) — fine when the query set is small
  *     and broadcastable; the corpus side streams, never materializes pairs
  *     beyond the window ranking.
  *  2. random-hyperplane LSH buckets: corpus is bucketed by sign bits of
  *     integer-deterministic hyperplanes; search touches one bucket —
  *     sub-linear candidate sets, one shuffle on the bucket key.
  *  3. IVF-style coarse quantization: corpus partitioned by nearest centroid;
  *     queries probe their own cell. Centroids here are fixed seed vectors
  *     (k-means would converge them; assignment is the operator under test).
  */
object SimilarityQueries extends QueryPack {

  // DuckDB fragments over DOUBLE[] vectors
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), (x, y) -> x + y)"
  private def normSql(a: String) =
    s"sqrt(list_reduce(list_transform($a, x -> x * x), (x, y) -> x + y))"
  private def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"
  // squared L2 over the 8-dim PQ subvectors, left-fold in index order on
  // both engines so the doubles are bit-identical
  private def l2Sql8(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (x, y) -> x + y)"

  private def vecs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast(DoubleType)).as("v"))

  // fused codegen cosine kernel (expressions/CosineSim.scala) — bit-identical
  // to the dot/(norm·norm) HOF fold it replaced, but whole-stage-codegen'd
  private val cosine = (a: Column, b: Column) => GF.cosine(a, b)

  // --- 1. brute-force cosine top-k (exact baseline) -------------------------
  register("sim_bruteforce_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      |scored AS (SELECT qid, vec_id AS nid,
      |    round(""".stripMargin + cosSql("qv", "v") + """, 6) AS cosine
      |  FROM q, e WHERE vec_id <> qid)
      |SELECT qid, nid, cosine FROM scored
      |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) <= 3
      |ORDER BY qid, cosine DESC, nid""".stripMargin) { (s, d) =>
    val e = vecs(s, d)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    e.select(col("vec_id").as("nid"), col("v"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cosine", round(cosine(col("qv"), col("v")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("nid"), col("cosine"))
      .orderBy(col("qid"), col("cosine").desc, col("nid"))
  }

  // --- 2. random-hyperplane LSH buckets -------------------------------------
  // Hyperplane j component i = ((i·31 + j·17) mod 7) − 3: integer-valued,
  // engine-exact, fixed. Bucket = Σ_j [dot(v, plane_j) > 0]·2^j  (8 bits).
  register("sim_lsh_buckets",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |b AS (SELECT vec_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 8)), (acc, j) ->
      |    acc + CASE WHEN list_reduce(list_transform(range(1, len(v) + 1),
      |        i -> v[i] * (((i - 1) * 31 + j * 17) % 7 - 3)), (x, y) -> x + y) > 0
      |      THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS bucket
      |  FROM e)
      |SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
    val planeDot = (v: Column, j: Column) =>
      aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * ((i * 31 + j * 17) % 7 - 3).cast(DoubleType)),
        lit(0.0), (x, y) => x + y)
    val bucket = aggregate(
      sequence(lit(0), lit(7)), lit(0L),
      (acc, j) => acc + when(planeDot(col("v"), j) > 0,
        pow(lit(2.0), j).cast(LongType)).otherwise(0L))
    vecs(s, d)
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
      .orderBy("bucket")
  }

  // --- 2b. LSH-bucketed neighbor search: candidates share a bucket ----------
  register("sim_lsh_search",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |b AS (SELECT vec_id, v,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 4)), (acc, j) ->
      |    acc + CASE WHEN list_reduce(list_transform(range(1, len(v) + 1),
      |        i -> v[i] * (((i - 1) * 31 + j * 17) % 7 - 3)), (x, y) -> x + y) > 0
      |      THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS bucket
      |  FROM e)
      |SELECT a.vec_id AS qid, b.vec_id AS nid,
      |  round(""".stripMargin + cosSql("a.v", "b.v") + """, 6) AS cosine
      |FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
      |WHERE a.vec_id < 5
      |QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY round(""".stripMargin +
      cosSql("a.v", "b.v") + """, 6) DESC, b.vec_id) <= 3
      |ORDER BY qid, cosine DESC, nid""".stripMargin) { (s, d) =>
    val planeDot = (v: Column, j: Column) =>
      aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * ((i * 31 + j * 17) % 7 - 3).cast(DoubleType)),
        lit(0.0), (x, y) => x + y)
    val bucket = aggregate(
      sequence(lit(0), lit(3)), lit(0L),
      (acc, j) => acc + when(planeDot(col("v"), j) > 0,
        pow(lit(2.0), j).cast(LongType)).otherwise(0L))
    val e = vecs(s, d).withColumn("bucket", bucket)
    val q = e.filter(col("vec_id") < 5)
      .select(col("bucket"), col("vec_id").as("qid"), col("v").as("qv"))
    val c = e.select(col("bucket"), col("vec_id").as("nid"), col("v"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", round(cosine(col("qv"), col("v")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("nid"), col("cosine"))
      .orderBy(col("qid"), col("cosine").desc, col("nid"))
  }

  // --- 3a. IVF k-means TRAINING: 3 Lloyd's iterations + final assignment ----
  // Distributed k-means the way Spark MLlib does it: per iteration, assign
  // every vector to its nearest centroid (a projection against k broadcast
  // centroid literals — the corpus never shuffles), then re-centroid with one
  // hash aggregation; only k·dim numbers (the new centroids) ever reach the
  // driver. Determinism contract, which is what lets DuckDB replicate the
  // run exactly instead of pinning a golden literal: components quantized to
  // floor(1000·x) make every iteration-1 distance an exact integer, per-dim
  // means are exact-integer-sum / count (order-independent), and later
  // distances fold left over identical doubles in both engines. Ties break
  // to the lowest cid on both sides.
  register("sim_ivf_train_assign", {
    val dist = (xi: String, cv: String) =>
      s"list_reduce(list_transform(range(1, len($xi) + 1), " +
        s"i -> ($xi[i] - $cv[i]) * ($xi[i] - $cv[i])), (x, y) -> x + y)"
    val assign = (src: String, cents: String) =>
      s"""(SELECT vec_id, cid, xi FROM (
         |   SELECT e.vec_id, c.cid, e.xi,
         |     row_number() OVER (PARTITION BY e.vec_id
         |       ORDER BY ${dist("e.xi", "c.cv")}, c.cid) AS rn
         |   FROM $src e, $cents c) WHERE rn = 1)""".stripMargin
    val recenter = (asg: String) =>
      s"""(SELECT cid, list(m ORDER BY i) AS cv FROM (
         |   SELECT cid, i, CAST(sum(x) AS DOUBLE) / count(*) AS m FROM (
         |     SELECT cid, generate_subscripts(xi, 1) AS i, unnest(xi) AS x
         |     FROM $asg) GROUP BY cid, i) GROUP BY cid)""".stripMargin
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1000)) AS xi
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, xi AS cv FROM e WHERE vec_id < 4),
       |a1 AS ${assign("e", "c0")},
       |c1 AS ${recenter("a1")},
       |a2 AS ${assign("e", "c1")},
       |c2 AS ${recenter("a2")},
       |a3 AS ${assign("e", "c2")},
       |c3 AS ${recenter("a3")},
       |af AS ${assign("e", "c3")}
       |SELECT cid, count(*) AS cell_size,
       |  round(sum(xi[1]) / count(*), 6) AS mean_dim0
       |FROM af GROUP BY cid ORDER BY cid""".stripMargin
  }) { (s, d) =>
    val k = 4
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => floor(x.cast(DoubleType) * 1000).cast(DoubleType))
          .as("xi"))
    // seed centroids: quantized vectors 0..k-1 (k rows to the driver)
    var cents: IndexedSeq[Seq[Double]] = e.filter(col("vec_id") < k).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1)).toIndexedSeq
    // nearest-centroid assignment against k literal centroids; ties → lowest cid
    def assigned() = {
      val dists = array(cents.map(c =>
        aggregate(zip_with(col("xi"), typedlit(c), (a, b) => (a - b) * (a - b)),
          lit(0.0), (x, y) => x + y)): _*)
      e.withColumn("cid", (array_position(dists, array_min(dists)) - 1).cast(IntegerType))
    }
    for (_ <- 1 to 3) {
      // re-centroid: exact integer sums per (cid, dim); k·dim rows collect
      val means = assigned()
        .select(col("cid"), posexplode(col("xi")).as(Seq("i", "x")))
        .groupBy(col("cid"), col("i"))
        .agg((sum(col("x")) / count(lit(1))).as("m"))
        .collect()
      val byCid = means.groupBy(_.getInt(0))
      cents = (0 until k).map { cid =>
        byCid.get(cid) // empty cluster keeps its centroid (MLlib convention)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
          .getOrElse(cents(cid))
      }
    }
    assigned()
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("cell_size"),
        round(sum(element_at(col("xi"), 1)) / count(lit(1)), 6).as("mean_dim0"))
      .orderBy("cid")
  }

  // --- 2b. incremental index maintenance: assign NEW vectors to a FROZEN ----
  // trained index. The daily-ingest path of a production ANN index (FAISS
  // add() after train()): the codebook is trained once on the existing
  // corpus and new arrivals are routed without retraining — at 100 TB the
  // retrain is a rare offline job while assignment is a cheap scan (new
  // slice × k broadcast centroids, no shuffle beyond the output agg), so
  // the two must be separable operators, not one fused query. Training here
  // runs the same deterministic 3-round Lloyd's as sim_ivf_train_assign but
  // on the even-id half only; the odd-id half then assigns against the
  // frozen centroids. The oracle replays both phases exactly.
  register("sim_ivf_incremental", {
    val dist = (xi: String, cv: String) =>
      s"list_reduce(list_transform(range(1, len($xi) + 1), " +
        s"i -> ($xi[i] - $cv[i]) * ($xi[i] - $cv[i])), (x, y) -> x + y)"
    val assign = (src: String, cents: String) =>
      s"""(SELECT vec_id, cid, xi FROM (
         |   SELECT e.vec_id, c.cid, e.xi,
         |     row_number() OVER (PARTITION BY e.vec_id
         |       ORDER BY ${dist("e.xi", "c.cv")}, c.cid) AS rn
         |   FROM $src e, $cents c) WHERE rn = 1)""".stripMargin
    val recenter = (asg: String) =>
      s"""(SELECT cid, list(m ORDER BY i) AS cv FROM (
         |   SELECT cid, i, CAST(sum(x) AS DOUBLE) / count(*) AS m FROM (
         |     SELECT cid, generate_subscripts(xi, 1) AS i, unnest(xi) AS x
         |     FROM $asg) GROUP BY cid, i) GROUP BY cid)""".stripMargin
    s"""WITH eall AS (SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1000)) AS xi
       |  FROM embeddings),
       |e AS (SELECT * FROM eall WHERE vec_id % 2 = 0),
       |enew AS (SELECT * FROM eall WHERE vec_id % 2 = 1),
       |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, xi AS cv
       |       FROM e WHERE vec_id < 8),
       |a1 AS ${assign("e", "c0")},
       |c1 AS ${recenter("a1")},
       |a2 AS ${assign("e", "c1")},
       |c2 AS ${recenter("a2")},
       |a3 AS ${assign("e", "c2")},
       |c3 AS ${recenter("a3")},
       |af AS ${assign("enew", "c3")}
       |SELECT cid, count(*) AS n_new,
       |  round(sum(xi[1]) / count(*), 6) AS mean_dim0
       |FROM af GROUP BY cid ORDER BY cid""".stripMargin
  }) { (s, d) =>
    val k = 4
    val eall = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => floor(x.cast(DoubleType) * 1000).cast(DoubleType))
          .as("xi"))
    val e = eall.filter(col("vec_id") % 2 === 0)
    val eNew = eall.filter(col("vec_id") % 2 === 1)
    // k seeds from the TRAINING slice (even ids 0,2,4,6), re-indexed to
    // positional cids 0..k-1 on both engines
    var cents: IndexedSeq[Seq[Double]] = e.filter(col("vec_id") < 2 * k).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1)).toIndexedSeq
    def assigned(src: org.apache.spark.sql.DataFrame) = {
      val dists = array(cents.map(c =>
        aggregate(zip_with(col("xi"), typedlit(c), (a, b) => (a - b) * (a - b)),
          lit(0.0), (x, y) => x + y)): _*)
      src.withColumn("cid", (array_position(dists, array_min(dists)) - 1).cast(IntegerType))
    }
    for (_ <- 1 to 3) {
      val means = assigned(e)
        .select(col("cid"), posexplode(col("xi")).as(Seq("i", "x")))
        .groupBy(col("cid"), col("i"))
        .agg((sum(col("x")) / count(lit(1))).as("m"))
        .collect()
      val byCid = means.groupBy(_.getInt(0))
      cents = (0 until k).map { cid =>
        byCid.get(cid)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
          .getOrElse(cents(cid))
      }
    }
    // frozen-index assignment of the new slice: scan + k literal centroids
    assigned(eNew)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_new"),
        round(sum(element_at(col("xi"), 1)) / count(lit(1)), 6).as("mean_dim0"))
      .orderBy("cid")
  }

  // --- 3. IVF-style coarse assignment (centroids = seed vectors 0..3) -------
  register("sim_ivf_assign",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
      |scored AS (SELECT e.vec_id, c.cid,
      |    """.stripMargin + cosSql("e.v", "c.cv") + """ AS cos_c
      |  FROM e, c),
      |best AS (SELECT vec_id, cid, cos_c FROM scored
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid) = 1)
      |SELECT cid, count(*) AS cell_size,
      |  round(CAST(sum(CAST(round(cos_c * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS sum_cos
      |FROM best GROUP BY cid ORDER BY cid""".stripMargin) { (s, d) =>
    val e = vecs(s, d)
    val c = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cid"))
    e.crossJoin(broadcast(c))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("cell_size"),
        round(sum(round(col("cos_c") * 1000000).cast(LongType)).cast(DoubleType) / 1000000, 6)
          .as("sum_cos"))
      .orderBy("cid")
  }

  // --- 3b. IVF SEARCH: probe nprobe cells per query -------------------------
  // The full ANN query path over the coarse quantizer: corpus vectors carry
  // their nearest-centroid cell id (broadcast centroids — corpus never
  // shuffles for assignment), each query probes its nprobe=2 nearest cells,
  // and the candidate join is an EQUI-join on the cell id — at 100 TB the
  // corpus is bucketed by cid so a probe reads nprobe buckets, never the full
  // table; scoring cost is |cells probed|, the IVF contract. Ties → lowest
  // cid/nid everywhere, so both engines agree exactly.
  register("sim_ivf_search",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
      |asg AS (SELECT vec_id, cid, v FROM (
      |    SELECT e.vec_id, c.cid, e.v,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY """.stripMargin + cosSql("e.v", "c.cv") + """ DESC, c.cid) AS rn
      |    FROM e, c) WHERE rn = 1),
      |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      |probe AS (SELECT qid, cid, qv FROM (
      |    SELECT q.qid, c.cid, q.qv,
      |      row_number() OVER (PARTITION BY q.qid
      |        ORDER BY """.stripMargin + cosSql("q.qv", "c.cv") + """ DESC, c.cid) AS rn
      |    FROM q, c) WHERE rn <= 2),
      |scored AS (SELECT qid, a.vec_id AS nid,
      |    round(""".stripMargin + cosSql("qv", "a.v") + """, 6) AS cosine
      |  FROM probe p JOIN asg a ON p.cid = a.cid AND a.vec_id <> p.qid)
      |SELECT qid, nid, cosine FROM scored
      |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) <= 3
      |ORDER BY qid, cosine DESC, nid""".stripMargin) { (s, d) =>
    val e = vecs(s, d)
    val c = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val wAsg = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cid"))
    val asg = e.crossJoin(broadcast(c))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(wAsg))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("v"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cos_q").desc, col("cid"))
    val probe = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(c))
      .withColumn("cos_q", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("qid"), col("cid"), col("qv"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    probe.join(asg, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(cosine(col("qv"), col("v")), 6).as("cosine"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("nid"), col("cosine"))
      .orderBy(col("qid"), col("cosine").desc, col("nid"))
  }

  // --- int8 scalar quantization round-trip ----------------------------------
  // Vector compression for ANN at scale: 4× smaller than float32, the
  // standard first step before IVF/PQ indexes (FAISS SQ8). Per-vector
  // absmax scale, q_i = round-half-up(x_i/scale) ∈ [-127, 127]; the gate
  // checks the two invariants that make SQ8 usable — codes stay in range
  // and reconstruction error is bounded by scale/2 per component. All
  // arithmetic is identical IEEE doubles on both engines, so the booleans
  // (not just approximations) are oracle-checkable at any sf.
  register("emb_quantize_roundtrip", {
    val absmax = "list_reduce(list_transform(v, x -> abs(x)), (x, y) -> CASE WHEN x > y THEN x ELSE y END)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sc AS (SELECT vec_id, v,
       |    CASE WHEN $absmax / 127 > 1e-12 THEN $absmax / 127 ELSE 1e-12 END AS scale
       |  FROM e),
       |qz AS (SELECT vec_id, scale,
       |    list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS q, v
       |  FROM sc)
       |SELECT vec_id, round(scale, 9) AS scale_r,
       |  list_reduce(list_transform(q, x -> abs(x)), (x, y) -> CASE WHEN x > y THEN x ELSE y END) <= 127 AS codes_in_range,
       |  list_reduce(list_transform(range(1, len(v) + 1), i -> abs(v[i] - q[i] * scale)),
       |    (x, y) -> CASE WHEN x > y THEN x ELSE y END) <= scale * 0.5 + 1e-12 AS err_bounded
       |FROM qz ORDER BY vec_id""".stripMargin
  }) { (s, d) =>
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val absmax = aggregate(transform(col("v"), x => abs(x)), lit(0.0),
      (acc, x) => when(x > acc, x).otherwise(acc))
    val sc = e.withColumn("scale", greatest(absmax / 127, lit(1e-12)))
    val qz = sc.withColumn("q",
      transform(col("v"), x => floor(x / col("scale") + 0.5).cast(LongType)))
    val qmax = aggregate(transform(col("q"), x => abs(x)), lit(0L),
      (acc, x) => when(x > acc, x).otherwise(acc))
    val emax = aggregate(
      zip_with(col("v"), col("q"), (x, q) => abs(x - q * col("scale"))), lit(0.0),
      (acc, x) => when(x > acc, x).otherwise(acc))
    qz.select(col("vec_id"), round(col("scale"), 9).as("scale_r"),
        (qmax <= 127).as("codes_in_range"),
        (emax <= col("scale") * 0.5 + 1e-12).as("err_bounded"))
      .orderBy("vec_id")
  }

  // --- SemDeDup-style semantic dedup (Abbas et al. 2023 construction) -------
  // Cluster the corpus (nearest of k centroids — k-means-trained in
  // production, k ∝ N so cell size stays constant; seed centroids here, the
  // sim_ivf_assign exemption), then find near-dups WITHIN cells only. Cells
  // are further sub-bucketed by a 12-bit hyperplane LSH key with a hard
  // per-bucket cap, so candidate pairs are ≤ N·cap/2 — linear in N, the
  // same bound as dedup_embedding_cosine. A removed doc is one with a
  // lower-id near-dup (cosine ≥ τ) in its bucket; survivors = the rest.
  // The LSH dots are posexplode→sum aggregates (codegen-friendly), never
  // nested interpreted HOFs feeding a generator.
  register("dedup_semantic",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      |asg AS (SELECT vec_id, cid, v FROM (
      |    SELECT e.vec_id, c.cid, e.v,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY """.stripMargin + cosSql("e.v", "c.cv") + """ DESC, c.cid) AS rn
      |    FROM e, c) WHERE rn = 1),
      |ax AS (SELECT vec_id, cid,
      |    list_transform(v, x -> CAST(floor(x * 1000) AS BIGINT)) AS xi FROM asg),
      |bk AS (SELECT vec_id, cid,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 12)), (acc, jj) ->
      |    acc + CASE WHEN list_reduce(list_transform(range(1, len(xi) + 1),
      |        i -> xi[i] * (((i - 1) * 31 + jj * 17) % 7 - 3)), (x, y) -> x + y) > 0
      |      THEN (CAST(1 AS BIGINT) << jj) ELSE 0 END) AS bkey
      |  FROM ax),
      |ok AS (SELECT cid, bkey FROM bk GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 50),
      |pr AS (SELECT b.vec_id, b.cid, b.bkey FROM bk b JOIN ok USING (cid, bkey)),
      |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
      |         FROM pr a JOIN pr b ON a.cid = b.cid AND a.bkey = b.bkey
      |            AND a.vec_id < b.vec_id),
      |dup AS (SELECT v1, v2,
      |    """.stripMargin + cosSql("e1.v", "e2.v") + """ AS cos_v
      |  FROM cand JOIN e e1 ON e1.vec_id = v1 JOIN e e2 ON e2.vec_id = v2
      |  WHERE """.stripMargin + cosSql("e1.v", "e2.v") + """ >= 0.2)
      |SELECT v2 AS vec_id, min(v1) AS dup_of, round(max(cos_v), 6) AS best_cos
      |FROM dup GROUP BY v2 ORDER BY vec_id""".stripMargin) { (s, d) =>
    val MaxBucket = 50
    val Bits = 12
    val tau = 0.2
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val c = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val wAsg = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cid"))
    val asg = e.crossJoin(broadcast(c))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(wAsg))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("v"))
    val dims = asg.select(col("vec_id"), col("cid"), posexplode(col("v")).as(Seq("i", "x")))
      .select(col("vec_id"), col("cid"), col("i"),
        floor(col("x") * 1000).cast(LongType).as("xi"))
    val dotCols = (0 until Bits).map { j =>
      sum(col("xi") * ((col("i") * 31 + lit(j * 17)) % 7 - 3)).as(s"dot$j")
    }
    val dots = dims.groupBy(col("vec_id"), col("cid")).agg(dotCols.head, dotCols.tail: _*)
    val bkey = (0 until Bits).map { jj =>
      when(col(s"dot$jj") > 0, lit(1L << jj)).otherwise(0L)
    }.reduce(_ + _)
    // The expensive assignment chain (crossjoin+window+posexplode+agg) is
    // PINNED so it evaluates once — its three consumers (bucket-size gate,
    // both sides of the candidate self-join) read the cached 3-column
    // relation. The r9 shape re-evaluated the chain three times (no
    // exchange is reusable across three differently-shaped shuffles); a
    // collect_list-of-members rewrite would also evaluate once but holds
    // an UNBOUNDED per-bucket buffer during aggregation — a degenerate
    // corpus (many identical vectors in one LSH bucket) would OOM one
    // reducer at exactly the scale this query pack documents. The
    // count-gate + equi-join shape keeps every buffer O(1); candidate
    // fan-out stays ≤ MaxBucket² per bucket. Verify/Bench release the pin
    // via OrderedOps.clearPins after the consuming action.
    val keyed = graft.ops.OrderedOps.pinned(
      dots.select(col("vec_id"), col("cid"), bkey.as("bkey")))
    val okBuckets = keyed.groupBy(col("cid"), col("bkey"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz").between(2, MaxBucket))
      .select("cid", "bkey")
    val pruned = keyed.join(okBuckets, Seq("cid", "bkey"))
    // each vec_id carries exactly one (cid, bkey), so in-bucket pairs are
    // already globally unique — no distinct needed
    val cand = pruned.select(col("cid"), col("bkey"), col("vec_id").as("v1"))
      .join(pruned.select(col("cid"), col("bkey"), col("vec_id").as("v2")),
        Seq("cid", "bkey"))
      .filter(col("v1") < col("v2"))
      .select("v1", "v2")
    cand
      .join(e.select(col("vec_id").as("v1"), col("v").as("va")), Seq("v1"))
      .join(e.select(col("vec_id").as("v2"), col("v").as("vb")), Seq("v2"))
      .withColumn("cos_v", cosine(col("va"), col("vb")))
      .filter(col("cos_v") >= tau)
      .groupBy(col("v2"))
      .agg(min(col("v1")).as("dup_of"), round(max(col("cos_v")), 6).as("best_cos"))
      .select(col("v2").as("vec_id"), col("dup_of"), col("best_cos"))
      .orderBy("vec_id")
  }

  // --- per-class mean-pool + L2-normalized centroid -------------------------
  // The embedding-pipeline pooling step (class prototypes / cluster
  // centroids / doc-from-token pooling all share this shape): element-wise
  // mean per group, then unit-normalize. Output flattened to
  // (label, pos, pooled, unit) — the driver compare can't hash arrays.
  //
  // Cross-engine float discipline: element sums are quantized to 1e-6 units
  // (exact in IEEE for |x| ≤ 1: 24-bit float mantissa × 10⁶ < 2⁵³) and
  // summed as integers — order-independent, so Spark's partial aggregation
  // and DuckDB's single-threaded sum agree bit-for-bit; the per-label norm
  // is then derived from re-quantized means (integers again) so the final
  // doubles are identical on both engines before round(…, 6).
  //
  // Scale: explode → (label, pos) groupBy is one map-side-combinable shuffle
  // of (label, pos, long); the per-label norm relation is (labels) rows —
  // broadcast back. No window, no driver collect.
  register("emb_mean_pool_norm",
    """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |px AS (SELECT label,
      |    unnest(range(1, len(v) + 1)) AS pos,
      |    unnest(list_transform(range(1, len(v) + 1),
      |      i -> CAST(round(v[i] * 1000000) AS BIGINT))) AS q
      |  FROM e),
      |mp AS (SELECT label, pos,
      |    CAST(round(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT) AS mq
      |  FROM px GROUP BY label, pos),
      |nr AS (SELECT label, sum(mq * mq) AS n2 FROM mp GROUP BY label)
      |SELECT mp.label, CAST(pos AS INT) AS pos,
      |  round(mq / 1000000.0, 6) AS pooled,
      |  round(mq / sqrt(n2), 6) AS unit
      |FROM mp JOIN nr ON mp.label = nr.label
      |ORDER BY mp.label, pos""".stripMargin) { (s, d) =>
    val qv = Tables.embeddings(s, d)
      .select(col("label"),
        transform(col("embedding"),
          x => round(x.cast(DoubleType) * 1000000).cast(LongType)).as("qv"))
    val mp = qv
      .select(col("label"), posexplode(col("qv")).as(Seq("pos0", "q")))
      .groupBy(col("label"), (col("pos0") + 1).as("pos"))
      .agg(round(sum(col("q")).cast(DoubleType) / count(lit(1))).cast(LongType).as("mq"))
    val nr = mp.groupBy(col("label")).agg(sum(col("mq") * col("mq")).as("n2"))
    mp.join(broadcast(nr), Seq("label"))
      .select(col("label"), col("pos").cast(IntegerType).as("pos"),
        round(col("mq") / 1000000.0, 6).as("pooled"),
        round(col("mq") / sqrt(col("n2")), 6).as("unit"))
      .orderBy("label", "pos")
  }

  // --- product quantization encode (the IVF-PQ memory tier) -----------------
  // 64-dim vectors → 8 subspaces × 8 dims; per subspace the code is the
  // nearest of 4 codebook centroids (seed rows vec_id < 4, the sim_ivf_assign
  // convention — k-means would refine them; the encode operator is what's
  // under test). Output: the 8-code signature + reconstruction MSE (= mean
  // of the per-subspace min distances the argmin already computed — no
  // second reconstruction pass).
  //
  // Scale: one generator explode (×8 subvector rows), one equi-join on the
  // subspace id against the BROADCAST codebook (k·m rows), then two hash
  // aggregations (argmin via min_by, then per-vector re-assembly). The
  // shuffle carries (vec_id, sub, code, d2) — never full vectors. Float
  // discipline: every distance is a fixed-order sequential fold and the
  // per-vector MSE folds the SORTED (sub, …) structs, so both engines sum
  // identical doubles in identical order.
  register("sim_pq_encode",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sub AS (SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv FROM e, range(0, 8) t(s)),
      |c AS (SELECT vec_id AS code, s, sv AS cv FROM sub WHERE vec_id < 4),
      |d AS (SELECT sub.vec_id, sub.s, c.code,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
      |      i -> (sub.sv[i] - c.cv[i]) * (sub.sv[i] - c.cv[i]))), (x, y) -> x + y) AS d2
      |  FROM sub JOIN c ON sub.s = c.s),
      |b AS (SELECT vec_id, s, code, d2 FROM d
      |      QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) = 1),
      |g AS (SELECT vec_id,
      |    list_sort(list(struct_pack(s := s, code := code, d2 := d2))) AS xs
      |  FROM b GROUP BY vec_id)
      |SELECT vec_id,
      |  array_to_string(list_transform(xs, x -> CAST(x.code AS VARCHAR)), '_') AS codes,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(xs, x -> x.d2)), (x, y) -> x + y) / 64, 6) AS recon_mse
      |FROM g ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("v"))
    val subs = e.select(col("vec_id"),
      posexplode(expr("transform(sequence(0, 7), s -> slice(v, s*8+1, 8))"))
        .as(Seq("sub", "sv")))
    val cents = subs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("code"), col("sub"), col("sv").as("cv"))
    val d2 = expr(
      """aggregate(sequence(1, 8), cast(0 as double),
        |  (acc, i) -> acc + (element_at(sv, i) - element_at(cv, i))
        |                  * (element_at(sv, i) - element_at(cv, i)))""".stripMargin)
    val best = subs.join(broadcast(cents), Seq("sub"))
      .withColumn("d2", d2)
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(struct(col("code"), col("d2")),
        struct(col("d2"), col("code"))).as("b"))
      .select(col("vec_id"), col("sub"),
        col("b.code").as("code"), col("b.d2").as("d2"))
    val sorted = array_sort(collect_list(struct(col("sub"), col("code"), col("d2"))))
    best.groupBy(col("vec_id"))
      .agg(sorted.as("xs"))
      .select(col("vec_id"),
        array_join(transform(col("xs"),
          x => x.getField("code").cast(StringType)), "_").as("codes"),
        round(aggregate(col("xs"), lit(0.0),
          (acc, x) => acc + x.getField("d2")) / 64, 6).as("recon_mse"))
      .orderBy("vec_id")
  }

  // --- IVF-PQ search with ADC scoring (the billion-scale composition) -------
  // The standard shape for billion-vector ANN (FAISS IndexIVFPQ; the
  // reference ecosystem's GPU equivalent lives in cuML/raft): coarse IVF
  // cells bound the candidate set through an EQUI-join on the cell id, and
  // scoring is asymmetric distance — 8 lookup-table reads per candidate
  // instead of 64-dim float math. Scale properties this construction keeps
  // at 100 TB: the LUT is (queries × 8 subspaces × 4 codes) and broadcast;
  // candidate traffic carries (qid, nid, code) ids only — raw vectors never
  // shuffle; per-cell candidate volume is bounded by the IVF partition.
  // Codebooks/centroids are fixed seed vectors as in sim_ivf_* / sim_pq_*
  // (k-means would converge them; the search composition is what's under
  // test). ADC sums fold in subspace order on both engines (array_sort →
  // left fold), so the rounded distances hash-match exactly.
  register("sim_ivfpq_search",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
      |asg AS (SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, c.cid,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY """.stripMargin + cosSql("e.v", "c.cv") + """ DESC, c.cid) AS rn
      |    FROM e, c) WHERE rn = 1),
      |sub AS (SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv FROM e, range(0, 8) t(s)),
      |cb AS (SELECT vec_id AS code, s, sv AS cv8 FROM sub WHERE vec_id < 4),
      |codes AS (SELECT vec_id, s, code FROM (
      |    SELECT sub.vec_id, sub.s, cb.code,
      |      row_number() OVER (PARTITION BY sub.vec_id, sub.s
      |        ORDER BY """.stripMargin + l2Sql8("sub.sv", "cb.cv8") + """, cb.code) AS rn
      |    FROM sub JOIN cb ON sub.s = cb.s) WHERE rn = 1),
      |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      |probe AS (SELECT qid, cid FROM (
      |    SELECT q.qid, c.cid,
      |      row_number() OVER (PARTITION BY q.qid
      |        ORDER BY """.stripMargin + cosSql("q.qv", "c.cv") + """ DESC, c.cid) AS rn
      |    FROM q, c) WHERE rn <= 2),
      |qsub AS (SELECT qid, s, qv[s*8+1 : s*8+8] AS qs FROM q, range(0, 8) t(s)),
      |lut AS (SELECT qid, qsub.s, code,
      |    """.stripMargin + l2Sql8("qsub.qs", "cb.cv8") + """ AS d2c
      |  FROM qsub JOIN cb ON qsub.s = cb.s),
      |cand AS (SELECT p.qid, a.vec_id AS nid FROM probe p
      |  JOIN asg a ON p.cid = a.cid AND a.vec_id <> p.qid),
      |scored AS (SELECT cd.qid, cd.nid,
      |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(list_sort(list(struct_pack(s := l.s, d := l.d2c))),
      |        x -> x.d)), (x, y) -> x + y), 6) AS adc
      |  FROM cand cd
      |  JOIN codes k ON k.vec_id = cd.nid
      |  JOIN lut l ON l.qid = cd.qid AND l.s = k.s AND l.code = k.code
      |  GROUP BY cd.qid, cd.nid)
      |SELECT qid, nid, adc FROM scored
      |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adc, nid) <= 3
      |ORDER BY qid, adc, nid""".stripMargin) { (s, d) =>
    val e = vecs(s, d).select(col("vec_id"), col("v"))
    val c = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // IVF cell assignment (one cell per vector; N×4 broadcast crossjoin is
    // the documented centroid-assignment exemption)
    val wAsg = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cid"))
    val asg = e.crossJoin(broadcast(c))
      .withColumn("cos_c", cosine(col("v"), col("cv")))
      .withColumn("rn", row_number().over(wAsg))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
    // PQ codebooks: 8 subspaces × 8 dims, 4 codes per subspace
    val subs = e.select(col("vec_id"),
      posexplode(expr("transform(sequence(0, 7), s -> slice(v, s*8+1, 8))"))
        .as(Seq("s", "sv")))
    val cb = subs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("code"), col("s"), col("sv").as("cv8"))
    val l2 = expr(
      """aggregate(sequence(1, 8), cast(0 as double),
        |  (acc, i) -> acc + (element_at(sv, i) - element_at(cv8, i))
        |                  * (element_at(sv, i) - element_at(cv8, i)))""".stripMargin)
    // PQ-encode every db vector: nearest codebook entry per (vec, subspace)
    val codes = subs.join(broadcast(cb), Seq("s"))
      .withColumn("d2", l2)
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
    // queries probe their nprobe=2 nearest cells
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cos_q").desc, col("cid"))
    val probe = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(c))
      .withColumn("cos_q", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("qid"), col("cid"))
    // ADC lookup table: ‖q_s − codebook(s, code)‖² per (query, s, code) —
    // queries × 8 × 4 rows, broadcast to the candidate scoring join
    val qsubs = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        posexplode(expr("transform(sequence(0, 7), s -> slice(v, s*8+1, 8))"))
          .as(Seq("s", "sv")))
    val lut = qsubs.join(broadcast(cb), Seq("s"))
      .withColumn("d2c", l2)
      .select(col("qid"), col("s"), col("code"), col("d2c"))
    // candidates come ONLY from probed cells (equi-join on cid)
    val cand = probe.join(asg, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"))
    // score = Σ_s LUT[qid][s][code(nid, s)], folded in subspace order
    val wTop = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nid"))
    cand.join(codes, codes("vec_id") === cand("nid"))
      .select(col("qid"), col("nid"), col("s"), col("code"))
      .join(broadcast(lut), Seq("qid", "s", "code"))
      .groupBy(col("qid"), col("nid"))
      .agg(array_sort(collect_list(struct(col("s"), col("d2c")))).as("xs"))
      .select(col("qid"), col("nid"),
        round(aggregate(col("xs"), lit(0.0),
          (acc, x) => acc + x.getField("d2c")), 6).as("adc"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("nid"), col("adc"))
      .orderBy(col("qid"), col("adc"), col("nid"))
  }
}
