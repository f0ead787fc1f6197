package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.sources.FeatherSnapshots

/** OPTIMIZE-style re-clustering of a snapshotted feather OR avro table
  * (face auto-detected from the manifest's part suffixes): rewrite
  * every live file range-clustered AND batch-sorted on chosen columns,
  * swapped in as ONE "cluster" manifest commit.
  *
  * Why it exists: a table built by streaming ingest (or any hash-
  * partitioned write) has arrival-ordered files whose key ranges all span
  * the whole domain — the skipping index prunes nothing, and every
  * key-banded mutation ([[FeatherMutations]]) or filtered read touches
  * every file. Re-clustering is the standing fix (Delta OPTIMIZE ZORDER
  * BY, Iceberg rewrite with sort orders): after it, a key band maps to
  * few files, and within each file the 4096-row record batches are
  * sorted, so the per-BATCH stats prune too — the two levels compound.
  *
  * Mechanics reuse the mutation machinery: per hive leaf, read the
  * manifest's live files, `repartitionByRange` on the cluster columns
  * into ceil(leafBytes / targetBytes) parts, `sortWithinPartitions`,
  * write under a version-derived `clust-v…` prefix, publish one snapshot
  * that swaps the leaf's inputs for the outputs. Nothing is physically
  * deleted (retained versions keep reading; expire() reclaims), a
  * crashed run's orphans are reclaimed by the next run's prefix
  * pre-clean, and the commit detects a raced parent loudly — the same
  * single-mutator contract as compaction and mutations.
  *
  * Multi-column [[cluster]] is lexicographic range partitioning (the
  * leading column dominates); [[clusterZOrder]] is the genuinely
  * multi-dimensional form (Delta OPTIMIZE ZORDER BY): each dimension
  * min-max normalizes to `bitsPerDim` bits against its GLOBAL range
  * (one aggregation pass), the bits interleave into a Z-value, and the
  * table re-clusters on that derived key — after the rewrite, band
  * filters and key-banded mutations on ANY of the dimensions prune
  * files, because a file's Z-range bounds its per-dimension bounding
  * box.
  */
object FeatherCluster {

  final case class Result(version: Long, filesBefore: Int, filesAfter: Int)

  /** `bloomFor` rebuilds the point-lookup Bloom sidecars
    * ([[FeatherBloom]]) over the NEW parts after the commit — the natural
    * pairing, since re-clustering retires every old part and with it
    * every old bloom. */
  def cluster(spark: SparkSession, path: String, cols: Seq[String],
              targetBytes: Long = 128L << 20,
              codec: String = "lz4",
              bloomFor: Option[String] = None,
              incremental: Boolean = false): Result =
    clusterImpl(spark, path, cols, targetBytes, codec, bloomFor,
      zorderBits = 0, incremental = incremental)

  /** OPTIMIZE ZORDER BY over numeric, DATE, TIMESTAMP, or STRING
    * dimensions — see the object scaladoc. Dates map by day number and
    * timestamps by epoch micros (monotonic, calendar-local); strings
    * rank against a sampled boundary table before the bit interleave.
    * `bitsPerDim` trades per-dimension resolution against the dimension
    * count (bitsPerDim × dims ≤ 62); nulls sort first (z = 0 in that
    * dimension). */
  def clusterZOrder(spark: SparkSession, path: String, cols: Seq[String],
                    bitsPerDim: Int = 12,
                    targetBytes: Long = 128L << 20,
                    codec: String = "lz4",
                    bloomFor: Option[String] = None,
                    incremental: Boolean = false): Result = {
    require(cols.size >= 2,
      "clusterZOrder: need >= 2 dimensions (cluster() serves 1)")
    require(bitsPerDim >= 1 && bitsPerDim * cols.size <= 62,
      s"clusterZOrder: bitsPerDim=$bitsPerDim x ${cols.size} dims must " +
        "fit 62 bits")
    clusterImpl(spark, path, cols, targetBytes, codec, bloomFor,
      zorderBits = bitsPerDim, incremental = incremental)
  }

  private def clusterImpl(spark: SparkSession, path: String,
                          cols: Seq[String], targetBytes: Long,
                          codec: String, bloomFor: Option[String],
                          zorderBits: Int,
                          incremental: Boolean = false): Result = {
    require(cols.nonEmpty, "cluster: cols must be non-empty")
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(FeatherSnapshots.enabled(fs, root),
      s"cluster on $path, which has no ${FeatherSnapshots.Dir} directory — " +
        "re-clustering is a manifest operation; write the table with " +
        "option(\"snapshots\", \"true\") first")
    val snap = FeatherSnapshots.resolve(fs, root, None).getOrElse(
      sys.error(s"cluster on $path: snapshot directory holds no versions"))
    val face = ConnectorFace.detect(snap.files, "cluster", path)
    // the CLUSTERING-SPEC tag rides every output name: incremental runs
    // recognize "already clustered" only for files written under the
    // SAME (cols, zorderBits) — a call that changes the cluster key must
    // re-sweep files clustered by the old key, or the caller would
    // believe the table is now keyed by `a` while the files stay banded
    // by `b` with no error. Manifests carry no metadata fields; the name
    // tag is the durable record.
    val keyTag = f"k${java.util.UUID.nameUUIDFromBytes(
      (cols.mkString(",") + ":" + zorderBits).getBytes("UTF-8"))
      .toString.take(8)}"
    // run-unique: see FeatherMutations — racing clusterers must never
    // pre-clean each other's uncommitted parts
    val prefix = f"clust-v${snap.version + 1}%08d-$keyTag-${java.util.UUID
      .randomUUID().toString.take(8)}"
    // INCREMENTAL mode: only files appended/mutated SINCE the last
    // cluster commit rewrite; that commit's still-live outputs carry
    // through untouched (bindings included). This keeps a continuously
    // ingesting table's OPTIMIZE cost ∝ new data instead of ∝ table
    // size; each incremental run adds one clustered GENERATION, so
    // band-prune overlap depth ≤ generation count — a periodic FULL run
    // folds the generations back to one. A head whose every file is
    // already clustered is a true no-op (no commit — an empty "cluster"
    // version would churn streams and caches for nothing). The lookup
    // walks versions DESCENDING with header-only reads — O(versions
    // since the last cluster), not O(retained history).
    val keepFiles: Seq[(String, Long)] =
      if (!incremental) Nil
      else FeatherSnapshots.latestVersionWithOp(fs, root, "cluster") match {
        case None => Nil // never clustered: incremental = full
        case Some(last) =>
          val lastSet = last.files.toSet
          // only files the cluster runs actually WROTE — under THIS
          // call's clustering spec — count as clustered: a blind append
          // that raced the last cluster's commit rides its manifest
          // un-clustered ("the next OPTIMIZE sweeps them in" is this
          // run's contract), and files tagged with another spec (or the
          // pre-tag era's) re-sweep
          snap.files.filter { f =>
            lastSet(f) && {
              val name = f._1.substring(f._1.lastIndexOf('/') + 1)
              name.startsWith("clust-") && name.contains(s"-$keyTag-")
            }
          }
      }
    val keepSet = keepFiles.map(_._1).toSet
    val rewriteFiles = snap.files.filterNot { case (rel, _) => keepSet(rel) }
    if (incremental && rewriteFiles.isEmpty) {
      // the no-op cycle still validates the cluster columns (via the
      // CACHED head schema — no footer sweep per idle run): a typo'd
      // column must fail on the first scheduled run, not silently
      // report success until data arrives
      val head = FeatherChanges.headDataSchema(spark, path)
      cols.foreach(c => require(head.fieldNames.contains(c),
        s"cluster: column '$c' not in table schema " +
          s"(${head.fieldNames.mkString(", ")})"))
      // no commit — but a REQUESTED bloom must still build (it covers
      // files lacking sidecars idempotently); skipping it here would
      // leave the caller believing point-lookup pruning is active
      bloomFor.foreach(FeatherBloom.build(spark, path, _, face.suffix): Unit)
      return Result(snap.version, snap.files.size, snap.files.size)
    }
    // deletion vectors FOLD into the rewrite: every read below applies
    // the bindings, so the re-clustered parts hold only live rows and
    // carry no bindings forward (a carried-through clustered file keeps
    // its binding — the next full run folds it)
    def dvPathsFor(files: Seq[(String, Long)]): Map[String, String] =
      files.flatMap { case (rel, _) =>
        snap.dvs.get(rel).map { case (dvRel, _) =>
          new Path(root, rel).toString -> new Path(root, dvRel).toString }
      }.toMap

    val byLeaf = rewriteFiles.groupBy { case (rel, _) =>
      val i = rel.lastIndexOf('/')
      if (i < 0) "" else rel.substring(0, i)
    }.toSeq.sortBy(_._1)

    // the HEAD union schema, once: cluster columns validate against the
    // TABLE (not whichever generation a leaf/rewrite set happens to
    // hold), and every rewrite read aligns to it
    val unionSchema = face.mergedSchema(spark,
      snap.files.map { case (rel, len) =>
        (new Path(root, rel).toString, len) })
    cols.foreach(c => require(unionSchema.fieldNames.contains(c),
      s"cluster: column '$c' not in table schema " +
        s"(${unionSchema.fieldNames.mkString(", ")})"))

    // z-order dimension mapping: every dimension becomes a LONG in
    // [0, 2^bitsPerDim). Numeric/date/timestamp dims min-max normalize
    // against one GLOBAL aggregation pass (per-leaf ranges would give
    // each leaf its own incompatible z-space); STRING dims rank against
    // a sampled boundary table (the range-partitioner idea: a fixed-size
    // uniform sample's quantiles ARE the value distribution's quantiles,
    // so rank-by-binary-search spreads skewed string domains evenly
    // where a hash would destroy locality and a lexicographic min-max
    // over code points would collapse long shared prefixes to one
    // bucket). Nulls map to 0 in their dimension (cluster first).
    val zDims: Option[Seq[org.apache.spark.sql.Column]] =
      if (zorderBits == 0) None
      else {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types._
        // incremental: normalization ranges derive from the REWRITE set
        // alone (each generation gets a self-consistent z-space; pruning
        // is exact either way — it reads per-file RAW-column stats, the
        // z-key only drives colocation)
        val all = ConnectorFace.align(face.readMergedDv(spark,
          rewriteFiles.map { case (rel, len) =>
            (new Path(root, rel).toString, len) }, dvPathsFor(rewriteFiles)),
          unionSchema)
        val maxVal = (1L << zorderBits) - 1
        // Left(doubleExpr) = numeric-ish; Right(()) = string-ranked
        val kinds: Seq[Either[org.apache.spark.sql.Column, Unit]] =
          cols.map { c =>
            all.schema(c).dataType match {
              case _: NumericType => Left(col(c).cast("double"))
              // day number / epoch micros: any monotonic map works for
              // clustering; these keep calendar locality (and avoid the
              // ANSI-forbidden date→int cast)
              case DateType => Left(unix_date(col(c)).cast("double"))
              case TimestampType => Left(unix_micros(col(c)).cast("double"))
              case TimestampNTZType =>
                Left(unix_micros(col(c).cast(TimestampType)).cast("double"))
              case StringType => Right(())
              case other => throw new IllegalArgumentException(
                s"clusterZOrder: '$c' must be numeric, date, timestamp " +
                  s"or string, got ${other.catalogString}")
            }
          }
        val numIdx = kinds.zipWithIndex.collect { case (Left(e), i) => (e, i) }
        val rangeOf: Map[Int, (Double, Double)] =
          if (numIdx.isEmpty) Map.empty
          else {
            val aggs = numIdx.flatMap { case (e, _) => Seq(min(e), max(e)) }
            val row = all.agg(aggs.head, aggs.tail: _*).head()
            numIdx.zipWithIndex.map { case ((_, i), j) =>
              i -> (
                (if (row.isNullAt(2 * j)) 0.0 else row.getDouble(2 * j)),
                (if (row.isNullAt(2 * j + 1)) 0.0
                 else row.getDouble(2 * j + 1)))
            }.toMap
          }
        // one bounded sample pass per string dim; boundaries sort in
        // UTF-8 byte order — the ordering BoundBucket's binary search
        // applies, which is also how the stats sidecars compare strings
        val strBounds: Map[Int, Array[Any]] = kinds.zipWithIndex.collect {
          case (Right(_), i) =>
            val c = cols(i)
            val sample = all.select(col(c).cast("string"))
              .where(col(c).isNotNull)
              .rdd.map(_.getString(0))
              .takeSample(withReplacement = false, 8192, seed = 42)
            val ord = Ordering.fromLessThan[String](FeatherStats.utf8Lt)
            val distinct = sample.distinct.sorted(ord)
            val want = math.max(1, math.min(distinct.length, maxVal.toInt))
            val bounds: Array[Any] =
              if (distinct.isEmpty) Array[Any](
                org.apache.spark.unsafe.types.UTF8String.fromString(""))
              else (0 until want)
                .map(k => distinct((k.toLong * distinct.length / want).toInt))
                .distinct
                .map(v => org.apache.spark.unsafe.types.UTF8String
                  .fromString(v): Any)
                .toArray
            i -> bounds
        }.toMap
        Some(cols.indices.map { i =>
          kinds(i) match {
            case Left(e) =>
              val (lo, hi) = rangeOf(i)
              if (hi <= lo) lit(0L)
              else least(lit(maxVal), greatest(lit(0L),
                ((coalesce(e, lit(lo)) - lit(lo)) *
                  lit(maxVal / (hi - lo))).cast("long")))
            case Right(_) =>
              import org.apache.spark.sql.graft.Bridge
              val rank = Bridge.column(graft.expressions.BoundBucket(
                strBounds(i), Bridge.expression(col(cols(i)))))
              least(lit(maxVal), greatest(lit(0L),
                coalesce((rank + 1).cast("long"), lit(0L))))
          }
        })
      }

    /** The interleaved Z-value over pre-normalized [0, 2^bits) dims. */
    def zExpr(dims: Seq[org.apache.spark.sql.Column])
        : org.apache.spark.sql.Column = {
      import org.apache.spark.sql.functions._
      (0 until zorderBits).flatMap { b =>
        dims.zipWithIndex.map { case (d, i) =>
          shiftleft(shiftright(d, b).bitwiseAND(lit(1L)),
            b * cols.size + i)
        }
      }.reduce(_ + _)
    }

    val added = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    byLeaf.foreach { case (relDir, leafFiles) =>
      val leafDir = if (relDir.isEmpty) root else new Path(root, relDir)
      val leafBytes = leafFiles.map(_._2).sum
      val nParts = math.max(1,
        math.ceil(leafBytes.toDouble / targetBytes).toInt)
      // aligned to the HEAD union schema: a leaf (or an incremental
      // rewrite set) consisting only of narrowing-append files would
      // otherwise lack an evolved cluster column and fail a false
      // "not in table schema" — the missing values cluster as null,
      // exactly what a merged read serves
      val df = ConnectorFace.align(face.readMergedDv(spark,
        leafFiles.map { case (rel, len) => (new Path(root, rel).toString, len) },
        dvPathsFor(leafFiles)), unionSchema)
      val clustered = zDims match {
        case Some(dims) =>
          df.withColumn("__zkey", zExpr(dims))
            .repartitionByRange(nParts, col("__zkey"))
            .sortWithinPartitions(col("__zkey"))
            .drop("__zkey")
        case None =>
          df.repartitionByRange(nParts, cols.map(col): _*)
            .sortWithinPartitions(cols.map(col): _*)
      }
      val parts = face.writeParts(
        clustered, leafDir.toString, prefix, codec)
      if (parts.nonEmpty)
        FeatherStats.upsertMerged(fs, leafDir,
          parts.map { case (name, len, js) =>
            name -> (len, FeatherStats.fromJson(js)) }.toMap)
      added ++= parts.map { case (name, len, _) =>
        (if (relDir.isEmpty) name else s"$relDir/$name", len) }
    }

    // a zero-row rewrite set with nothing carried (e.g. post delete-all,
    // only schema-only stamps) yields no parts — stamp per leaf rather
    // than commit an EMPTY manifest that would make every later read
    // fail at discovery (an incremental run with clustered survivors
    // needs no stamp: the survivors keep the table readable)
    if (added.isEmpty && keepFiles.isEmpty) {
      byLeaf.foreach { case (relDir, _) =>
        val leafDir = if (relDir.isEmpty) root else new Path(root, relDir)
        val (name, len) = face.stamp(fs, leafDir, prefix, unionSchema)
        added += ((if (relDir.isEmpty) name else s"$relDir/$name", len))
      }
    }

    val gone = rewriteFiles.map(_._1).toSet
    // conflict matrix (FeatherSnapshots.commitMutation): concurrent
    // appends commute (their files carry through un-clustered — the next
    // OPTIMIZE sweeps them in); a concurrent mutation touching any
    // rewrite INPUT aborts loudly, while one disjoint from them (a
    // delete on a partition this incremental pass is not re-clustering)
    // commits beside — the rewrite read nothing else
    val committed = FeatherSnapshots.commitMutation(fs, root, "cluster",
      snap, gone, added.toSeq, readRel = Some(gone))
    bloomFor.foreach(FeatherBloom.build(spark, path, _, face.suffix): Unit)
    Result(committed, snap.files.size,
      snap.files.size - gone.size + added.size)
  }
}
