package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{FeatherPartitions, FeatherSnapshots}

/** Predicate DELETE and UPDATE on snapshotted tables — the other two
  * statements of the SQL DML triad beside MERGE (reference analog: the
  * reference deletes/updates by boolean mask over an in-memory frame,
  * python/cudf/cudf/core/dataframe.py `__setitem__` with a boolean
  * indexer and `drop`; a distributed table needs the predicate pushed
  * into candidate pruning instead):
  *
  *  - [[deleteWhere]]: drop every row the predicate selects (NULL
  *    keeps, SQL semantics), copy-on-write.
  *  - [[deleteWhereDV]]: same rows masked via [[DeletionVectors]]
  *    sidecars — bytes ∝ deleted rows (the takedown shape).
  *  - [[updateWhere]]: SET expressions applied to selected rows,
  *    copy-on-write; on a hive-partitioned table a SET on a partition
  *    column MOVES the row (delete-here + insert-there, one commit).
  *
  * Candidate pruning is two-tier and conservative (pruning is an
  * optimization, never a correctness input): the predicate's
  * translatable conjuncts prune whole LEAVES through the partition
  * values ([[FeatherPartitions.survives]]) and whole FILES through the
  * stats sidecars ([[FeatherStats.batchProvablyEmpty]] over every row
  * group); an untranslatable predicate just makes every file a
  * candidate. A limit-1 exact probe then degrades a no-match statement
  * to a TRUE no-op (no version published — the foreachBatch replay
  * contract every mutation here carries), exactly the
  * [[ConditionalMerge]] degrade rule.
  *
  * Everything else is the mutation tier's shared machinery: one atomic
  * manifest commit under the conflict matrix, run-unique part prefixes,
  * per-leaf schema stamps when every row drops, partition values riding
  * the working frame as typed columns. */
object PredicateMutations {
  import FeatherMutations.Result

  /** Cap on DV positions a predicate delete may collect to the driver
    * (10M positions ≈ 80 MB of longs — comfortable; a delete past it
    * belongs to the COW path anyway). Session conf, overridable per
    * workload. */
  val MaxDvPositionsKey = "spark.graft.dv.maxDeletePositions"
  val MaxDvPositionsDefault: Long = 10000000L

  def deleteWhere(spark: SparkSession, path: String, cond: Column,
                  codec: String = "lz4"): Result =
    run(spark, path, Some(cond), set0 = None, dvMask = false, codec)

  def deleteWhereDV(spark: SparkSession, path: String,
                    cond: Column): Result =
    run(spark, path, Some(cond), set0 = None, dvMask = true, "lz4")

  def updateWhere(spark: SparkSession, path: String,
                  set: Map[String, Column], cond: Option[Column] = None,
                  codec: String = "lz4"): Result = {
    require(set.nonEmpty, "updateWhere: empty SET")
    run(spark, path, cond, Some(set), dvMask = false, codec)
  }

  private def run(spark: SparkSession, path: String,
                  condRaw: Option[Column],
                  set0: Option[Map[String, Column]], dvMask: Boolean,
                  codec: String): Result = {
    val op = if (set0.isDefined) "update" else "delete"
    require(!dvMask || set0.isEmpty,
      "updateWhere has no merge-on-read strategy — an update rewrites " +
        "rows; use MERGE (mergeDV / MERGE INTO graft_dv.`..`) for " +
        "mask-and-reinsert semantics")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(FeatherSnapshots.enabled(fs, root),
      s"$op on $path, which has no ${FeatherSnapshots.Dir} directory — " +
        "row-level mutation is a manifest operation; write the table " +
        "with option(\"snapshots\", \"true\") first")
    val snap = FeatherSnapshots.resolve(fs, root, None).getOrElse(
      sys.error(s"$op on $path: no snapshot versions"))
    val face = ConnectorFace.detect(snap.files, op, path)
    val chains = snap.files.map { case (rel, _) => FeatherMutations.relDirOf(rel) }
      .distinct.filter(_.nonEmpty)
    val (hiveChains, partCols) = FeatherPartitions.hiveLayout(chains)
    require(chains.isEmpty || hiveChains || set0.isEmpty,
      s"$op on $path: table has non-hive subdirectories " +
        s"(${chains.mkString(", ")}) — update routes rewritten rows by " +
        "partition values and needs a hive key=value layout")
    val partitioned = partCols.nonEmpty
    val absFiles = snap.files.map { case (rel, len) =>
      (new Path(root, rel).toString, len) }
    val tableSchema = face.mergedSchema(spark, absFiles)
    val discovered =
      if (!partitioned) None
      else Some(FeatherSnapshots.toDiscovered(root, snap))
    val partSchema: StructType =
      discovered.map(_.partSchema).getOrElse(new StructType())
    val fullSchema = StructType(tableSchema.fields ++ partSchema.fields)
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    FeatherMutations.requireNotEmbedded(op, partCols, tableSchema,
      caseSensitive)
    // WALL-CLOCK PINNED ONCE per statement, in the CONDITION and the
    // SET values (the shared FeatherMutations.pinClock — the pruning
    // fold, the limit-1 probe, and the rewrite/position scan each run
    // as separate Spark queries; pruning must never be a correctness
    // input).
    val nowInstant = java.time.Instant.now()
    val pinClock: Column => Column = FeatherMutations.pinClock(spark,
      fullSchema.fieldNames.toSeq, nowInstant)
    val cond0: Option[Column] = condRaw.map(pinClock)
    val set: Map[String, Column] = FeatherMutations.canonicalSet(
      fullSchema, caseSensitive, set0.getOrElse(Map.empty), s"$op: SET")
      .map { case (k, v) => k -> pinClock(v) }
    set.keys.foreach(c => require(fullSchema.fieldNames.contains(c),
      s"$op: SET names column '$c', not in the table schema " +
        s"(${fullSchema.fieldNames.mkString(", ")})"))

    def emptyFrame = spark.createDataFrame(
      new java.util.ArrayList[Row](), fullSchema)

    // ---- expression validation (analysis only, zero jobs) -----------------
    // same lossless-or-exact rule as the clause merge: a silently lossy
    // SET cast would corrupt rows (or die per-row mid-write under ANSI)
    {
      def exprType(c: Column): DataType =
        emptyFrame.select(c).schema.head.dataType
      // nondeterministic expressions are REFUSED (Delta's rule, for the
      // same reason): the statement evaluates them in separate Spark
      // jobs — pruning, the limit-1 probe, the rewrite/position scan,
      // and routePartitionedInserts' distinct() + per-leaf scans (where
      // persist is best-effort under eviction/task retry) — so rand()
      // in a WHERE or SET could silently duplicate or lose rows. The
      // clock functions are already pinned to per-statement literals
      // above, so they pass; determinism is checked on the RESOLVED
      // tree (an UnresolvedFunction reports deterministic=true).
      def requireDeterministic(what: String, c: Column): Unit =
        require(emptyFrame.select(c).queryExecution.analyzed.expressions
            .forall(_.deterministic),
          s"$op: $what is nondeterministic — the statement evaluates " +
            "expressions in several separate Spark jobs (pruning, probe, " +
            "rewrite, partitioned routing), so a nondeterministic " +
            "expression can silently duplicate or lose rows; make it " +
            "deterministic (clock functions are pinned per statement " +
            "automatically)")
      cond0.foreach { c =>
        val dt = exprType(c)
        require(dt == BooleanType,
          s"$op: WHERE predicate is ${dt.catalogString}, not boolean")
        requireDeterministic("the WHERE predicate", c)
      }
      set.foreach { case (n, e) =>
        val target = fullSchema(n).dataType
        val actual = exprType(e)
        require(actual == target ||
            org.apache.spark.sql.catalyst.expressions.Cast
              .canUpCast(actual, target),
          s"$op: SET of column '$n' (${target.catalogString}) from a " +
            s"${actual.catalogString} expression — only exact types and " +
            "lossless upcasts are applied; cast the expression " +
            "explicitly if the narrowing is intended")
        requireDeterministic(s"the SET of column '$n'", e)
      }
    }

    // ---- candidate pruning --------------------------------------------------
    // translatable conjuncts of the RESOLVED predicate; anything the
    // translator cannot express just doesn't prune
    val condFilters: Seq[org.apache.spark.sql.sources.Filter] =
      cond0.toSeq.flatMap { c =>
        val analyzed = emptyFrame.where(c).queryExecution.analyzed
        val resolved = analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }
        def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
            : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
          e match {
            case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
              conjuncts(l) ++ conjuncts(r)
            case other => Seq(other)
          }
        // fold foldable subtrees first: analysis leaves `id > CAST(350
        // AS bigint)` unfolded (the optimizer would fold it, but
        // optimizing over the empty shape relation would erase the
        // whole Filter), and the translator only recognizes bare
        // literals
        def fold(e: org.apache.spark.sql.catalyst.expressions.Expression) =
          e.transformUp {
            case x if x.foldable &&
                !x.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] =>
              org.apache.spark.sql.catalyst.expressions.Literal
                .create(x.eval(null), x.dataType)
          }
        resolved.toSeq.flatMap(conjuncts).map(fold).flatMap(e =>
          org.apache.spark.sql.graft.Bridge.translateFilter(e))
      }
    val leafByAbs: Map[String, FeatherPartitions.LeafFile] =
      discovered.map(_.files.map(lf => lf.file -> lf).toMap)
        .getOrElse(Map.empty)
    // stats load whenever pruning can use them OR the DV branch needs
    // exact row counts (bindDvs drops a fully-masked file only when it
    // can PROVE full coverage — an untranslatable predicate must not
    // silently lose that, the keyed deleteByKeyDV's behavior)
    val statsByFile
        : Map[String, Option[Seq[Map[String, FeatherStats.ColStat]]]] =
      if (condFilters.isEmpty && !dvMask) Map.empty
      else FeatherStats.loadForFiles(conf, absFiles)
    val candidateIdx: Seq[Int] = absFiles.indices.filter { i =>
      val (abs, _) = absFiles(i)
      val leafOk = condFilters.isEmpty ||
        leafByAbs.get(abs).forall(
          FeatherPartitions.survives(_, partSchema, condFilters))
      val statsOk = condFilters.isEmpty ||
        (statsByFile.getOrElse(abs, None) match {
          case Some(batches) if batches.nonEmpty =>
            !batches.forall(
              FeatherStats.batchProvablyEmpty(_, condFilters))
          case _ => true
        })
      leafOk && statsOk
    }
    val candidateAbs = candidateIdx.map(absFiles)
    val dvPathsAll = snap.dvs.map { case (rel, (dvRel, _)) =>
      new Path(root, rel).toString -> new Path(root, dvRel).toString }
    val valuesByAbs: Map[String, Seq[(String, String)]] =
      discovered.map(_.files.map(lf => lf.file -> lf.values).toMap)
        .getOrElse(Map.empty)
    val targetV = snap.version + 1
    val prefix = FeatherSnapshots.runPrefix(targetV)
    def noOp = Result(snap.version, 0, snap.files.size, 0)
    if (candidateAbs.isEmpty) return noOp
    val condCol: Column = cond0.getOrElse(lit(true))
    val fire: Column = coalesce(condCol, lit(false))

    if (dvMask) {
      // ---- merge-on-read delete: mask matching positions ------------------
      val positions = predicatePositionScan(spark, face, root, snap,
        absFiles, candidateIdx, condCol, tableSchema, partSchema,
        valuesByAbs)
      if (positions.isEmpty) return noOp
      def fileRowCount(fid: Int): Option[Long] =
        statsByFile.getOrElse(absFiles(fid)._1, None)
          .flatMap(FeatherMutations.exactRows)
      val (bindings, droppedRel) = FeatherMutations.bindDvs(fs, conf,
        root, snap, targetV, positions, fileRowCount)
      val added = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      if (droppedRel.nonEmpty &&
          snap.files.forall { case (rel, _) => droppedRel(rel) })
        added ++= FeatherMutations.stampLeaves(face, fs, root,
          snap.files.map(_._1), prefix, tableSchema)
      val committed = FeatherSnapshots.commitMutation(fs, root, op, snap,
        droppedRel, added.toSeq, setDvs = bindings)
      val touched = bindings.size + droppedRel.size
      // partsWritten = DV sidecars written, exactly deleteByKeyDV's
      // accounting (stamps excluded there too) — the two spellings of
      // one takedown must report identically
      return Result(committed, touched, snap.files.size - touched,
        bindings.size)
    }

    // ---- copy-on-write ------------------------------------------------------
    val (cand, ownCand) = ConnectorFace.pinIfUncached(
      FeatherMutations.readWithPartValues(spark, face, candidateAbs,
        dvPathsAll, tableSchema, partSchema, valuesByAbs))
    try {
      // exact limit-1 probe: a statement matching nothing publishes no
      // version (replay-clean), even when stats could not refute it
      val anyMatch = cand.where(fire).limit(1).count() > 0
      if (!anyMatch) return noOp
      val out: DataFrame = set0 match {
        case None => cand.where(!fire)
        case Some(_) =>
          cand.select(fullSchema.fields.map { f =>
            (if (set.contains(f.name))
               when(fire, set(f.name)).otherwise(col(f.name))
             else col(f.name)).cast(f.dataType).as(f.name)
          }.toSeq: _*)
      }
      val added = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      if (partitioned) {
        val candPerLeaf: Map[String, Int] = candidateIdx
          .map(i => FeatherMutations.relDirOf(snap.files(i)._1))
          .groupBy(identity).map { case (k, v) => k -> v.size }
        added ++= FeatherMutations.routePartitionedInserts(op, face, fs,
          root, out, partCols, tableSchema, prefix, codec,
          partsFor = relDir => candPerLeaf.getOrElse(relDir, 1))
      } else {
        val parts = face.writeParts(
          out.coalesce(math.max(1, candidateAbs.size)), root.toString,
          prefix, codec)
        if (parts.nonEmpty)
          FeatherStats.upsertMerged(fs, root,
            parts.map { case (name, len, js) =>
              name -> (len, FeatherStats.fromJson(js)) }.toMap)
        added ++= parts.map { case (name, len, _) => (name, len) }
      }
      val removeRel: Set[String] = candidateIdx.map(i => snap.files(i)._1)
        .toSet
      if (added.isEmpty &&
          snap.files.forall { case (rel, _) => removeRel(rel) })
        added ++= FeatherMutations.stampLeaves(face, fs, root,
          snap.files.map(_._1), prefix, tableSchema)
      val committed = FeatherSnapshots.commitMutation(fs, root, op, snap,
        removeRel, added.toSeq)
      Result(committed, candidateIdx.size,
        snap.files.size - candidateIdx.size, added.size)
    } finally {
      if (ownCand) cand.unpersist(blocking = false): Unit
    }
  }

  /** Distributed position scan for a PREDICATE (the key-join scan's
    * sibling, [[FeatherMutations.dvPositionScan]]): one task per
    * candidate file reads the predicate's DATA columns with row
    * positions (existing DV applied), partition values join in from a
    * file-count-sized broadcast frame, and the filter leaves exactly the
    * matching (file, position) pairs — deleted-row-count-sized by
    * design (a retention predicate that selects most of the table is
    * [[deleteWhere]]'s job, where the rewrite pays for itself). */
  private def predicatePositionScan(spark: SparkSession,
                                    face: ConnectorFace, root: Path,
                                    snap: FeatherSnapshots.Snapshot,
                                    absFiles: Seq[(String, Long)],
                                    candidateIdx: Seq[Int],
                                    condCol: Column,
                                    tableSchema: StructType,
                                    partSchema: StructType,
                                    valuesByAbs: Map[String, Seq[(String, String)]])
      : Map[Int, Array[Long]] = {
    if (candidateIdx.isEmpty) return Map.empty
    // data columns the predicate references (resolved against the full
    // shape); partition references ride the per-file values frame
    val shape = spark.createDataFrame(new java.util.ArrayList[Row](),
      StructType(tableSchema.fields ++ partSchema.fields))
    val refs: Set[String] = shape.where(condCol).queryExecution.analyzed
      .collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.references.map(_.name).toSet
      }.getOrElse(Set.empty)
    val dataCols = tableSchema.fieldNames.filter(refs.contains).toSeq
    val scan = FeatherMutations.positionScanFrame(spark, face, root, snap,
      absFiles, candidateIdx, dataCols, tableSchema)
    // per-file partition values (file-count-sized; broadcast-cheap)
    val withParts =
      if (partSchema.isEmpty) scan
      else {
        val fidSchema = StructType(
          StructField("__fid", IntegerType, nullable = false) +:
            partSchema.fields.map(f => StructField(f.name, StringType)))
        val fidRows = candidateIdx.map { i =>
          val values = valuesByAbs.getOrElse(absFiles(i)._1, Nil).toMap
          Row.fromSeq(i +: partSchema.fieldNames.toSeq
            .map(c => values.getOrElse(c, null)))
        }
        import scala.jdk.CollectionConverters._
        val typed = partSchema.fields.foldLeft(
          spark.createDataFrame(fidRows.asJava, fidSchema)) {
            case (df, f) => df.withColumn(f.name,
              col(f.name).cast(f.dataType))
          }
        scan.join(broadcast(typed), "__fid")
      }
    val matching = withParts.where(coalesce(condCol, lit(false)))
    // DRIVER-COLLECT GUARD: the masked positions collect to the driver
    // (that is the DV design — bytes ∝ deleted rows), so a mis-aimed
    // predicate that selects half a 100-TB table must refuse BEFORE the
    // collect, not OOM the driver. One count over the same pruned scan
    // decides; the threshold is a session conf. The extra scan is
    // takedown-cheap: candidates are already pruned to the predicate's
    // leaves/files, and a delete large enough for the count to hurt is
    // past the threshold anyway.
    val maxPos = spark.conf.get(MaxDvPositionsKey,
      MaxDvPositionsDefault.toString).toLong
    val selected = matching.count()
    require(selected <= maxPos,
      s"deleteWhereDV on $root: this predicate selects $selected rows, " +
        s"above the $maxPos-position driver-collect cap " +
        s"($MaxDvPositionsKey) — use deleteWhere (copy-on-write), where " +
        "a delete this large pays for its rewrite")
    FeatherMutations.collectPositions(matching)
  }
}
