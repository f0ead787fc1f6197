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

  private type Resolved = FeatherMutations.Resolved
  private val Resolved = FeatherMutations.Resolved
  private def resolveTable(spark: SparkSession, path: String, op: String,
                           requireHive: Boolean): Resolved =
    FeatherMutations.resolveTable(spark, path, op, requireHive)

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
    val r = resolveTable(spark, path, op, requireHive = set0.isDefined)
    val Resolved(root, fs, snap, face, partCols, absFiles, tableSchema,
      partSchema, fullSchema, caseSensitive, leafByAbs) = r
    val partitioned = r.partitioned
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
      cond0.toSeq.flatMap(translatedConjuncts(spark, fullSchema, _))
    // stats load whenever pruning can use them OR the DV branch needs
    // exact row counts (bindDvs drops a fully-masked file only when it
    // can PROVE full coverage — an untranslatable predicate must not
    // silently lose that, the keyed deleteByKeyDV's behavior)
    val statsByFile
        : Map[String, Option[Seq[Map[String, FeatherStats.ColStat]]]] =
      if (condFilters.isEmpty && !dvMask) Map.empty
      else FeatherStats.loadForFiles(conf, absFiles)
    val candidateIdx: Seq[Int] =
      pruneCandidateIdx(absFiles, condFilters, leafByAbs, partSchema,
        statsByFile)
    val candidateAbs = candidateIdx.map(absFiles)
    val dvPathsAll = r.dvPathsAll
    val valuesByAbs = r.valuesByAbs
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
      // conflict scope = the pruned candidates: a concurrent mutation on
      // files stats/partitions proved matchless commits beside this one
      val committed = FeatherSnapshots.commitMutation(fs, root, op, snap,
        droppedRel, added.toSeq, setDvs = bindings,
        readRel = Some(candidateIdx.map(i => snap.files(i)._1).toSet))
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
      // conflict scope = the pruned candidates (see the DV branch)
      val committed = FeatherSnapshots.commitMutation(fs, root, op, snap,
        removeRel, added.toSeq, readRel = Some(removeRel))
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

  /** Translatable conjuncts of a RESOLVED predicate, through Spark's
    * OWN filter translation (`Bridge.translateFilter`) so pruning
    * semantics can never drift from scan pushdown. Foldable subtrees
    * fold first: analysis leaves `id > CAST(350 AS bigint)` unfolded
    * (the optimizer would fold it, but optimizing over the empty shape
    * relation would erase the whole Filter), and the translator only
    * recognizes bare literals. Anything untranslatable just doesn't
    * prune — pruning is an optimization, never a correctness input. */
  private def translatedConjuncts(spark: SparkSession,
                                  fullSchema: StructType, cond: Column)
      : Seq[org.apache.spark.sql.sources.Filter] = {
    val shape = spark.createDataFrame(new java.util.ArrayList[Row](),
      fullSchema)
    val analyzed = shape.where(cond).queryExecution.analyzed
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

  /** The two-tier conservative candidate filter: a file survives unless
    * its partition LEAF refutes every translated conjunct or its stats
    * sidecars prove every row group empty. No filters → every file is a
    * candidate. */
  private def pruneCandidateIdx(absFiles: Seq[(String, Long)],
                                condFilters: Seq[org.apache.spark.sql.sources.Filter],
                                leafByAbs: Map[String, FeatherPartitions.LeafFile],
                                partSchema: StructType,
                                statsByFile: Map[String, Option[Seq[Map[String, FeatherStats.ColStat]]]])
      : Seq[Int] =
    absFiles.indices.filter { i =>
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

  /** Predicate-scoped atomic OVERWRITE — the `replaceWhere` backfill
    * statement (Delta's `option("replaceWhere", ...)` semantics, as an
    * API): ONE commit deletes every row `cond` selects and inserts
    * `data`. The recompute-one-slice-and-swap-it job a daily-partitioned
    * 100-TB corpus runs — readers see the old slice or the new one,
    * never a mix, and time travel keeps the old version. (Reference
    * anchor: the reference replaces a slice by boolean-mask drop +
    * concat over an in-memory frame, python/cudf/cudf/core/dataframe.py
    * `drop`/reshape.py `concat`; a distributed table needs the atomic
    * commit + pruning story instead.)
    *
    * Contract (Delta parity):
    *  - every `data` row must satisfy `cond`, checked BEFORE any write —
    *    a row outside the predicate would silently grow the replacement
    *    scope and make the backfill non-idempotent;
    *  - `cond` must be a deterministic boolean; `data`'s plan must be
    *    deterministic too (the constraint probe, the routed write's
    *    distinct() and its per-leaf slices each re-evaluate it; persist
    *    is best-effort under eviction, the DML triad's rule);
    *  - clock functions in both pin to one per-statement instant;
    *  - `data` aligns BY NAME under the lossless-or-exact cast rule;
    *    columns it does not supply read as NULL (partition columns must
    *    be supplied); extra columns refuse with evolution guidance.
    *
    * Work ∝ selectivity: candidates prune through partition values and
    * stats sidecars exactly like the DML triad (Spark's own filter
    * translation), non-candidate files carry through the manifest
    * untouched, and only candidate rows the predicate does NOT select
    * rewrite — for the common leaf-aligned backfill that is ~zero rows,
    * so the write is the new data plus the manifest. Commits as an
    * `overwrite` under the mutation conflict matrix; a statement that
    * matches nothing and inserts nothing publishes NO version (the
    * replay-clean rule). */
  def replaceWhere(spark: SparkSession, path: String, data: DataFrame,
                   cond: Column, codec: String = "lz4"): Result = {
    val op = "replaceWhere"
    val conf = spark.sparkContext.hadoopConfiguration
    val r = resolveTable(spark, path, op, requireHive = true)
    val Resolved(root, fs, snap, face, partCols, absFiles, tableSchema,
      partSchema, fullSchema, caseSensitive, leafByAbs) = r
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"$op on $path: $msg")
    val nowInstant = java.time.Instant.now()
    val cond0 = FeatherMutations.pinClock(spark,
      fullSchema.fieldNames.toSeq, nowInstant)(cond)
    def emptyFrame = spark.createDataFrame(
      new java.util.ArrayList[Row](), fullSchema)
    locally {
      val dt = emptyFrame.select(cond0).schema.head.dataType
      if (dt != BooleanType)
        bad(s"predicate is ${dt.catalogString}, not boolean")
      if (!emptyFrame.select(cond0).queryExecution.analyzed.expressions
          .forall(_.deterministic))
        bad("the predicate is nondeterministic — the statement evaluates " +
          "it in several separate Spark jobs (pruning, the constraint " +
          "probe, the survivor rewrite), so a nondeterministic predicate " +
          "can silently duplicate or lose rows; make it deterministic " +
          "(clock functions are pinned per statement automatically)")
      // data's PLAN too: the routed write re-scans it per leaf
      data.queryExecution.analyzed.find(p =>
          !p.expressions.forall(_.deterministic)).foreach(_ =>
        bad("the replacement data's plan is nondeterministic — the " +
          "constraint probe and the routed write's per-leaf slices " +
          "re-evaluate it (persist is best-effort under eviction), so " +
          "rand()/uuid()-shaped data can silently violate the predicate " +
          "or mis-route rows; materialize the data first (write it to a " +
          "staging path and read it back)"))
    }
    // ---- align data BY NAME -------------------------------------------------
    val canon = FeatherMutations.canonicalName(fullSchema, caseSensitive) _
    val aligned0: DataFrame = {
      val posNames = data.columns.indices.map(i => s"__rw_c$i")
      val d2 = data.toDF(posNames: _*)
      val named: Seq[(String, Column, DataType)] =
        data.schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
          (canon(f.name), d2(posNames(i)), f.dataType) }
      named.groupBy(_._1).foreach { case (n, vs) =>
        if (vs.size > 1) bad(s"data supplies column '$n' more than once") }
      val unknown = named.map(_._1)
        .filterNot(fullSchema.fieldNames.contains)
      if (unknown.nonEmpty)
        bad(s"data supplies column(s) ${unknown.mkString(", ")} not in " +
          s"the table schema (${fullSchema.fieldNames.mkString(", ")}) — " +
          "replaceWhere never evolves the schema; evolve via the write " +
          "API's mergeSchema=true or MERGE WITH SCHEMA EVOLUTION first, " +
          "or drop the column")
      val byName = named.map { case (n, c, dt) => n -> (c, dt) }.toMap
      val cols = fullSchema.fields.toSeq.map { f =>
        val raw: Column = byName.get(f.name) match {
          case Some((c, actual)) =>
            if (!(actual == f.dataType ||
                org.apache.spark.sql.catalyst.expressions.Cast
                  .canUpCast(actual, f.dataType)))
              bad(s"column '${f.name}' (${f.dataType.catalogString}) " +
                s"from a ${actual.catalogString} expression — only exact " +
                "types and lossless upcasts are applied; cast the data " +
                "column explicitly if the narrowing is intended")
            c.cast(f.dataType)
          case None =>
            if (partCols.contains(f.name))
              bad(s"data does not supply partition column '${f.name}' — " +
                "an unnamed partition value would route rows to the " +
                "null leaf")
            lit(null).cast(f.dataType)
        }
        FeatherMutations.nullableAsTable(raw, f.nullable).as(f.name)
      }
      d2.select(cols: _*)
    }
    val fire: Column = coalesce(cond0, lit(false))
    // one statement, one instant, even across the probe + routed writes
    val (ins, ownIns) = ConnectorFace.pinIfUncached(
      FeatherMutations.pinClockInPlan(spark, aligned0, nowInstant))
    try {
      // ---- the scope constraint (before any pruning or write) --------------
      val insEmpty = ins.limit(1).count() == 0
      if (!insEmpty && ins.where(!fire).limit(1).count() > 0)
        bad("the replacement data contains row(s) the predicate does " +
          "NOT select — every inserted row must satisfy the replaceWhere " +
          "predicate (otherwise the statement silently grows its own " +
          "scope); widen the predicate or filter the data")
      // ---- candidates (the DML triad's two-tier pruning) --------------------
      val condFilters = translatedConjuncts(spark, fullSchema, cond0)
      val statsByFile
          : Map[String, Option[Seq[Map[String, FeatherStats.ColStat]]]] =
        if (condFilters.isEmpty) Map.empty
        else FeatherStats.loadForFiles(conf, absFiles)
      val candidateIdx = pruneCandidateIdx(absFiles, condFilters,
        leafByAbs, partSchema, statsByFile)
      val candidateAbs = candidateIdx.map(absFiles)
      val targetV = snap.version + 1
      val prefix = FeatherSnapshots.runPrefix(targetV, "rw-")
      def noOp = Result(snap.version, 0, snap.files.size, 0)
      val (cand, ownCand) =
        if (candidateAbs.isEmpty) (emptyFrame, false)
        else ConnectorFace.pinIfUncached(
          FeatherMutations.readWithPartValues(spark, face, candidateAbs,
            r.dvPathsAll, tableSchema, partSchema, r.valuesByAbs))
      try {
        // exact limit-1 probe: nothing to delete AND nothing to insert
        // publishes no version (replay-clean), even when stats could not
        // refute the match
        val anyMatch = candidateAbs.nonEmpty &&
          cand.where(fire).limit(1).count() > 0
        if (!anyMatch && insEmpty) return noOp
        // a PROVEN zero-match statement is semantically a pure insert:
        // keep every candidate file untouched and append only the data
        // (without this, an insert-only backfill under an UNTRANSLATABLE
        // predicate — every file a candidate — would rewrite the whole
        // table to delete nothing)
        val rewriting = anyMatch
        // survivors: candidate rows the predicate does NOT select (NULL
        // keeps, SQL semantics) — non-candidate files never rewrite
        val out = if (rewriting) cand.where(!fire).unionAll(ins) else ins
        val rewriteIdx = if (rewriting) candidateIdx else Seq.empty
        val added = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        if (r.partitioned) {
          val candPerLeaf: Map[String, Int] = rewriteIdx
            .map(i => FeatherMutations.relDirOf(snap.files(i)._1))
            .groupBy(identity).map { case (k, v) => k -> v.size }
          added ++= FeatherMutations.routePartitionedInserts(op, face, fs,
            root, out, partCols, tableSchema, prefix, codec,
            partsFor = relDir => candPerLeaf.getOrElse(relDir, 1))
        } else {
          val parts = face.writeParts(
            out.coalesce(math.max(1, rewriteIdx.size +
              (if (insEmpty) 0 else ConnectorFace.capWriteParts(ins)))),
            root.toString, prefix, codec)
          if (parts.nonEmpty)
            FeatherStats.upsertMerged(fs, root,
              parts.map { case (name, len, js) =>
                name -> (len, FeatherStats.fromJson(js)) }.toMap)
          added ++= parts.map { case (name, len, _) => (name, len) }
        }
        val removeRel: Set[String] =
          rewriteIdx.map(i => snap.files(i)._1).toSet
        if (added.isEmpty && snap.files.nonEmpty &&
            snap.files.forall { case (rel, _) => removeRel(rel) })
          added ++= FeatherMutations.stampLeaves(face, fs, root,
            snap.files.map(_._1), prefix, tableSchema)
        // commits as "overwrite": the snapshot stream's closed op set
        // treats it exactly like Delta does (new files are novel rows,
        // replaced rows are not retracted), and CDF is diff-based either
        // way. The proven-zero-match case removed nothing — it is a
        // blind APPEND and commits as one (streams keep flowing, and it
        // commutes with concurrent mutations under the conflict matrix)
        val committed =
          if (!rewriting)
            FeatherSnapshots.publishDataCommit(fs, root,
              truncate = false, Seq(face.suffix), added.toSeq,
              stampPart = () => face.stamp(fs, root, prefix, tableSchema))
          else FeatherSnapshots.commitMutation(fs, root,
            "overwrite", snap, removeRel, added.toSeq,
            // conflict scope = the rewritten candidates (the DML
            // triad's rule): a concurrent mutation on non-candidate
            // files commits beside this backfill
            readRel = Some(removeRel))
        Result(committed, rewriteIdx.size,
          snap.files.size - rewriteIdx.size, added.size)
      } finally {
        if (ownCand) cand.unpersist(blocking = false): Unit
      }
    } finally {
      if (ownIns) ins.unpersist(blocking = false): Unit
    }
  }
}
