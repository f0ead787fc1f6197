package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Source, Offset => V1Offset}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.io.FeatherChanges

/** STREAMING change-data-feed over a snapshotted graft table (either
  * face — feather or avro; [[FeatherChanges]] detects it from the
  * manifest):
  *
  * {{{
  *   spark.readStream.format("feather-cdf").load(path)
  * }}}
  *
  * Each micro-batch is a [[FeatherChanges.readChanges]] version diff —
  * inserts AND deletes, tagged `_change_type` + `_commit_version` — so
  * mutation commits (delete, DV delete, merge, cdc, overwrite, restore)
  * STREAM as their row-level changes instead of refusing like the plain
  * snapshot stream does. Offsets are manifest versions; exactly-once
  * across restarts comes from manifest immutability (a replayed batch
  * re-derives the identical version diff — no file-set bookkeeping).
  *
  * This is a V1 `Source` rather than a DSv2 `MicroBatchStream` by
  * necessity: a CDF batch is a DATAFRAME computation (per-version row
  * diffs net out through a shuffle), not a fixed set of file-partition
  * reads, and only the V1 contract lets a source return a DataFrame.
  * The plan re-tags as streaming lazily — nothing executes at planning.
  *
  * Options:
  *  - `startingVersion` (default 0): the first batch covers
  *    `(startingVersion, head]`. 0 bootstraps the whole table as
  *    version-1 inserts; `latest` starts from the CURRENT head (only
  *    changes after stream start flow).
  *  - `startingTimestamp` (exclusive with startingVersion): changes
  *    from the first version committed AFTER the instant flow (epoch
  *    millis, ISO instant, or session-timezone local form — the
  *    timestampAsOf forms). Resolved ONCE at first start and pinned in
  *    the checkpoint: restarts never re-resolve against a history
  *    whose tail has since expired.
  *  - `maxVersionsPerTrigger`: admission control — each micro-batch
  *    covers at most n version steps, so a consumer recovering a week
  *    of backlog drains it in bounded pieces instead of diffing every
  *    version (an overwrite's change set is the whole table) in ONE
  *    job. The maxFilesPerTrigger idea, in versions.
  *
  * Caveat (documented divergence): the feed's schema is fixed at stream
  * start from the head snapshot. A batch column the fixed schema lacks
  * is attributed THROUGH THE MANIFEST at the table's current head:
  * still live there ⇒ a mid-stream WIDENING, and the query fails loudly
  * (the new values cannot flow through the fixed schema — restart to
  * pick them up); absent there ⇒ a since-DROPPED column whose only
  * occurrences are retired rows, and it projects away (the Delta
  * shape — CDF serves the current schema; this also means history,
  * narrowings, and replayed batches never wedge a restart). Corner: a
  * column both introduced and dropped before its batch processes
  * projects too. A batch MISSING fixed-schema columns null-fills them:
  * that is the column's true value both for rows predating a widening
  * and for rows written after a narrowing. */
class FeatherCdfSourceProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "feather-cdf"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error(
      "feather-cdf requires a path: " +
        "spark.readStream.format(\"feather-cdf\").load(path)"))

  // Spark calls sourceSchema (eagerly, building the relation) and then
  // createSource on the SAME provider instance — the memo stops the
  // second O(files) footer sweep at stream start
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(),
      schema.getOrElse(schemaMemo.computeIfAbsent(pathOf(parameters),
        p => FeatherChanges.feedSchemaAtHead(sqlContext.sparkSession, p))))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val root = new org.apache.hadoop.fs.Path(path)
    val rfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ONE listing serves the head (latest-pin + ahead-check) and the
    // incarnation's oldest — stream startup pays a single listStatus
    val bounds = FeatherSnapshots.versionBounds(rfs, root)
    val head = bounds.map(_._2).getOrElse(0L)
    val incNow = FeatherSnapshots.incarnationFrom(rfs, root,
      bounds.map(_._1))
    val startingVersionOpt = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion"))
    val startingTsOpt = parameters.get("startingtimestamp")
      .orElse(parameters.get("startingTimestamp"))
    require(startingVersionOpt.isEmpty || startingTsOpt.isEmpty,
      "feather-cdf: specify either startingVersion or " +
        "startingTimestamp, not both")
    // startingTimestamp resolves ONCE, at FIRST start, and rides the
    // pin: readOrWritePin takes the seed BY NAME and only forces it
    // when no pin exists yet — a restart reads the pinned value and
    // never re-resolves, so a history whose tail has since expired
    // past the instant cannot wedge the restart (nor does a restart
    // pay resolveAt's O(retained manifests) readAll). Changes from the
    // first version committed AFTER the instant flow; `starting` is
    // exclusive, so the seed is the newest version AT OR BEFORE it
    // (resolveAt). An instant predating every retained commit
    // bootstraps from 0 only when the FULL history is retained (the
    // oldest is v1) — with an expired tail that is loud, decided by
    // comparing against the oldest snapshot's commit ts directly (a
    // catch around resolveAt would also swallow torn-chain
    // diagnostics). A table that does not exist yet is refused: its
    // future commits cannot be ordered against the instant at pin
    // time, and a pinned 0 would deliver pre-instant rows forever.
    def pinSeed: Long = startingTsOpt match {
      case None => head
      case Some(raw) =>
        require(bounds.nonEmpty,
          s"feather-cdf on $path: startingTimestamp on a table with no " +
            "snapshot versions — start the stream once the table " +
            "exists, or use startingVersion")
        val millis = FeatherTimeTravel.parseTsMillis(raw)
        incNow match {
          case Some((ov, ots)) if millis < ots =>
            if (ov == 1L) 0L
            else sys.error(s"feather-cdf on $path: startingTimestamp " +
              s"$raw predates the earliest retained snapshot (v$ov) — " +
              "that history is expired; pick a later instant or an " +
              "explicit startingVersion")
          case _ => FeatherSnapshots.resolveAt(rfs, root, millis).version
        }
    }
    // ONE pin file, written atomically at first start, carrying BOTH
    // the start seed (the head for startingVersion=latest, the
    // resolved version for startingTimestamp) and the table
    // incarnation — two separate files would open a crash window
    // between them in which a rebuild could silently continue a
    // latest-start checkpoint
    val (pinStart, pinInc) = readOrWritePin(spark, metadataPath,
      pinSeed, incNow)
    // a checkpoint that recorded an incarnation while the table is now
    // GONE must be loud — a later rebuild would otherwise continue it
    for ((pv, pts) <- pinInc)
      require(incNow.isDefined,
        s"feather-cdf on $path: no snapshot versions exist but this " +
          s"checkpoint recorded incarnation v$pv ts $pts — the table " +
          "was dropped; discard the checkpoint and restart deliberately " +
          "once it is rebuilt")
    // table-INCARNATION check FIRST (the sharper diagnosis): a
    // drop-and-rebuild at the same path must never silently continue
    // another incarnation's checkpoint — the manifest diffs would be
    // pure garbage. The oldest retained version only GROWS on a live
    // table (expire moves it forward), so a current oldest BELOW the
    // pinned one — or the same version with a different commit ts —
    // proves a rebuild. Best-effort: a rebuild that raced past the
    // pinned oldest is indistinguishable from retention.
    for ((cv, cts) <- incNow; (pv, pts) <- pinInc)
      require(cv > pv || (cv == pv && cts == pts),
        s"feather-cdf on $path: the table was dropped and rebuilt since " +
          s"this checkpoint started (oldest retained version v$cv " +
          s"ts $cts vs pinned v$pv ts $pts) — discard the checkpoint " +
          "and restart deliberately")
    val starting = startingVersionOpt match {
      case Some("latest") =>
        // the head at the stream's TRUE start, from the pin: a restart
        // must replay getBatch against the ORIGINAL start — a
        // re-resolved "latest" would swallow every version committed
        // while the stream was down if the crash left an uncommitted
        // batch in the offset WAL (getBatch(None, walEnd) would then
        // cover (newLatest, walEnd] = nothing)
        pinStart
      case Some(v) => v.toLongOption.getOrElse(throw
        new IllegalArgumentException(
          s"feather-cdf: startingVersion must be a version number or " +
            s"'latest', got '$v'"))
      case None if startingTsOpt.isDefined => pinStart // resolved above
      case None => 0L
    }
    // a future startingVersion is almost certainly a crossed checkpoint
    // or the wrong table — and silently, the first (empty) batch would
    // commit the head offset and stream the very versions the caller
    // asked to skip. Loud beats that. (Restart-safe: on one incarnation
    // heads only grow, and the latest-pin was ≤ the head when written;
    // cross-incarnation regressions were diagnosed above.)
    require(starting <= head,
      s"feather-cdf on $path: startingVersion $starting is ahead of the " +
        s"table head $head — wrong table, or a checkpoint from another " +
        "stream")
    val maxVersions = parameters.get("maxversionspertrigger")
      .orElse(parameters.get("maxVersionsPerTrigger")).map { v =>
        val n = v.toLongOption.getOrElse(throw
          new IllegalArgumentException(
            s"feather-cdf: maxVersionsPerTrigger must be a positive " +
              s"number of versions, got '$v'"))
        require(n > 0, s"feather-cdf: maxVersionsPerTrigger must be " +
          s"positive, got $n")
        n
      }
    val feedSchema =
      sourceSchema(sqlContext, schema, providerName, parameters)._2
    // the memo exists ONLY to bridge Spark's sourceSchema→createSource
    // pair at THIS stream's start: evict now, so a drop-and-rebuild of
    // the table between two stream starts in one session can never serve
    // the old incarnation's schema to the NEW stream's relation (the
    // running source's identity pin would catch the mismatch, but as a
    // batch failure instead of a clean start-time schema)
    schemaMemo.remove(path): Unit
    new FeatherCdfSource(spark, path, feedSchema,
      starting, metadataPath, pinStart,
      // readOrWritePin folded incNow in (fresh write or upgrade), so
      // this is false ONLY when the table does not exist yet
      incAlreadyPinned = pinInc.isDefined,
      maxVersionsPerTrigger = maxVersions)
  }

  /** The stream's durable identity pin (`graft-cdf-start` under its
    * checkpoint metadata dir): `"<startHead>;<oldestV>,<oldestTs>"`, or
    * `"<startHead>;"` while the table does not exist yet. The first
    * start resolves and writes it (temp + atomic rename); restarts read
    * it back.
    *
    * A pin whose incarnation half is still empty may upgrade in place
    * here ONLY because the running source pins the incarnation from
    * [[FeatherCdfSource.getOffset]] BEFORE the first offset a table can
    * ever produce: an empty half at restart therefore proves no batch
    * was served from ANY incarnation — there is nothing a rebuild could
    * have invalidated. Without that ordering, upgrading here would
    * silently adopt a REBUILT table into a checkpoint whose WAL offsets
    * were committed against the dropped one.
    * Returns (pinned start head, pinned incarnation). */
  private def readOrWritePin(spark: SparkSession, metadataPath: String,
                             seed: => Long, incNow: Option[(Long, Long)],
                             retries: Int = 3)
      : (Long, Option[(Long, Long)]) = {
    import FeatherCdfPin.{parse, write}
    val (dir, cfm, pin) = FeatherCdfPin.manager(spark, metadataPath)
    if (!cfm.exists(pin)) {
      cfm.mkdirs(dir)
      // `seed` forces HERE only — on a restart the pinned value is the
      // truth and the (possibly no-longer-resolvable) seed never runs
      write(cfm, pin, seed, incNow)
      // re-read what survived: a racing (re)start may have won the
      // atomic overwrite — the durable file is the truth both sides use
      require(retries > 0,
        s"feather-cdf: cannot pin the stream identity under $metadataPath")
      readOrWritePin(spark, metadataPath, seed, incNow, retries - 1)
    } else {
      val parsed = parse(FeatherCdfPin.read(cfm, pin), pin)
      if (parsed._2.isEmpty && incNow.isDefined) {
        // upgrade-in-place (atomic overwrite) — safe per the scaladoc
        // invariant: empty half ⇒ no batch was ever served
        write(cfm, pin, parsed._1, incNow)
        (parsed._1, incNow)
      } else parsed
    }
  }
}

/** The pin file's read/write/parse mechanics, shared by the provider
  * (start/restart) and the running [[FeatherCdfSource]] (the
  * first-offset incarnation upgrade). */
private[sources] object FeatherCdfPin {
  import org.apache.hadoop.fs.Path
  import org.apache.spark.sql.execution.streaming.checkpointing
    .CheckpointFileManager

  /** CheckpointFileManager, not a raw FileSystem: its createAtomic
    * gives atomic CREATE-OR-OVERWRITE on every checkpoint filesystem
    * (HDFS rename does NOT overwrite; object stores need the direct
    * strategy) — the same machinery Spark's own offset log rides. */
  def manager(spark: SparkSession, metadataPath: String)
      : (Path, CheckpointFileManager, Path) = {
    val dir = new Path(metadataPath)
    val cfm = CheckpointFileManager.create(dir,
      spark.sessionState.newHadoopConf())
    (dir, cfm, new Path(dir, "graft-cdf-start"))
  }

  def parse(s0: String, pin: Path): (Long, Option[(Long, Long)]) = {
    // a corrupt/foreign pin must name the file and the remedy, matching
    // the torn-manifest diagnostics elsewhere — a raw
    // NumberFormatException would leave the operator guessing which of
    // the checkpoint's files went bad
    def num(part: String, what: String): Long = part.trim.toLongOption
      .getOrElse(throw new IllegalStateException(
        s"feather-cdf stream identity pin $pin is corrupt ($what is " +
          s"'${part.trim}', expected a number; full body: '${s0.trim}') " +
          "— the checkpoint was damaged or belongs to another source; " +
          "inspect the checkpoint directory and restart deliberately"))
    val s = s0.trim
    val semi = s.indexOf(';')
    if (semi < 0) (num(s, "start head"), None) // head-only pin: upgrades later
    else {
      val h = num(s.substring(0, semi), "start head")
      val i = s.substring(semi + 1).trim
      if (i.isEmpty) (h, None)
      else i.split(',') match {
        case Array(v, ts) =>
          (h, Some((num(v, "incarnation version"),
            num(ts, "incarnation timestamp"))))
        case _ => throw new IllegalStateException(
          s"feather-cdf stream identity pin $pin is corrupt (incarnation " +
            s"half '$i' is not 'version,ts'; full body: '${s0.trim}') — " +
            "inspect the checkpoint directory and restart deliberately")
      }
    }
  }

  def read(cfm: CheckpointFileManager, pin: Path): String = {
    val in = cfm.open(pin)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  def write(cfm: CheckpointFileManager, pin: Path,
            start: Long, inc: Option[(Long, Long)]): Unit = {
    val body = s"$start;${inc.map { case (v, ts) => s"$v,$ts" }
      .getOrElse("")}"
    val out = cfm.createAtomic(pin, true)
    try {
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    } catch { case e: Throwable => out.cancel(); throw e }
  }
}

private[graft] class FeatherCdfSource(spark: SparkSession, path: String,
                                      fixedSchema: StructType,
                                      // exposed so the spec can pin the
                                      // pinned-start restart contract
                                      val startingVersion: Long,
                                      metadataPath: String,
                                      pinStart: Long,
                                      incAlreadyPinned: Boolean,
                                      maxVersionsPerTrigger: Option[Long] =
                                        None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit,
    Offset => OffsetV2}
  private def rp = new org.apache.hadoop.fs.Path(path)
  private def fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def schema: StructType = fixedSchema

  // false only for a stream that started before its table existed
  private var incarnationPinned = incAlreadyPinned

  // newest version this source has OFFERED or SERVED — one leg of the
  // admission base. getBatch raises it to the WAL's recovered end on
  // restart, so a capped stream never crawls version-by-version
  // through already-committed history just to catch its cap up.
  private var highWater: Option[Long] = None

  // outer Some = Trigger.AvailableNow prepared this run; inner = the
  // head at prepare time, None when no table existed then (this run
  // then serves nothing — AvailableNow's contract is "what was
  // available at start", and commits racing in after prepare wait for
  // the next run)
  private var availableNowTarget: Option[Option[Long]] = None

  /** Admission control: an uncapped CDF batch over a week of backlog
    * diffs every version in ONE job (an overwrite's change set is the
    * whole table) — `maxVersionsPerTrigger` bounds each micro-batch to
    * n version steps, letting a recovering consumer drain in bounded
    * pieces exactly like maxFilesPerTrigger does for the file stream.
    * The base is the max of the engine's startOffset (authoritative
    * across restarts whose last batch committed — no getBatch replay
    * raises highWater then), our own high water, and the starting
    * version. */
  private def offer(headV: Long, engineBase: Option[Long]): LongOffset = {
    val base = (engineBase.toSeq ++ highWater.toSeq :+ startingVersion).max
    val capped = maxVersionsPerTrigger
      .fold(headV)(n => math.min(headV, base + n))
    highWater = Some(math.max(base, capped))
    LongOffset(capped)
  }

  /** [[SupportsTriggerAvailableNow]]: pin the drain target at prepare
    * time. Without this, Spark's AvailableNow wrapper would capture
    * ONE capped getOffset and terminate the query n versions in,
    * silently stranding the rest of the backlog; with it, the capped
    * stream keeps triggering until the PREPARED head is reached.
    * headUnderPin's None is AMBIGUOUS — absent table (serve nothing,
    * the AvailableNow contract) or a drop/rebuild racing the identity
    * probe — and the race must not freeze into a zero-row run an
    * orchestrator would read as a completed drain: retry, then loud. */
  override def prepareForTriggerAvailableNow(): Unit = {
    // decide loud-vs-serve-nothing from the SAME observation the head
    // decision was made from (headObserved's flag), never a separate
    // listing — a fresh listing could flip between decision and
    // classification and misclassify both directions
    var last: (Option[Long], Boolean) = (None, true)
    var tries = 0
    while ({ last = headObserved()
             last._1.isEmpty && last._2 && tries < 4 }) tries += 1
    require(last._1.nonEmpty || !last._2,
      s"feather-cdf on $path: cannot pin the table identity for " +
        "Trigger.AvailableNow — a drop/rebuild is racing this start; " +
        "retry the run")
    availableNowTarget = Some(last._1)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** [[org.apache.spark.sql.connector.read.streaming
    * .SupportsAdmissionControl]]: the engine calls this instead of
    * [[getOffset]]. The ReadLimit parameter is unused — the version cap
    * comes from the source's own option (versions are not rows/files/
    * bytes, the limits ReadLimit can express). */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit)
      : OffsetV2 = {
    val engineBase = Option(startOffset).map(_.json.trim.toLong)
    val h0 = headUnderPin()
    val h = availableNowTarget match {
      case Some(Some(t)) => h0.map(math.min(_, t))
      case Some(None) => None // nothing existed at prepare time
      case None => h0
    }
    h.map(offer(_, engineBase)).orNull
  }

  // the newest head any headUnderPin listing observed — metrics only
  private var lastSeenHead: Option[Long] = None

  /** Metric only: the head the last trigger's listing observed.
    * Spark calls this back-to-back with latestOffset every trigger —
    * a fresh versionBounds here would DOUBLE the per-trigger LIST
    * cost on an object store just to report a number. */
  override def reportLatestOffset(): OffsetV2 =
    lastSeenHead.map(LongOffset(_)).orNull

  // NEVER filtered by startingVersion: that value only seeds the FIRST
  // batch (getBatch with start=None). A restart resumes from the
  // checkpointed offset — re-filtering against a re-resolved
  // startingVersion=latest would strand the versions committed while
  // the stream was down until some future commit moved the head.
  override def getOffset: Option[V1Offset] =
    Option(latestOffset(null, getDefaultReadLimit))
      .map(_.asInstanceOf[V1Offset])

  /** The table head this source may offer — after the identity-pin
    * protocol (see the inline comments). None = nothing to offer this
    * trigger. */
  private def headUnderPin(): Option[Long] = headObserved()._1

  /** [[headUnderPin]] plus what THIS call's own listing saw: the
    * second member is true iff a table existed in the observation the
    * head decision was made from. AvailableNow's prepare classifies
    * its None on exactly this flag — a separate listing could flip
    * between the decision and the classification (TOCTOU), loudly
    * failing a legitimately-absent table or silently zero-row-draining
    * a racing one. */
  private def headObserved(): (Option[Long], Boolean) = {
    val bounds = FeatherSnapshots.versionBounds(fs, rp)
    lastSeenHead = bounds.map(_._2).orElse(lastSeenHead)
    // pin the incarnation BEFORE the first offset this table can ever
    // produce (the offset is what admits a batch into the WAL): every
    // served batch then has its incarnation durable first, which is the
    // invariant that makes the provider's restart-time upgrade-in-place
    // safe — an empty pin half proves no batch was served. A failed
    // write fails the trigger; the restart retries from the same state.
    if (!incarnationPinned && bounds.isDefined) {
      FeatherSnapshots.incarnationFrom(fs, rp, bounds.map(_._1)) match {
        case Some(inc) =>
          val (_, cfm, pin) = FeatherCdfPin.manager(spark, metadataPath)
          FeatherCdfPin.write(cfm, pin, pinStart, Some(inc))
          // the probe may have RE-LISTED internally (its retry path,
          // taken when a drop-rebuild raced the first listing), so the
          // first listing's bounds may not belong to the incarnation
          // just pinned. Re-list AND re-probe: offer an offset only
          // when both agree with the pin — offering a mismatched pair
          // would either wedge getBatch on manifests the table does
          // not have (stale bounds) or serve a REBUILT table's rows
          // under the old pin (fresh bounds, stale pin). On mismatch,
          // idle WITHOUT marking pinned: no offset was admitted to the
          // WAL, so the next trigger may safely re-probe and overwrite
          // the pin with the survivor's incarnation — marking pinned
          // here would stream the rebuilt table under the dropped
          // table's pin from the very next trigger.
          val bounds2 = FeatherSnapshots.versionBounds(fs, rp)
          val inc2 = FeatherSnapshots.incarnationFrom(fs, rp,
            bounds2.map(_._1))
          return if (inc2.contains(inc)) {
            incarnationPinned = true
            // only a head the stream will actually serve from reaches
            // the metric — a rebuilt table's head here would advertise
            // progress for an incarnation no batch is served from
            lastSeenHead = bounds2.map(_._2).orElse(lastSeenHead)
            (bounds2.map(_._2), true)
          } else (None, true) // probe race: retrying makes sense
        case None =>
          // the table vanished between the listing and the probe (a
          // drop racing this trigger): offering the stale bounds anyway
          // would admit an offset into the WAL with the pin still
          // empty — the exact hole the invariant closes. Idle this
          // trigger; the next one re-lists.
          return (None, true)
      }
    }
    (bounds.map(_._2), bounds.isDefined)
  }

  // offsets arrive as LongOffset pre-restart and SerializedOffset after a
  // checkpoint reload; both render the version as their json
  private def ver(o: V1Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val s = start.map(ver).getOrElse(startingVersion)
    val e = ver(end)
    // restart fast-forward: the WAL's recovered end raises the
    // admission base, so a capped stream resumes AT the checkpoint
    // instead of crawling empty version-by-version batches up to it
    highWater = Some(math.max(highWater.getOrElse(e), e))
    val batch =
      if (e <= s)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), fixedSchema)
      else {
        // the empty-shape hint keeps a no-change batch (compact-only /
        // cluster-only versions) from sweeping the table's footers just
        // to shape a frame this align would immediately re-shape anyway
        val raw = FeatherChanges.readChanges(spark, path, s, e,
          emptyShape = Some(fixedSchema))
        // the documented contract: a MID-STREAM widening fails LOUDLY —
        // align() would silently project the new columns away, losing
        // their values from the feed forever. Extra columns are
        // attributed through the MANIFEST at the table's CURRENT head
        // (one footer sweep, only on this rare path): still live there
        // ⇒ widening, loud; absent ⇒ since-dropped, its occurrences are
        // retired rows — project, never wedge. Current head, NOT the
        // batch's end version: on restart Spark REPLAYS the last
        // committed batch, and a pre-narrowing replayed batch must
        // project the dropped column exactly like live batches do
        // (history bootstraps, narrowings restart cleanly). Columns the
        // batch LACKS null-fill instead (align): null is those rows'
        // true value, whether they predate a widening or follow a
        // narrowing.
        val extra = raw.columns
          .filterNot(fixedSchema.fieldNames.contains).toSeq
        val widened =
          if (extra.isEmpty) Nil
          else {
            val live = FeatherChanges.feedSchemaAtHead(spark, path)
              .fieldNames.toSet
            extra.filter(live.contains)
          }
        if (widened.nonEmpty) throw new IllegalStateException(
          s"change feed on $path: versions ($s, $e] carry column(s) " +
            s"${widened.mkString(", ")} not in the stream's start-time " +
            "schema — the table evolved mid-stream; restart the stream " +
            "to pick up the widened schema")
        // a name the fixed schema KNOWS but at a different TYPE is the
        // same mid-stream evolution in disguise — align() never casts,
        // so letting it through would fail deep in MicroBatchExecution
        // with a schema-assertion instead of this message. Replay-safe
        // carve-out (inside alignCast): when the batch's type up-casts
        // losslessly into the fixed one (int→long, int→string, …), cast
        // and continue; that is exactly the post-restart replay of a
        // batch written before a widening retype, which must not wedge.
        FeatherChanges.alignCast(raw, fixedSchema, stuck =>
          s"change feed on $path: versions ($s, $e] carry column(s) " +
            stuck.map { case (n, have, want) =>
              s"$n (${have.catalogString}, stream expects " +
                s"${want.catalogString})" }.mkString(", ") +
            " whose type changed mid-stream and cannot be cast " +
            "losslessly — the table was rewritten with a new type; " +
            "restart the stream to pick up the new schema")
      }
    org.apache.spark.sql.graft.Bridge.asStreaming(batch)
  }

  override def stop(): Unit = ()
}

/** Mixin for the MAIN DSv2 providers (feather, graft-avro):
  * `option("readChangeFeed", "true")` on readStream. The table withholds
  * MICRO_BATCH_READ under the option (see each face's Table), Spark
  * falls back to this V1 source, and the fallback delegates to the
  * shared feather-cdf implementation — ONE definition of the mechanics
  * (a per-provider copy drifted once already in review).
  *
  * `sourceSchema` is invoked EAGERLY for every readStream (Spark builds
  * the V1 relation before consulting table capabilities), so the plain
  * path returns the table schema cheaply — mergeSchema stripped, one
  * footer — and is discarded when the DSv2 path runs; only a
  * readChangeFeed stream ever reaches `createSource`. */
private[sources] trait CdfFallbackProvider
    extends StreamSourceProvider {
  self: org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister =>

  private lazy val cdfDelegate = new FeatherCdfSourceProvider
  private def wantsCdf(m: Map[String, String]): Boolean =
    m.exists { case (k, v) => k.equalsIgnoreCase("readchangefeed") &&
      v.toBoolean }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    if (wantsCdf(parameters))
      cdfDelegate.sourceSchema(sqlContext, schema, providerName, parameters)
    else
      (shortName(), schema.getOrElse(inferSchema(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          scala.jdk.CollectionConverters.MapHasAsJava(
            parameters.filter(!_._1.equalsIgnoreCase("mergeschema"))
          ).asJava))))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    require(wantsCdf(parameters),
      "V1 source requested without readChangeFeed=true — plain streams " +
        "ride the DSv2 micro-batch path (this is a bug, not a user error)")
    cdfDelegate.createSource(sqlContext, metadataPath, schema, providerName,
      parameters)
  }
}
