package graft.io

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Per-record-batch min/max statistics for feather parts — the skipping
  * index the format itself lacks (parquet carries row-group stats in its
  * footer; the Arrow IPC footer carries none). The sink writes one
  * `<part>.stats.json` sidecar per part file; the DSv2 scan loads it and
  * SKIPS batches whose [min,max] ranges prove no row can satisfy the
  * pushed filters. Pruning is skip-only — Spark re-applies every filter
  * above the scan — so a missing/stale sidecar or an unsupported type
  * costs pruning, never correctness.
  *
  * Ranges cover NON-NULL values only, which is sufficient: a row with a
  * null in the filtered column never satisfies a comparison predicate,
  * so "no non-null value in range" means "no row matches". A batch with
  * ZERO non-null values ([[ColStat.Empty]]) is prunable by ANY
  * comparison on that column.
  *
  * v1 scope: integer types (stored as long), float/double, string. Other
  * types record no stats and never prune.
  */
object FeatherStats {

  sealed trait ColStat
  object ColStat {
    final case class Longs(lo: Long, hi: Long) extends ColStat
    final case class Doubles(lo: Double, hi: Double) extends ColStat
    final case class Strings(lo: String, hi: String) extends ColStat
    case object Empty extends ColStat // all-null batch column
    /** Batch ROW COUNT, stored under the reserved [[RowCountKey]] pseudo-
      * column. Lets the connector answer COUNT(*) (and bound MIN/MAX
      * pushdown) from sidecars alone; older sidecars without it simply
      * disqualify their file from aggregate pushdown, never from reads. */
    final case class Count(n: Long) extends ColStat
  }

  /** Reserved sidecar key for per-batch row counts ("__" prefix cannot
    * collide with a real column: the feather sink rejects no names, but
    * filters/aggregates arrive by field reference and Spark quotes real
    * columns verbatim — a user column literally named __n would only make
    * its own stats unusable, never corrupt another's). */
  val RowCountKey = "__n"

  /** Accumulates one batch's ranges; reset between batches. */
  /** The column types the stats tier tracks — ONE definition shared by
    * the sink-side Collector, the backfill pass, and the agg-pushdown
    * answerability check (a per-site copy DID silently drift when
    * DateType was added — review pass 12). */
  private[graft] def trackedType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType => true
    case _ => false
  }

  /** Dates track as EPOCH DAY longs — the natural total order, shared by
    * the collector, the filter-value normalizer, and the mutation
    * probe's date→long key mapping (a per-site convention would drift). */
  private[io] def dateToDay(v: Any): Option[Long] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  final class Collector(st: StructType) {
    private val tracked: Array[Int] = st.fields.zipWithIndex.collect {
      case (f, i) if trackedType(f.dataType) => i
    }
    private val los = new Array[Any](st.fields.length)
    private val his = new Array[Any](st.fields.length)
    private var nRows: Long = 0L

    def observe(r: Row): Unit = { nRows += 1; tracked.foreach { i =>
      if (!r.isNullAt(i)) {
        val v: Any = st.fields(i).dataType match {
          case ByteType => r.getByte(i).toLong
          case ShortType => r.getShort(i).toLong
          case IntegerType => r.getInt(i).toLong
          case LongType => r.getLong(i)
          case FloatType => r.getFloat(i).toDouble
          case DoubleType => r.getDouble(i)
          case StringType => r.getString(i)
          case DateType => dateToDay(r.get(i)).orNull
          case _ => null
        }
        if (v != null) {
          if (los(i) == null || lt(v, los(i))) los(i) = v
          if (his(i) == null || lt(his(i), v)) his(i) = v
        }
      }
    } }

    private def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Long) => x < y
      case (x: Double, y: Double) => x < y
      // UTF-8 BYTE order, matching Spark's string comparisons: Java's
      // UTF-16 compareTo disagrees beyond the BMP (surrogates sort below
      // U+E000 in UTF-16 but above in UTF-8), and a min/max collected in
      // the wrong order would let range pruning skip batches that DO
      // contain matching rows
      case (x: String, y: String) => utf8Lt(x, y)
      case _ => false
    }

    /** Snapshot this batch's stats and reset for the next. */
    def snapshotAndReset(): Map[String, ColStat] = {
      val out = tracked.map { i =>
        val name = st.fields(i).name
        val stat = (los(i), his(i)) match {
          case (null, _) => ColStat.Empty
          case (lo: Long, hi: Long) => ColStat.Longs(lo, hi)
          case (lo: Double, hi: Double) => ColStat.Doubles(lo, hi)
          case (lo: String, hi: String) => ColStat.Strings(lo, hi)
          case _ => ColStat.Empty
        }
        los(i) = null; his(i) = null
        name -> stat
      }.toMap
      val n = nRows; nRows = 0L
      out + (RowCountKey -> ColStat.Count(n))
    }
  }

  // ---- sidecar JSON (jackson, bundled with Spark) --------------------------

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def batchesToNode(batches: Seq[Map[String, ColStat]])
      : java.util.List[java.util.Map[String, Any]] =
    batches.map { b =>
      b.map { case (name, stat) =>
        val m = new java.util.LinkedHashMap[String, Any]()
        stat match {
          case ColStat.Longs(lo, hi) =>
            m.put("t", "l"); m.put("lo", lo.toString); m.put("hi", hi.toString)
          case ColStat.Doubles(lo, hi) =>
            m.put("t", "d"); m.put("lo", lo.toString); m.put("hi", hi.toString)
          case ColStat.Strings(lo, hi) =>
            m.put("t", "s"); m.put("lo", lo); m.put("hi", hi)
          case ColStat.Count(n) => m.put("t", "n"); m.put("n", n.toString)
          case ColStat.Empty => m.put("t", "e")
        }
        name -> (m: Any)
      }.asJava
    }.asJava

  private def nodeToBatches(root: com.fasterxml.jackson.databind.JsonNode)
      : Seq[Map[String, ColStat]] =
    (0 until root.size()).map { bi =>
      val b = root.get(bi)
      b.properties().asScala.map { e =>
        val n = e.getValue
        val stat = n.get("t").asText() match {
          case "l" => ColStat.Longs(n.get("lo").asText().toLong,
            n.get("hi").asText().toLong)
          case "d" => ColStat.Doubles(n.get("lo").asText().toDouble,
            n.get("hi").asText().toDouble)
          case "s" => ColStat.Strings(n.get("lo").asText(), n.get("hi").asText())
          case "n" => ColStat.Count(n.get("n").asText().toLong)
          case _ => ColStat.Empty
        }
        e.getKey -> stat
      }.toMap
    }

  def toJson(batches: Seq[Map[String, ColStat]]): String =
    mapper.writeValueAsString(batchesToNode(batches))

  def fromJson(json: String): Seq[Map[String, ColStat]] =
    nodeToBatches(mapper.readTree(json))

  // ---- merged per-directory stats ------------------------------------------
  // One `_stats.json` per directory maps part NAME -> (byte length, batches).
  // The merged file is a planning CACHE over the per-part sidecars: at 10⁵
  // parts, one read replaces 10⁵ driver round-trips (parquet keeps row-group
  // stats in each file's footer and still pays one footer fetch per file;
  // merging is the step the sidecar design makes possible). Correctness
  // guards, in order: (1) entries are keyed by part name AND validated
  // against the discovered file LENGTH — a replaced/rewritten part stops
  // matching and falls back to its own sidecar; (2) the file is written
  // whole via create(overwrite) — a torn write fails JSON parsing and the
  // whole merged file is ignored; (3) concurrent appenders can lose an
  // update (read-modify-write race), which only UNCOVERS the lost files —
  // sidecars remain the per-part source of truth.

  /** Reserved merged-stats file name (underscore prefix: ignored by file
    * listings the same way _SUCCESS is). */
  val MergedName = "_stats.json"

  /** Parts map of a directory's merged stats file; empty if absent/torn. */
  def readMerged(fs: org.apache.hadoop.fs.FileSystem,
                 dir: org.apache.hadoop.fs.Path)
      : Map[String, (Long, Seq[Map[String, ColStat]])] = {
    val p = new org.apache.hadoop.fs.Path(dir, MergedName)
    try {
      if (!fs.exists(p)) Map.empty
      else {
        val in = fs.open(p)
        val txt =
          try new String(
            org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          finally in.close()
        val root = mapper.readTree(txt).get("parts")
        root.properties().asScala.map { e =>
          e.getKey -> (e.getValue.get("len").asText().toLong,
            nodeToBatches(e.getValue.get("batches")))
        }.toMap
      }
    } catch { case _: Exception => Map.empty } // torn/foreign file: no cache
  }

  /** Read-modify-write the directory's merged stats: drop `remove` names,
    * add/replace `add` entries. Failures are swallowed — the merged file is
    * a cache; sidecars carry the truth. */
  def upsertMerged(fs: org.apache.hadoop.fs.FileSystem,
                   dir: org.apache.hadoop.fs.Path,
                   add: Map[String, (Long, Seq[Map[String, ColStat]])],
                   remove: Set[String] = Set.empty,
                   replaceAll: Boolean = false): Unit =
    try {
      val base = if (replaceAll) Map.empty[String, (Long, Seq[Map[String, ColStat]])]
                 else readMerged(fs, dir)
      val parts = (base -- remove) ++ add
      val node = new java.util.LinkedHashMap[String, Any]()
      val pm = new java.util.LinkedHashMap[String, Any]()
      parts.toSeq.sortBy(_._1).foreach { case (name, (len, batches)) =>
        val e = new java.util.LinkedHashMap[String, Any]()
        e.put("len", len.toString)
        e.put("batches", batchesToNode(batches))
        pm.put(name, e)
      }
      node.put("parts", pm)
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, MergedName), true)
      try out.write(mapper.writeValueAsString(node).getBytes("UTF-8"))
      finally out.close()
    } catch { case _: Exception => () }

  /** Stats for each file (absolute path string, discovered length), merged
    * files first: one `_stats.json` read per DIRECTORY covers every entry
    * whose (name, length) matches; only uncovered files pay a per-file
    * sidecar read. All remote reads run on a bounded pool — the planning
    * bound is O(directories) + O(uncovered files), not O(files). */
  def loadForFiles(conf: org.apache.hadoop.conf.Configuration,
                   files: Seq[(String, Long)])
      : Map[String, Option[Seq[Map[String, ColStat]]]] = {
    if (files.isEmpty) return Map.empty
    import org.apache.hadoop.fs.Path
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, files.size)))
    try {
      val byDir = files.groupBy(f => new Path(f._1).getParent.toString)
      val mergedFuts = byDir.keys.toSeq.map { d =>
        d -> pool.submit(new java.util.concurrent.Callable[
            Map[String, (Long, Seq[Map[String, ColStat]])]] {
          def call() = {
            val dir = new Path(d)
            readMerged(dir.getFileSystem(conf), dir)
          }
        })
      }.toMap
      val merged = mergedFuts.map { case (d, fu) => d -> fu.get() }
      val fromMerged: Map[String, Option[Seq[Map[String, ColStat]]]] =
        files.flatMap { case (f, len) =>
          val p = new Path(f)
          merged(p.getParent.toString).get(p.getName) match {
            case Some((l, batches)) if l == len => Some(f -> Some(batches))
            case _ => None
          }
        }.toMap
      val uncovered = files.filterNot { case (f, _) => fromMerged.contains(f) }
      val sidecarFuts = uncovered.map { case (f, _) =>
        f -> pool.submit(new java.util.concurrent.Callable[
            Option[Seq[Map[String, ColStat]]]] {
          def call() = {
            val p = new Path(new Path(f).getParent,
              new Path(f).getName + ".stats.json")
            try {
              val fs = p.getFileSystem(conf)
              if (!fs.exists(p)) None
              else {
                val in = fs.open(p)
                try Some(fromJson(new String(
                  org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
                  "UTF-8")))
                finally in.close()
              }
            } catch { case _: Exception => None } // bad sidecar = no stats
          }
        })
      }
      fromMerged ++ sidecarFuts.map { case (f, fu) => f -> fu.get() }
    } finally pool.shutdown()
  }

  // ---- pruning -------------------------------------------------------------

  /** True when `filters` PROVE no row of a batch with `stats` can match.
    * Conservative: unknown columns/filters never prune. */
  def batchProvablyEmpty(stats: Map[String, ColStat],
                         filters: Seq[org.apache.spark.sql.sources.Filter])
      : Boolean =
    filters.exists(f => filterImpossible(stats, f))

  private def filterImpossible(stats: Map[String, ColStat],
                               f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(c, v) => outside(stats.get(c), v, eqImpossible)
      case GreaterThan(c, v) => outside(stats.get(c), v, gtImpossible)
      case GreaterThanOrEqual(c, v) => outside(stats.get(c), v, geImpossible)
      case LessThan(c, v) => outside(stats.get(c), v, ltImpossible)
      case LessThanOrEqual(c, v) => outside(stats.get(c), v, leImpossible)
      case And(l, r) => filterImpossible(stats, l) || filterImpossible(stats, r)
      case Or(l, r) => filterImpossible(stats, l) && filterImpossible(stats, r)
      case In(c, vs) if vs.nonEmpty =>
        vs.forall(v => outside(stats.get(c), v, eqImpossible))
      case _ => false
    }
  }

  // (lo, hi, v) -> batch cannot satisfy the comparison
  private type Rule = (Any, Any, Any) => Boolean
  private val eqImpossible: Rule = (lo, hi, v) => lt(v, lo) || lt(hi, v)
  private val gtImpossible: Rule = (_, hi, v) => !lt(v, hi) // hi <= v
  private val geImpossible: Rule = (_, hi, v) => lt(hi, v)
  private val ltImpossible: Rule = (lo, _, v) => !lt(lo, v) // lo >= v
  private val leImpossible: Rule = (lo, _, v) => lt(v, lo)

  private def outside(stat: Option[ColStat], value: Any, rule: Rule): Boolean =
    stat match {
      case Some(ColStat.Empty) => true // zero non-null values: nothing matches
      case Some(ColStat.Longs(lo, hi)) => norm(value) match {
        case Some(v: Long) => rule(lo, hi, v)
        case _ => false
      }
      case Some(ColStat.Doubles(lo, hi)) => norm(value) match {
        case Some(v: Long) => rule(lo, hi, v.toDouble)
        case Some(v: Double) => rule(lo, hi, v)
        case _ => false
      }
      case Some(ColStat.Strings(lo, hi)) => value match {
        case s: String => rule(lo, hi, s)
        case u: org.apache.spark.unsafe.types.UTF8String => rule(lo, hi, u.toString)
        case _ => false
      }
      case _ => false
    }

  private def norm(v: Any): Option[Any] = v match {
    case b: java.lang.Byte => Some(b.longValue())
    case s: java.lang.Short => Some(s.longValue())
    case i: java.lang.Integer => Some(i.longValue())
    case l: java.lang.Long => Some(l.longValue())
    case f: java.lang.Float => Some(f.doubleValue())
    case d: java.lang.Double => Some(d.doubleValue())
    // date filter values compare against the epoch-day Longs the
    // collector records
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Double, y: Double) => x < y
    case (x: String, y: String) => utf8Lt(x, y) // see Collector.lt
    case _ => false
  }

  /** UTF-8 byte-order comparison — the ordering Spark's UTF8String (and
    * therefore every pushed string predicate) uses. One definition for
    * the collector and the pruning compare, or they would drift. */
  private[graft] def utf8Lt(a: String, b: String): Boolean =
    utf8Cmp(a, b) < 0

  /** Three-way form for callers that need the sign once (partition
    * pruning compares per leaf per predicate — two [[utf8Lt]] calls
    * would encode both strings twice over). */
  private[graft] def utf8Cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Exact row count for a file set from the Count stats, merged-first:
    * Some only when EVERY file's every batch carries a count — a partial
    * sum would mislead a caller worse than none. Shared by both
    * connectors' numRows statistics. */
  def exactRowCount(conf: org.apache.hadoop.conf.Configuration,
                    files: Seq[(String, Long)]): Option[Long] = {
    if (files.isEmpty) return Some(0L)
    val stats = loadForFiles(conf, files)
    val perFile = files.map { case (f, _) =>
      stats.getOrElse(f, None).flatMap { batches =>
        val ns = batches.flatMap(_.get(RowCountKey))
          .collect { case ColStat.Count(n) => n }
        if (ns.size == batches.size) Some(ns.sum) else None
      }
    }
    if (perFile.forall(_.isDefined)) Some(perFile.flatten.sum) else None
  }

  /** Backfill stats sidecars (and each directory's merged cache) for a
    * snapshotted table's live files that LACK coverage — the missing half
    * of adopt(): adoption references foreign files in place but they
    * carry no sidecars, so the adopted table plans with zero skipping,
    * no exact row counts, and no aggregate pushdown until this pass runs
    * (the ANALYZE of this tier, a maintenance job like
    * [[FeatherBloom.build]]). Face auto-detected from the manifest, like
    * every maintenance pass. One task per UNCOVERED file; each task
    * decodes only the stats-tracked columns ([[trackedType]]) and emits
    * ONE stats batch for the whole file — batch-level granularity needs
    * writer cooperation, file-level is what foreign files can have
    * (parquet footer granularity, supplied from outside the format).
    * Idempotent: covered files are skipped. Returns files backfilled. */
  def backfill(spark: org.apache.spark.sql.SparkSession, path: String): Int = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(graft.sources.FeatherSnapshots.enabled(fs, root),
      s"stats backfill on $path, which has no snapshots — the pass " +
        "follows the manifest's live files; adopt() or write with " +
        "option(\"snapshots\", \"true\") first")
    val snap = graft.sources.FeatherSnapshots.resolve(fs, root, None)
      .getOrElse(sys.error(s"stats backfill on $path: no snapshot versions"))
    val face = ConnectorFace.detect(snap.files, "stats backfill", path)
    val files = snap.files.map { case (rel, len) =>
      (new Path(root, rel).toString, len) }
    val covered = loadForFiles(conf, files)
    val uncovered = files.filter { case (f, _) =>
      covered.getOrElse(f, None).isEmpty }
    if (uncovered.isEmpty) return 0
    val fullSchema = face.mergedSchema(spark, files)
    // project to the tracked columns: the count still covers every row,
    // and untracked columns would only be decoded to be ignored
    val proj = StructType(fullSchema.fields.filter(f => trackedType(f.dataType)))
    require(proj.nonEmpty,
      s"stats backfill on $path: no stats-trackable column in " +
        s"(${fullSchema.fieldNames.mkString(", ")})")
    val names = proj.fieldNames.toSeq
    val readerJson = face.readerJson(spark, files)
    val confMap = GraftHadoop.confBroadcast(spark)
    val results = spark.sparkContext
      .parallelize(uncovered, uncovered.size).map { case (f, len) =>
        val execConf = new org.apache.hadoop.conf.Configuration(false)
        confMap.value.foreach { case (k, v) => execConf.set(k, v) }
        val open = new java.util.ArrayList[AutoCloseable]()
        try {
          val it = face.fileRows(execConf, readerJson, f, len, names,
            open.add(_): Unit, open.remove(_): Unit)
          val c = new Collector(proj)
          it.foreach(c.observe)
          val statsJson = toJson(Seq(c.snapshotAndReset()))
          val pfs = new Path(f).getFileSystem(execConf)
          val sc = pfs.create(new Path(f + ".stats.json"), true)
          try sc.write(statsJson.getBytes("UTF-8")) finally sc.close()
          (f, len, statsJson)
        } finally {
          open.asScala.foreach(r =>
            try r.close() catch { case _: Exception => () })
        }
      }.collect()
    // fold the new sidecars into each directory's merged cache so the
    // planner's O(directories) fast path covers them immediately
    results.groupBy { case (f, _, _) => new Path(f).getParent }
      .foreach { case (dir, entries) =>
        upsertMerged(fs, dir, entries.map { case (f, len, js) =>
          new Path(f).getName -> (len, fromJson(js)) }.toMap)
      }
    results.length
  }
}
