package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

import graft.sources.FeatherSnapshots

/** Per-file Bloom sidecars (`<part>.bloom`) over a chosen key column —
  * the POINT-LOOKUP index the min/max skipping stats can't be.
  *
  * Why: a takedown/delete list is typically a set of SCATTERED ids whose
  * range spans the whole table, so range pruning touches every file even
  * on a perfectly clustered layout. A per-file bloom answers "could this
  * file contain key k" for individual keys: the mutation probe
  * ([[FeatherMutations]]) drops every candidate file whose bloom
  * excludes all probe keys, typically reducing a scattered delete from
  * all-files to only-the-files-that-matter (at the sidecar's false-
  * positive rate).
  *
  * `build` is a maintenance pass like clustering: one distributed job
  * reads ONLY the key column of each live file and writes one bloom
  * sidecar beside it (idempotent; re-run after heavy ingest, or follow
  * every `cluster()`). Sidecars are advisory exactly like the stats
  * sidecars — a missing/stale bloom costs pruning, never correctness
  * (stale = name/len no longer matching is impossible since parts are
  * immutable; a sidecar simply absent means the file stays a candidate).
  * Integral AND string key columns (takedown lists are just as often
  * string doc-ids as numeric ids; string keys hash their UTF-8 bytes,
  * the same bytes Spark's BloomFilter.putString hashes); the fpp is
  * sized for the file's actual row count.
  */
object FeatherBloom {

  val Suffix = ".bloom"
  private val Fpp = 0.001

  /** Header: the key column AND the part's byte length the bloom was
    * built over — a probe on a different column ignores the sidecar, and
    * (like the merged-stats length validation) a bloom left beside a
    * same-name part of different content is rejected rather than trusted
    * into mis-pruning. */
  private def write(fs: org.apache.hadoop.fs.FileSystem, part: Path,
                    partLen: Long, keyCol: String, bloom: BloomFilter): Unit = {
    val out = fs.create(new Path(part.getParent, part.getName + Suffix), true)
    try {
      val colBytes = keyCol.getBytes("UTF-8")
      out.writeInt(colBytes.length)
      out.write(colBytes)
      out.writeLong(partLen)
      bloom.writeTo(out)
    } finally out.close()
  }

  /** Load a part's bloom if present, built over `keyCol`, and matching
    * the part's current length. */
  private[graft] def load(conf: org.apache.hadoop.conf.Configuration,
                          partPath: String, partLen: Long,
                          keyCol: String): Option[BloomFilter] = {
    val p = new Path(partPath + Suffix)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    try {
      val in = fs.open(p)
      try {
        val n = in.readInt()
        val colBytes = new Array[Byte](n)
        in.readFully(colBytes)
        if (new String(colBytes, "UTF-8") != keyCol) None
        else if (in.readLong() != partLen) None // stale: part was replaced
        else Some(BloomFilter.readFrom(in))
      } finally in.close()
    } catch { case _: Exception => None } // torn/foreign sidecar: no pruning
  }

  /** Point-lookup exclusion verdict for ONE file against a conjunction of
    * point filters: true when any filter's column has a sidecar excluding
    * every candidate value. Loads each named column's sidecar at most
    * ONCE per call — several point filters on the same column (or the
    * caller's short-circuit order) must not re-open and re-parse the same
    * sidecar k times per file. */
  private[graft] def excludesFile(conf: org.apache.hadoop.conf.Configuration,
                                  partPath: String, partLen: Long,
                                  pointFilters: Seq[(String, Seq[Any])])
      : Boolean = {
    val cache = scala.collection.mutable.Map.empty[String, Option[BloomFilter]]
    pointFilters.exists { case (attr, keys) =>
      cache.getOrElseUpdate(attr, load(conf, partPath, partLen, attr))
        .exists(b => keys.forall {
          case k: Long => !b.mightContainLong(k)
          case s: String => !b.mightContainString(s)
          case _ => false // unknown key shape: cannot prove exclusion
        })
    }
  }

  /** Build (or rebuild) bloom sidecars for every live file of a
    * snapshotted table, over an integral or STRING key column. Face
    * auto-detected from the manifest (the `suffix` parameter is retained
    * for source compatibility and ignored). One task per file; each
    * task decodes only the key column. Returns files indexed. */
  def build(spark: SparkSession, path: String, keyCol: String,
            suffix: String = ".feather"): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(FeatherSnapshots.enabled(fs, root),
      s"bloom build on $path, which has no snapshots — the index follows " +
        "the manifest's live files; write with option(\"snapshots\", \"true\")")
    val snap = FeatherSnapshots.resolve(fs, root, None).getOrElse(
      sys.error(s"bloom build on $path: no snapshot versions"))
    val face = ConnectorFace.detect(snap.files, "bloom build", path)
    val files = snap.files.map { case (rel, len) =>
      (new Path(root, rel).toString, len) }
    val keyType = face.mergedSchema(spark, files)
      .fields.find(_.name == keyCol).map(_.dataType)
      .getOrElse(throw new IllegalArgumentException(
        s"bloom build: column '$keyCol' not in table schema"))
    val isString = keyType == org.apache.spark.sql.types.StringType
    require(isString || Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(keyType),
      s"bloom build: '$keyCol' must be an integral or string column, " +
        s"got ${keyType.catalogString}")
    val readerJson = face.readerJson(spark, files)
    val confMap = GraftHadoop.confBroadcast(spark)
    spark.sparkContext.parallelize(files, files.size).map { case (f, len) =>
      val execConf = new org.apache.hadoop.conf.Configuration(false)
      confMap.value.foreach { case (k, v) => execConf.set(k, v) }
      val open = new java.util.ArrayList[AutoCloseable]()
      try {
        import scala.jdk.CollectionConverters._
        def rows(): Iterator[org.apache.spark.sql.Row] =
          face.fileRows(execConf, readerJson, f, len, Seq(keyCol),
            open.add(_): Unit, open.remove(_): Unit)
        // size the filter from the part's stats sidecar when present
        // (exact per-batch counts); only a sidecar-less part pays a
        // counting pass over the key column
        val n = FeatherStats.exactRowCount(execConf, Seq((f, len)))
          .getOrElse {
            var c = 0L
            rows().foreach(_ => c += 1)
            c
          }
        val bloom = BloomFilter.create(math.max(1L, n), Fpp)
        rows().foreach { r =>
          if (!r.isNullAt(0)) {
            if (isString) bloom.putString(r.getString(0))
            else bloom.putLong(r.get(0).asInstanceOf[Number].longValue())
          } }
        val pfs = new Path(f).getFileSystem(execConf)
        write(pfs, new Path(f), len, keyCol, bloom)
        1
      } finally {
        import scala.jdk.CollectionConverters._
        open.asScala.foreach(r => try r.close() catch { case _: Exception => () })
      }
    }.sum().toInt
  }
}
