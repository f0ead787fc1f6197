package graft.sources

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** WRITE-SIDE schema evolution for the connector sinks — the Delta
  * `option("mergeSchema", "true")` contract. The sinks pass the incoming
  * frame's schema straight through to self-describing part files
  * (supportsExternalMetadata hands Spark the frame schema as the table
  * schema for writes, so the analyzer's output-resolution check is
  * vacuous here); without a sink-side gate an append could silently land
  *
  *  - NEW columns (schema widens without the operator asking),
  *  - MISSING columns (rows that read null where the table has data), or
  *  - TYPE CONFLICTS (the merged read then fails loudly BY DESIGN — the
  *    table is effectively bricked until the offending files are removed).
  *
  * The gate: an append whose schema differs from the table's must carry
  * `option("mergeSchema", "true")` to widen (new columns join the union
  * schema; older generations read them as null — the read-side
  * mergeSchema contract) or to narrow (missing columns read as null in
  * the new rows); a TYPE CHANGE on an existing column is refused
  * unconditionally — merged reads refuse type drift loudly rather than
  * silently coerce, so the write must too (rewrite via cluster() to
  * retype). OVERWRITE is ungated: it replaces the table definition, and
  * retained generations still time-travel with their own schema.
  *
  * Mid-stream widening: a running CDF/snapshot stream pins its schema at
  * start; an evolved append mid-stream align-casts into the pinned shape
  * (new columns invisible until the stream restarts) — the documented
  * contract in [[graft.io.FeatherChanges]]. `changesSince` and fresh
  * streams serve the widened head schema immediately.
  *
  * Known race (documented, not closed): validation is check-then-act —
  * two concurrent OPTED-IN appends that introduce the SAME new column
  * with DIFFERENT types can both pass the gate and both commit (blind
  * appends commute by design), leaving a type conflict the merged read
  * then refuses loudly. Closing it would need schema actions in the
  * commit log itself (the Delta design); with footer-defined schemas
  * the recovery is explicit — delete or rewrite one side's files. The
  * window requires two writers racing a schema CHANGE of one column
  * within one validation interval, and the failure is loud, never
  * silent. */
private[graft] object WriteSchemaEvolution {

  /** Nullability-insensitive structural type equality (Spark's sameType
    * is private[sql]; the write gate must not refuse a nullable-vs-
    * required re-append of the same physical type). */
  private def eqType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
        f.name == g.name && eqType(f.dataType, g.dataType) }
    case (x: ArrayType, y: ArrayType) => eqType(x.elementType, y.elementType)
    case (x: MapType, y: MapType) =>
      eqType(x.keyType, y.keyType) && eqType(x.valueType, y.valueType)
    case _ => a == b
  }

  /** The sink-side gate, one definition for every face (a per-sink copy
    * drifted within a day of being written): resolve the existing table
    * — manifest head or legacy listing — and validate the incoming
    * frame against its UNION data schema. The union is the only sound
    * authority: any single file's footer can disagree with it (the
    * oldest generation predates evolved columns; the newest file can be
    * a narrowing append), so a "fast path" against one footer would let
    * un-opted schema changes through on evolved tables. Snapshotted
    * tables read the union from [[graft.io.FeatherChanges]]'
    * incrementally-maintained head-schema cache (one footer per appended
    * file amortized); legacy directories pay one bounded-pool sweep.
    * Absent/empty tables pass (first write defines the schema); IO
    * failures PROPAGATE — a transient error must never silently disable
    * the gate. */
  def validateSinkAppend(spark: org.apache.spark.sql.SparkSession,
                         path: String, writeSchema: StructType,
                         mergeSchema: Boolean,
                         suffixes: Seq[String]): Unit = {
    val rootP = new org.apache.hadoop.fs.Path(path)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return
    val union: Option[StructType] =
      if (FeatherSnapshots.enabled(fs, rootP) &&
          FeatherSnapshots.latestVersion(fs, rootP).isDefined)
        Some(graft.io.FeatherChanges.headDataSchema(spark, path))
      else {
        val files = FeatherSnapshots.listDataFiles(fs, rootP, suffixes)
        if (files.isEmpty) None else Some(legacyUnion(spark, path, rootP,
          files))
      }
    union.foreach(u => validateAppend(path, writeSchema, mergeSchema, u,
      caseSensitive = spark.sessionState.conf.caseSensitiveAnalysis))
  }

  /** Per-directory union-schema cache for LEGACY (non-snapshot) tables:
    * (file name set, schema). Data files are immutable, so when the
    * cached names are a subset of the current listing the union is the
    * cached schema merged with the NEW files' footers — one footer per
    * appended file amortized, the same incremental shape the snapshot
    * path gets from FeatherChanges' head-schema cache (without it, a
    * periodic ingest job appending to a 50k-part legacy directory would
    * pay a 50k-footer sweep per batch). A shrunk listing (files deleted)
    * rebuilds fully. LRU-capped; worst case is a full re-sweep, never
    * a wrong answer. */
  private val legacyCache =
    new graft.io.LruMap[String, (Set[(String, Long)], StructType)](() => 32)

  private def legacyUnion(spark: org.apache.spark.sql.SparkSession,
                          path: String,
                          rootP: org.apache.hadoop.fs.Path,
                          files: Seq[(String, Long)]): StructType = {
    def abs(fl: Seq[(String, Long)]) = fl.map { case (rel, len) =>
      (new org.apache.hadoop.fs.Path(rootP, rel).toString, len) }
    val face = graft.io.ConnectorFace.detect(files, "append", path)
    // keyed on (name, LENGTH) pairs, matching the stats tier's staleness
    // rule: a directory replaced out-of-band with identically-NAMED files
    // must not be served the dead table's schema (a name-only key would
    // skip every footer and admit a type-conflicting append)
    val entries = files.toSet
    val key = rootP.toString
    val cached = legacyCache.get(key)
    val union = cached match {
      case Some((known, schema)) if known.subsetOf(entries) =>
        val fresh = files.filterNot(known)
        if (fresh.isEmpty) schema
        else graft.io.FeatherChanges.mergeDataSchemas(schema,
          face.mergedSchema(spark, abs(fresh)), path)
      case _ => face.mergedSchema(spark, abs(files))
    }
    legacyCache.put(key, (entries, union))
    union
  }

  /** Validate an APPEND frame schema against the table's union schema.
    * Under case-INsensitive analysis (Spark's default) a column whose
    * spelling differs from the table's only by case is refused outright
    * — landing it would put both spellings in the union and every
    * `SELECT thatColumn` dies AMBIGUOUS_REFERENCE (the storage unions
    * footers by exact name; the gate must enforce the resolver's
    * equivalence). */
  def validateAppend(path: String, writeSchema: StructType,
                     mergeSchema: Boolean, union: StructType,
                     caseSensitive: Boolean = false): Unit = {
    if (!caseSensitive) {
      // the frame itself must not carry two spellings of one name — both
      // would land and every read of either dies AMBIGUOUS_REFERENCE
      writeSchema.fields.groupBy(_.name.toLowerCase(java.util.Locale.ROOT))
        .foreach { case (_, fs) => require(fs.length == 1,
          s"append to $path: the frame carries columns that differ only " +
            s"by case (${fs.map(_.name).mkString(", ")}) — under " +
            "case-insensitive analysis they collide on every read") }
      val tableByLower = union.fields
        .groupBy(_.name.toLowerCase(java.util.Locale.ROOT))
      writeSchema.fields.foreach { f =>
        val lower = f.name.toLowerCase(java.util.Locale.ROOT)
        tableByLower.get(lower).foreach { matches =>
          require(matches.exists(_.name == f.name),
            s"append to $path: column '${f.name}' differs from the " +
              s"table's '${matches.head.name}' only by case — under " +
              "case-insensitive analysis both spellings would collide " +
              "(AMBIGUOUS_REFERENCE on every read); rename the frame's " +
              "column to the table's spelling")
        }
      }
    }
    def norm(st: StructType): Map[String, DataType] =
      st.fields.map(f => f.name -> f.dataType).toMap
    val w = norm(writeSchema)
    val t = norm(union)
    if (t.keySet == w.keySet &&
        t.forall { case (k, dt) => eqType(dt, w(k)) }) return
    val conflicts = w.keys.toSeq.sorted.filter(k =>
      t.contains(k) && !eqType(t(k), w(k)))
    require(conflicts.isEmpty,
      s"append to $path: column type change is not supported — " +
        conflicts.map(k => s"'$k' ${t(k).catalogString} -> " +
          s"${w(k).catalogString}").mkString(", ") +
        " (merged reads refuse type drift loudly rather than coerce; " +
        "rewrite the table — cluster()/compact — to retype, or cast the " +
        "frame to the table's types)")
    val extra = (w.keySet -- t.keySet).toSeq.sorted
    val missing = (t.keySet -- w.keySet).toSeq.sorted
    if ((extra.nonEmpty || missing.nonEmpty) && !mergeSchema)
      throw new IllegalArgumentException(
        s"append to $path: the frame's schema differs from the table's" +
          (if (extra.nonEmpty)
            s" — new column(s) ${extra.mkString(", ")}" else "") +
          (if (missing.nonEmpty)
            s" — missing column(s) ${missing.mkString(", ")}" else "") +
          ". Set option(\"mergeSchema\", \"true\") to evolve the schema " +
          "on write (new columns read as null in older rows; missing " +
          "columns read as null in the new rows), or align the frame")
  }
}
