package graft.extensions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampType}

import graft.sources.FeatherTimeTravel

/** SQL READS and INSERTS over graft tables — the half of the SQL story
  * the DML rule ([[GraftMergeIntoRule]]) does not claim:
  *
  * {{{
  *   SELECT * FROM graft.`/t`                           -- head read
  *   SELECT * FROM graft.`/t` VERSION AS OF 3           -- time travel
  *   SELECT * FROM graft.`/t` TIMESTAMP AS OF '2024-06-01 12:00:00'
  *   INSERT INTO graft.`/t` SELECT ...                  -- blind append
  *   INSERT INTO graft.`/t` (id, amt) SELECT ...        -- column list
  *   INSERT OVERWRITE graft.`/t` PARTITION (day='d1') SELECT ...
  *   TRUNCATE TABLE graft.`/t`                          -- manifest-only
  *   ALTER TABLE graft.`/t` ADD COLUMNS (score DOUBLE)  -- stamp-only
  * }}}
  *
  * Spark's OWN parser produces the plans (UnresolvedRelation /
  * RelationTimeTravel / InsertIntoStatement); this resolution rule
  * claims the `graft.`-qualified path spelling (`graft_dv.` is
  * accepted as an alias — the strategy faces only differ where a
  * mutation can mask) and lowers reads onto the face-dispatched
  * snapshot read ([[graft.io.TableReads]]) and inserts onto the
  * append/overwrite commit ([[graft.io.TableInserts]]). Everything
  * else passes through untouched for Spark's catalog machinery.
  *
  * Reads claim ANYWHERE in a query (joins, subqueries, CTEs, a MERGE's
  * USING side) — with one carve-out: a graft-target DML statement's
  * target relation belongs to [[GraftMergeIntoRule]] (registered
  * earlier in the same batch), so those statements pass through here
  * whole. Time travel pins the version at PLAN time: the frame keeps
  * reading that version's files even if the table commits underneath
  * the running query.
  *
  * INSERT keeps the Command contract ([[GraftDmlCommand]]): eager,
  * exactly once, at statement issue; re-collect replays the cached
  * one-row report; EXPLAIN never mutates. */
private[extensions] class GraftSqlRelationsRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import org.apache.spark.sql.graft.Bridge
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
  import graft.catalog.GraftTable

  private val Faces = Set("graft", "graft_dv")

  /** With a GraftCatalog registered under the face name, bare
    * single-segment names belong to the CATALOG (a miss must surface
    * Spark's TABLE_OR_VIEW_NOT_FOUND, not a relative-path read); the
    * rules claim only path-shaped spellings then. Without a catalog,
    * every spelling claims as before. */
  private def claimablePath(face: String, name: String): Boolean =
    name.contains("/") || name.contains("://") ||
      spark.conf.getOption(s"spark.sql.catalog.${face.toLowerCase}").isEmpty

  /** Catalog-resolved graft relation ([[graft.catalog.GraftCatalog]]):
    * the analyzer resolved the name through the PUBLIC catalog
    * machinery; the rules lower the resolved relation onto the same
    * engine paths the path spellings use. */
  private def graftRelOf(t: LogicalPlan)
      : Option[(GraftTable, DataSourceV2Relation)] = t match {
    case SubqueryAlias(_, child) => graftRelOf(child)
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable => Some((g, r))
      case _ => None
    }
    case _ => None
  }

  /** `graft.`/`graft_dv.`-qualified path relation (through an alias). */
  private def pathOf(t: LogicalPlan): Option[String] = t match {
    case SubqueryAlias(_, child) => pathOf(child)
    case UnresolvedRelation(parts, _, _)
        if parts.length == 2 && Faces(parts.head.toLowerCase) &&
          claimablePath(parts.head, parts(1)) =>
      Some(parts(1))
    case _ => None
  }

  /** `graft.`-qualified path in an UnresolvedTable (DDL statements name
    * tables through this node, not UnresolvedRelation). */
  private def tablePathOf(t: LogicalPlan): Option[String] = t match {
    case org.apache.spark.sql.catalyst.analysis
        .UnresolvedTable(parts, _, _)
        if parts.length == 2 && Faces(parts.head.toLowerCase) &&
          claimablePath(parts.head, parts(1)) =>
      Some(parts(1))
    case _ => None
  }

  /** DDL target: the path spelling (UnresolvedTable) or a
    * catalog-resolved table — ONE extractor for every DDL case below
    * (the orElse chain was copy-pasted a dozen times before). */
  private def ddlPathOf(t: LogicalPlan): Option[String] =
    tablePathOf(t).orElse(tovPathOf(t)).orElse(resolvedGraftPath(t))

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case i: InsertIntoStatement if pathOf(i.table).isDefined =>
      lowerInsert(i, pathOf(i.table).get)
    case t: TruncateTable if ddlPathOf(t.table).isDefined =>
      val path = ddlPathOf(t.table).get
      GraftDml.report(s"truncate($path)") { () =>
        graft.io.TableDdl.truncate(spark, path) }
    case a: AddColumns if ddlPathOf(a.table).isDefined =>
      lowerAddColumns(a, ddlPathOf(a.table).get)
    // the ADJACENT DDL spellings refuse LOUDLY with guidance — falling
    // through would hand them to Spark's catalog machinery, which
    // reports 'table not found' for a table every other graft statement
    // can see (the most confusing possible error)
    case TruncatePartition(tbl, _) if ddlPathOf(tbl).isDefined =>
      throw new IllegalArgumentException(
        s"TRUNCATE TABLE graft.`${ddlPathOf(tbl).get}` PARTITION " +
          "(...): partition-scoped truncate is not supported — use " +
          "DELETE FROM ... WHERE on the partition column, or INSERT " +
          "OVERWRITE ... PARTITION (k=v) with an empty query")
    case d: DescribeRelation if ddlPathOf(d.relation).isDefined =>
      lowerDescribe(d, ddlPathOf(d.relation).get)
    case d: DescribeColumn if ddlPathOf(d.relation).isDefined =>
      lowerDescribeColumn(d, ddlPathOf(d.relation).get)
    case s: ShowColumns if ddlPathOf(s.child).isDefined =>
      lowerShowColumns(s, ddlPathOf(s.child).get)
    // PATH spellings only: a catalog-resolved name runs through Spark's
    // own ShowPartitionsExec (GraftTable implements
    // SupportsPartitionManagement), which also serves the filtered
    // PARTITION (k=v) form and catalog-only sessions
    case s: ShowPartitions if tablePathOf(s.table)
        .orElse(tovPathOf(s.table)).isDefined =>
      val path = tablePathOf(s.table).orElse(tovPathOf(s.table)).get
      if (s.pattern.nonEmpty)
        throw new IllegalArgumentException(
          s"SHOW PARTITIONS graft.`$path` PARTITION (...): the " +
            "filtered form is not supported on the path spelling — " +
            "address the table by name, or filter the full listing")
      val parts = graft.io.TableDdl.showPartitions(spark, path)
      import org.apache.spark.unsafe.types.UTF8String
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(s.output,
        parts.map(p => org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(p))))
    case r: RepairTable if ddlPathOf(r.child).isDefined =>
      // MSCK REPAIR = ADOPT: build the v1 manifest from a plain
      // directory — the SQL spelling of the one-shot migration API
      // (an EXISTING table resolves through the catalog to a
      // ResolvedTable; adopt's own exactly-once contract refuses it)
      val path = ddlPathOf(r.child).get
      GraftDml.report(s"repair_table($path)") { () =>
        graft.io.TableDdl.repairTable(spark, path) }
    case a: AnalyzeTable if ddlPathOf(a.child).isDefined =>
      throw new IllegalArgumentException(
        s"ANALYZE TABLE graft.`${ddlPathOf(a.child).get}`: statistics " +
          "live in per-file sidecars, not a catalog — they are written " +
          "at write time and backfilled with " +
          "graft.io.FeatherStats backfill (the io_stats_backfill path); " +
          "nothing here needs ANALYZE")
    case s: ShowCreateTable if ddlPathOf(s.child).isDefined =>
      throw new IllegalArgumentException(
        s"SHOW CREATE TABLE graft.`${ddlPathOf(s.child).get}`: there " +
          "is no stored CREATE statement (a graft table is a path plus " +
          "manifests) — DESCRIBE TABLE EXTENDED prints the schema, " +
          "partitioning, and face")
    case ac: AlterTableCommand if ddlPathOf(ac.table).isDefined =>
      throw new IllegalArgumentException(
        s"ALTER TABLE graft.`${ddlPathOf(ac.table).get}`: this ALTER " +
          s"form (${ac.nodeName}) is not supported — only ADD COLUMNS " +
          "is. Column drops/renames/retypes would rewrite or remap " +
          "every footer (schema columns live in the data files, not a " +
          "catalog; widen with ADD COLUMNS, backfill with UPDATE, or " +
          "rewrite via replaceWhere), and table properties have no " +
          "catalog to live in (a graft table is a path plus manifests)")
    // ---- catalog-resolved V2 writes (GraftCatalog names) ------------------
    // Spark's own ResolveInsertInto built these from INSERT statements
    // over catalog-resolved graft relations (static PARTITION values
    // are already folded into the query, column lists and BY NAME into
    // isByName/projections); ACCEPT_ANY_SCHEMA kept the output resolver
    // from re-aligning, so TableInserts owns alignment exactly like the
    // path spelling
    case a: AppendData if graftRelOf(a.table).isDefined =>
      lowerV2Insert(graftRelOf(a.table).get._1, a.query, a.isByName,
        overwrite = false)
    case o: OverwriteByExpression if graftRelOf(o.table).isDefined =>
      lowerV2Overwrite(graftRelOf(o.table).get._1, o.query, o.isByName,
        o.deleteExpr)
    case o: OverwritePartitionsDynamic if graftRelOf(o.table).isDefined =>
      val g = graftRelOf(o.table).get._1
      if (!spark.conf.get("spark.sql.sources.partitionOverwriteMode",
          "static").equalsIgnoreCase("dynamic"))
        throw new IllegalArgumentException(
          s"overwritePartitions on graft table ${g.path}: set " +
            "spark.sql.sources.partitionOverwriteMode=dynamic — the " +
            "insert path scopes dynamic overwrites by that conf (the " +
            "SQL INSERT OVERWRITE spelling arrives here only when it " +
            "is already set)")
      lowerV2Insert(g, o.query, o.isByName, overwrite = true)
    // graft-target DML statements belong to GraftMergeIntoRule — never
    // resolve the target relation out from under it (its USING side
    // analyzes independently via ofRows, where this rule applies). The
    // catalog-resolved (DataSourceV2Relation) targets are carved out
    // the same way.
    case m: MergeIntoTable if pathOf(m.targetTable).isDefined ||
        graftRelOf(m.targetTable).isDefined => m
    case d: DeleteFromTable if pathOf(d.table).isDefined ||
        graftRelOf(d.table).isDefined => d
    case u: UpdateTable if pathOf(u.table).isDefined ||
        graftRelOf(u.table).isDefined => u
    case other => claimReads(other)
  }

  private def lowerV2Insert(g: GraftTable, query: LogicalPlan,
                            byName: Boolean,
                            overwrite: Boolean): LogicalPlan = {
    val q = Bridge.ofRows(spark, query)
    val op = if (overwrite) "insert_overwrite" else "insert_into"
    GraftDml.report(s"$op(${g.path})") { () =>
      graft.io.TableInserts.insert(spark, g.path, q,
        overwrite = overwrite, byName = byName)
    }
  }

  /** `INSERT OVERWRITE` over a catalog name, and DataFrameWriterV2's
    * `overwrite(condition)`: a TRUE filter replaces everything (the
    * whole-table overwrite commit); anything else is EXACTLY
    * replaceWhere — delete the filter's rows and insert the query, one
    * predicate-scoped atomic commit (a static `PARTITION (k=v)` spec
    * arrives as that equality filter). */
  private def lowerV2Overwrite(g: GraftTable, query: LogicalPlan,
                               byName: Boolean,
                               deleteExpr: Expression): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    deleteExpr match {
      case Literal(true, org.apache.spark.sql.types.BooleanType) =>
        lowerV2Insert(g, query, byName, overwrite = true)
      case _ =>
        val q0 = Bridge.ofRows(spark, query)
        // a POSITIONAL query arrives with its own column names (Spark's
        // output re-aligner is disabled by ACCEPT_ANY_SCHEMA, and the
        // analyzer already arranged the columns — static PARTITION
        // literals included — in table order), so rename positionally
        // onto the table schema before replaceWhere's by-name alignment
        val q = if (byName) q0 else {
          val names = g.schema().fieldNames.toSeq
          if (q0.columns.length != names.length)
            throw new IllegalArgumentException(
              s"INSERT OVERWRITE graft table ${g.path}: the query " +
                s"produces ${q0.columns.length} column(s) but the " +
                s"table has ${names.length} (${names.mkString(", ")}) " +
                "— a positional insert must supply every column " +
                "(static PARTITION values count); use BY NAME to " +
                "match by name instead")
          q0.toDF(names: _*)
        }
        // the filter resolved against the claimed relation — re-anchor
        // its references by NAME (replaceWhere evaluates over its own
        // unaliased working frame)
        val cond = Bridge.column(deleteExpr.transform {
          case ar: AttributeReference =>
            org.apache.spark.sql.catalyst.analysis
              .UnresolvedAttribute(Seq(ar.name))
        })
        GraftDml.report(s"replace_where(${g.path})") { () =>
          graft.io.PredicateMutations.replaceWhere(spark, g.path, q, cond)
        }
    }
  }

  private def claimReads(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      // RelationTimeTravel is a LEAF — its relation is not a child, so
      // the bare-relation case below never double-claims it
      case tt: RelationTimeTravel if pathOf(tt.relation).isDefined =>
        lowerTimeTravel(pathOf(tt.relation).get, tt.timestamp, tt.version)
      case r: UnresolvedRelation if pathOf(r).isDefined =>
        readPlan(pathOf(r).get, None, None)
      // catalog-resolved graft relation: the analyzer resolved the name
      // (and any VERSION/TIMESTAMP AS OF pin) through GraftCatalog's
      // public loadTable; swap in the face-dispatched snapshot read.
      // Surrounding operators may already reference this relation's
      // attribute ids (resolution interleaves within the fix-point), so
      // the fresh read is re-aliased ONTO the claimed output ids.
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val g = r.table.asInstanceOf[GraftTable]
        aliasOnto(r.output,
          graft.io.TableReads.read(spark, g.path, g.pinnedVersion, None)
            .queryExecution.analyzed)
    }

  /** Re-alias `fresh`'s columns onto the exprIds a claimed relation
    * already leaked into its surrounding plan. */
  private def aliasOnto(
      oldOutput: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      fresh: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    val resolver = spark.sessionState.analyzer.resolver
    Project(oldOutput.map { old =>
      val src = fresh.output.find(a => resolver(a.name, old.name))
        .getOrElse(throw new IllegalStateException(
          s"graft catalog read: column '${old.name}' is missing from " +
            s"the table read (${fresh.output.map(_.name).mkString(", ")})"))
      Alias(src, old.name)(exprId = old.exprId,
        qualifier = old.qualifier)
    }, fresh)
  }

  /** A fresh read plan per occurrence (a self-join's two branches must
    * not share attribute ids). */
  private def readPlan(path: String, versionAsOf: Option[Long],
                       tsMillis: Option[Long]): LogicalPlan =
    graft.io.TableReads.read(spark, path, versionAsOf, tsMillis)
      .queryExecution.logical

  private def lowerTimeTravel(path: String, ts: Option[Expression],
                              version: Option[String]): LogicalPlan = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"time travel on graft.`$path`: $msg")
    val versionAsOf: Option[Long] = version.map(v =>
      v.toLongOption.getOrElse(
        bad(s"VERSION AS OF '$v' is not an integer version")))
    val tsMillis: Option[Long] = ts.map {
      case e if e.resolved && e.foldable => e.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String =>
          FeatherTimeTravel.parseTsMillis(s.toString)
        case micros: java.lang.Long if e.dataType == TimestampType =>
          Math.floorDiv(micros, 1000L)
        case days: java.lang.Integer if e.dataType == DateType =>
          val zone = java.time.ZoneId.of(
            spark.conf.get("spark.sql.session.timeZone",
              java.util.TimeZone.getDefault.getID))
          java.time.LocalDate.ofEpochDay(days.toLong).atStartOfDay(zone)
            .toInstant.toEpochMilli
        case other =>
          bad(s"TIMESTAMP AS OF evaluates to $other " +
            s"(${e.dataType.catalogString}) — use a timestamp, date, " +
            "epoch-millis, or ISO/local-datetime string literal")
      }
      case e =>
        bad(s"TIMESTAMP AS OF ${e.sql} is not a literal — the version " +
          "pins at plan time, so the instant must fold")
    }
    readPlan(path, versionAsOf, tsMillis)
  }

  /** `graft.`-qualified path in an UnresolvedTableOrView (DESCRIBE /
    * DROP name tables through this node). */
  private def tovPathOf(t: LogicalPlan): Option[String] = t match {
    case org.apache.spark.sql.catalyst.analysis
        .UnresolvedTableOrView(parts, _, _)
        if parts.length == 2 && Faces(parts.head.toLowerCase) &&
          claimablePath(parts.head, parts(1)) =>
      Some(parts(1))
    case _ => None
  }

  /** Catalog-resolved table node (SHOW PARTITIONS / ANALYZE name their
    * target through ResolvedTable once GraftCatalog resolves it). */
  private def resolvedGraftPath(t: LogicalPlan): Option[String] = t match {
    case r: org.apache.spark.sql.catalyst.analysis.ResolvedTable =>
      r.table match {
        case g: GraftTable => Some(g.path)
        case _ => None
      }
    case _ => None
  }

  /** DESCRIBE [EXTENDED] — a metadata-only read resolved at plan time
    * (one snapshot + schema resolution, Spark's own output shape:
    * col_name / data_type / comment rows, the hive-style partition
    * section, and the detail block under EXTENDED). */
  private def lowerDescribe(d: DescribeRelation, path: String)
      : LogicalPlan = {
    if (d.partitionSpec.nonEmpty)
      throw new IllegalArgumentException(
        s"DESCRIBE graft.`$path` PARTITION (...): per-partition " +
          "describe is not supported — partition values are ordinary " +
          "columns here; SELECT DISTINCT them")
    val info = graft.io.TableDdl.describeInfo(spark, path)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = if (s == null) null else UTF8String.fromString(s)
    def row(n: String, t: String, c: String) =
      InternalRow(u(n), u(t), u(c))
    def colRows(st: org.apache.spark.sql.types.StructType) =
      st.fields.toSeq.map(f => row(f.name, f.dataType.simpleString,
        if (f.metadata.contains("comment"))
          f.metadata.getString("comment") else null))
    val partSection =
      if (info.partCols.isEmpty) Nil
      else row("# Partition Information", "", "") +:
        row("# col_name", "data_type", "comment") +:
        colRows(info.partSchema)
    val detail =
      if (!d.isExtended) Nil
      else Seq(row("", "", ""),
        row("# Detailed Table Information", "", ""),
        row("Location", path, null),
        row("Face", info.face, null),
        row("Version", info.version.toString, null),
        row("Data Files", info.files.toString, null),
        row("Deletion Vectors", info.dvs.toString, null))
    // Spark's own DESCRIBE shape: the MAIN section lists the FULL
    // schema (partition columns included), then the partition section
    // repeats them — consumers that parse rows up to the first '#'
    // marker must recover the whole schema
    val fullSchema = org.apache.spark.sql.types.StructType(
      info.dataSchema.fields ++ info.partSchema.fields)
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
      d.output, colRows(fullSchema) ++ partSection ++ detail)
  }

  /** `DESCRIBE graft.`/t` col` — Spark's info_name/info_value shape. */
  private def lowerDescribeColumn(d: DescribeColumn, path: String)
      : LogicalPlan = {
    val name = d.column match {
      case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if ua.nameParts.length == 1 => ua.nameParts.head
      // the catalog-resolved shape: the analyzer already bound the bare
      // name against the relation (nested fields arrive as extract
      // expressions and still refuse below)
      case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
      case other => throw new IllegalArgumentException(
        s"DESCRIBE graft.`$path` ${other.sql}: describe a top-level " +
          "column by its bare name")
    }
    val info = graft.io.TableDdl.describeInfo(spark, path)
    val all = info.dataSchema.fields ++ info.partSchema.fields
    val f = all.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"DESCRIBE graft.`$path` $name: no such column " +
          s"(${all.map(_.name).mkString(", ")})"))
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    def row(a: String, b: String) =
      InternalRow(UTF8String.fromString(a), UTF8String.fromString(b))
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(d.output,
      Seq(row("col_name", f.name),
        row("data_type", f.dataType.simpleString),
        row("comment", if (f.metadata.contains("comment"))
          f.metadata.getString("comment") else "NULL")))
  }

  /** `SHOW COLUMNS IN graft.`/t`` — one col_name column, full schema. */
  private def lowerShowColumns(s: ShowColumns, path: String)
      : LogicalPlan = {
    val info = graft.io.TableDdl.describeInfo(spark, path)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(s.output,
      (info.dataSchema.fields ++ info.partSchema.fields).toSeq.map(f =>
        InternalRow(UTF8String.fromString(f.name))))
  }

  private def lowerAddColumns(a: AddColumns, path: String): LogicalPlan = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"ALTER TABLE graft.`$path` ADD COLUMNS: $msg")
    val fields = a.columnsToAdd.map { qct =>
      if (qct.path.nonEmpty || qct.name.length > 1)
        bad(s"'${qct.name.mkString(".")}' is nested — only top-level " +
          "columns can be added (nested evolution would rewrite every " +
          "struct footer)")
      if (qct.position.nonEmpty)
        bad(s"'${qct.colName}' carries FIRST/AFTER — added columns " +
          "append at the end (footer order is the merge order)")
      if (qct.default.nonEmpty)
        bad(s"'${qct.colName}' carries a DEFAULT — existing footers " +
          "cannot record it; add the column nullable and backfill " +
          "with UPDATE")
      org.apache.spark.sql.types.StructField(qct.colName, qct.dataType,
        qct.nullable, qct.comment.map(c =>
          new org.apache.spark.sql.types.MetadataBuilder()
            .putString("comment", c).build())
          .getOrElse(org.apache.spark.sql.types.Metadata.empty))
    }
    GraftDml.report(s"add_columns($path)") { () =>
      graft.io.TableDdl.addColumns(spark, path, fields) }
  }

  private def lowerInsert(i: InsertIntoStatement,
                          path: String): LogicalPlan = {
    if (i.ifPartitionNotExists)
      throw new IllegalArgumentException(
        s"INSERT INTO graft.`$path`: IF NOT EXISTS is not supported — " +
          "overwrite semantics are per-statement, not per-partition-" +
          "existence")
    // the query analyzes independently (graft reads inside it resolve
    // through this same rule)
    val query = Bridge.ofRows(spark, i.query)
    val op = if (i.overwrite) "insert_overwrite" else "insert_into"
    GraftDml.report(s"$op($path)") { () =>
      graft.io.TableInserts.insert(spark, path, query,
        overwrite = i.overwrite, partitionSpec = i.partitionSpec,
        userCols = i.userSpecifiedCols, byName = i.byName)
    }
  }
}

/** `CREATE TABLE graft.`/t`` / `CREATE TABLE ... AS SELECT` — a
  * POST-HOC resolution rule, necessarily: by the time the resolution
  * batch finishes, Spark's OWN ResolveSessionCatalog + the Post-Hoc
  * batch's DataSourceAnalysis have lowered the parsed CreateTable onto
  * the session-catalog V1 commands (the 'graft' qualifier reads as a
  * database name), and custom post-hoc rules run AFTER DataSourceAnalysis
  * — so the V1 commands are the claim point, with the parsed spelling
  * recovered from the CatalogTable. Executing them unclaimed would hit
  * the session catalog's name validation with the most confusing
  * possible error for a table every other graft statement can see.
  *
  * Validation: the graft.`path` identifier IS the location (a LOCATION
  * clause arrives as EXTERNAL — refused as ambiguous), properties have
  * no catalog to live in, column DEFAULTs have no footer to live in,
  * bucketing does not map onto the hive key=value layout. USING omitted
  * arrives as Spark's own spark.sql.sources.default (parquet unless
  * reconfigured) — spell USING feather for the native face. */
private[extensions] class GraftCreateTableRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import org.apache.spark.sql.graft.Bridge
  import graft.catalog.GraftCatalog

  private val Faces = Set("graft", "graft_dv")

  /** Identifier resolved against a registered [[GraftCatalog]]: the
    * catalog handles plain CREATE itself (public createTable); CTAS
    * must be claimed here because the V2 exec would otherwise write
    * through a WriteBuilder the metadata-only table does not carry. */
  /** REPLACE-target path: path spelling, or a catalog name resolved to
    * its warehouse path (both spellings lower onto one engine impl). */
  private def replacePathOf(name: LogicalPlan): Option[String] =
    v2PathOf(name).orElse(
      catalogIdentOf(name).map { case (cat, id) => cat.pathOf(id) })

  private def catalogIdentOf(name: LogicalPlan)
      : Option[(GraftCatalog, org.apache.spark.sql.connector.catalog.Identifier)] =
    name match {
      case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier =>
        r.catalog match {
          case c: GraftCatalog => Some((c, r.identifier))
          case _ => None
        }
      case _ => None
    }

  private def catalogPathOf(
      t: org.apache.spark.sql.catalyst.catalog.CatalogTable)
      : Option[String] =
    t.identifier.database.filter(d => Faces(d.toLowerCase))
      .map(_ => t.identifier.table)

  /** V2-provider CREATEs (USING feather / `graft-avro` — both DSv2)
    * never convert to V1 commands; they stay CreateTable /
    * CreateTableAsSelect with a ResolvedIdentifier. */
  private def v2PathOf(name: LogicalPlan): Option[String] = name match {
    case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
        if r.identifier.namespace.length == 1 &&
          Faces(r.identifier.namespace.head.toLowerCase) =>
      Some(r.identifier.name)
    case _ => None
  }

  /** DROP TABLE's target: the parser emits an identifier node that
    * Spark's ResolveCatalogs converts to ResolvedIdentifier before any
    * injected resolution rule runs — match every shape it can arrive
    * in by the post-hoc batch. */
  private def dropPathOf(t: LogicalPlan): Option[String] = t match {
    case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
        if r.identifier.namespace.length == 1 &&
          Faces(r.identifier.namespace.head.toLowerCase) =>
      Some(r.identifier.name)
    case org.apache.spark.sql.catalyst.analysis
        .UnresolvedIdentifier(parts, _)
        if parts.length == 2 && Faces(parts.head.toLowerCase) =>
      Some(parts(1))
    case org.apache.spark.sql.catalyst.analysis
        .UnresolvedTableOrView(parts, _, _)
        if parts.length == 2 && Faces(parts.head.toLowerCase) =>
      Some(parts(1))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DropTable if dropPathOf(d.child).isDefined =>
      val path = dropPathOf(d.child).get
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val exists = graft.sources.FeatherSnapshots.enabled(fs, root)
      if (exists)
        throw new IllegalArgumentException(
          s"DROP TABLE graft.`$path`: a graft table IS its directory — " +
            "DROP would delete data as a side effect of a metadata " +
            "statement; delete the path deliberately, or use " +
            "graft_expire/graft_vacuum to reclaim history")
      else if (d.ifExists)
        // idempotent cleanup scripts (DROP IF EXISTS before CREATE)
        // must no-op on a path holding no table
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          d.output)
      else
        throw new IllegalArgumentException(
          s"DROP TABLE graft.`$path`: no snapshot table at this path " +
            "(nothing to drop; DROP TABLE IF EXISTS no-ops)")
    // [CREATE OR] REPLACE TABLE: one manifest commit swaps the whole
    // table (files, schema, face); prior versions stay time-travelable
    // and RESTORE undoes the replace. Both spellings (path and catalog
    // name) lower onto the same engine implementation — catalog-only
    // sessions reach the identical commit through the
    // StagingTableCatalog surface instead.
    case r: ReplaceTable if replacePathOf(r.name).isDefined =>
      val path = replacePathOf(r.name).get
      val (provider, partCols) = v2Parts("REPLACE TABLE", path,
        r.columns.flatMap(col =>
          if (col.defaultValue.nonEmpty) Some(col.name) else None),
        r.partitioning, r.tableSpec)
      val schema = r.tableSchema
      GraftDml.report(s"replace_table($path)") { () =>
        graft.io.TableDdl.replaceTable(spark, path, Left(schema),
          provider, partCols, r.orCreate) }
    case r: ReplaceTableAsSelect if replacePathOf(r.name).isDefined =>
      val path = replacePathOf(r.name).get
      val (provider, partCols) = v2Parts("REPLACE TABLE AS SELECT", path,
        Nil, r.partitioning, r.tableSpec)
      val query = Bridge.ofRows(spark, r.query)
      GraftDml.report(s"replace_table_as($path)") { () =>
        graft.io.TableDdl.replaceTable(spark, path, Right(query),
          provider, partCols, r.orCreate) }
    // catalog-named CTAS: the catalog's createTable makes the empty
    // table, but the V2 exec would then write through a WriteBuilder
    // the metadata-only table does not carry — claim the plan and run
    // create-and-fill through the engine's own routed writer (identical
    // to the path spelling's CTAS)
    case c: CreateTableAsSelect if catalogIdentOf(c.name).isDefined =>
      val (cat, ident) = catalogIdentOf(c.name).get
      val path = cat.pathOf(ident)
      val (provider, partCols) = v2Parts("CREATE TABLE AS SELECT",
        s"$ident", Nil, c.partitioning, c.tableSpec)
      val query = Bridge.ofRows(spark, c.query)
      GraftDml.report(s"create_table_as($path)") { () =>
        graft.io.TableDdl.createTableAs(spark, path, query, provider,
          partCols, c.ignoreIfExists) }
    case c: org.apache.spark.sql.execution.command
        .CreateDataSourceTableCommand if catalogPathOf(c.table).isDefined =>
      lowerCreate(c.table, c.ignoreIfExists, ctas = None)
    case c: org.apache.spark.sql.execution.command
        .CreateDataSourceTableAsSelectCommand
        if catalogPathOf(c.table).isDefined =>
      lowerCreate(c.table,
        c.mode == org.apache.spark.sql.SaveMode.Ignore,
        ctas = Some(c.query))
    case c: org.apache.spark.sql.execution.command.CreateTableCommand
        if catalogPathOf(c.table).isDefined =>
      throw new IllegalArgumentException(
        s"CREATE TABLE graft.`${catalogPathOf(c.table).get}`: hive " +
          "serde formats (STORED AS / ROW FORMAT) are not supported — " +
          "USING feather, parquet, or avro")
    case c: CreateTable if v2PathOf(c.name).isDefined =>
      val path = v2PathOf(c.name).get
      val (provider, partCols) = v2Parts("CREATE TABLE", path,
        c.columns.flatMap(col =>
          if (col.defaultValue.nonEmpty) Some(col.name) else None),
        c.partitioning, c.tableSpec)
      val schema = c.tableSchema
      GraftDml.report(s"create_table($path)") { () =>
        graft.io.TableDdl.createTable(spark, path, schema, provider,
          partCols, c.ignoreIfExists) }
    case c: CreateTableAsSelect if v2PathOf(c.name).isDefined =>
      val path = v2PathOf(c.name).get
      val (provider, partCols) = v2Parts("CREATE TABLE AS SELECT", path,
        Nil, c.partitioning, c.tableSpec)
      val query = Bridge.ofRows(spark, c.query)
      GraftDml.report(s"create_table_as($path)") { () =>
        graft.io.TableDdl.createTableAs(spark, path, query, provider,
          partCols, c.ignoreIfExists) }
    case other => other
  }

  private def v2Parts(what: String, path: String,
                      defaultCols: Seq[String],
                      partitioning: Seq[
                        org.apache.spark.sql.connector.expressions.Transform],
                      tableSpec: TableSpecBase)
      : (Option[String], Seq[String]) = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"$what graft.`$path`: $msg")
    defaultCols.headOption.foreach(c =>
      bad(s"column '$c' carries a DEFAULT — footers cannot record it; " +
        "create the column plain and backfill with UPDATE"))
    val (provider, location, external, props, hasOptions, comment) =
      tableSpec match {
        case t: TableSpec =>
          (t.provider, t.location, t.external, t.properties,
            t.options.nonEmpty, t.comment)
        case t: UnresolvedTableSpec =>
          (t.provider, t.location, t.external, t.properties,
            t.optionExpression.options.nonEmpty, t.comment)
        case other => bad(s"unsupported table spec ${other.getClass.getName}")
      }
    location.foreach(l => bad(s"LOCATION '$l' — the graft.`path` " +
      "identifier IS the location; drop the clause"))
    if (external) bad("LOCATION/EXTERNAL — the graft.`path` identifier " +
      "IS the location; drop the clause")
    if (props.nonEmpty)
      bad(s"TBLPROPERTIES (${props.keys.mkString(", ")}) — a graft " +
        "table is a path plus manifests; there is no catalog to hold " +
        "properties")
    if (hasOptions)
      bad("OPTIONS — writer options do not persist (no catalog to " +
        "hold them); configure writes per statement or session instead")
    comment.foreach(_ => bad("COMMENT — there is no catalog to hold " +
      "a table comment; record it beside the data (a README in the " +
      "directory outlives any session)"))
    val partCols = partitioning.map { t =>
      if (t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1)
        t.references.head.fieldNames.head
      else bad(s"PARTITIONED BY ${t.describe()} — only plain column " +
        "partitioning maps onto the hive key=value layout")
    }
    (provider, partCols)
  }

  private def lowerCreate(
      ct: org.apache.spark.sql.catalyst.catalog.CatalogTable,
      ifNotExists: Boolean, ctas: Option[LogicalPlan]): LogicalPlan = {
    val path = ct.identifier.table
    val what =
      if (ctas.isDefined) "CREATE TABLE AS SELECT" else "CREATE TABLE"
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"$what graft.`$path`: $msg")
    if (ct.tableType ==
        org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL)
      bad("LOCATION/EXTERNAL — the graft.`path` identifier IS the " +
        "location; drop the clause")
    if (ct.properties.nonEmpty)
      bad(s"TBLPROPERTIES (${ct.properties.keys.mkString(", ")}) — a " +
        "graft table is a path plus manifests; there is no catalog to " +
        "hold properties")
    // silently DROPPING a clause is worse than refusing it: OPTIONS
    // and COMMENT have nowhere to persist, so a user who spelled them
    // must hear that, not discover it later
    if (ct.storage.properties.nonEmpty)
      bad(s"OPTIONS (${ct.storage.properties.keys.mkString(", ")}) — " +
        "writer options do not persist (no catalog to hold them); " +
        "configure writes per statement or session instead")
    ct.comment.foreach(_ => bad("COMMENT — there is no catalog to " +
      "hold a table comment; record it beside the data (a README in " +
      "the directory outlives any session)"))
    ct.bucketSpec.foreach(b => bad(s"CLUSTERED BY/bucketing ($b) does " +
      "not map onto the hive key=value layout — only plain column " +
      "partitioning; cluster content with the graft_cluster/" +
      "graft_zorder maintenance functions instead"))
    ct.schema.fields.find(f =>
        f.metadata.contains("CURRENT_DEFAULT") ||
        f.metadata.contains("EXISTS_DEFAULT")).foreach(f =>
      bad(s"column '${f.name}' carries a DEFAULT — footers cannot " +
        "record it; create the column plain and backfill with UPDATE"))
    val partCols = ct.partitionColumnNames
    ctas match {
      case Some(q) =>
        // the query analyzes independently (graft reads inside it
        // resolve through the relation rule)
        val query = Bridge.ofRows(spark, q)
        GraftDml.report(s"create_table_as($path)") { () =>
          graft.io.TableDdl.createTableAs(spark, path, query,
            ct.provider, partCols, ifNotExists) }
      case None =>
        // the V1 CatalogTable appends partition columns at the END of
        // its schema — exactly the graft layout's column order
        val schema = ct.schema
        GraftDml.report(s"create_table($path)") { () =>
          graft.io.TableDdl.createTable(spark, path, schema, ct.provider,
            partCols, ifNotExists) }
    }
  }
}
