package graft.extensions

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.io.ConditionalMerge

/** SQL `MERGE INTO` over graft tables — the statement CDC pipelines
  * actually write (reference anchor: the reference's in-memory upsert is
  * `boolean_mask_scatter`, cpp/include/cudf/copying.hpp; the clause
  * algebra is [[graft.io.ConditionalMerge]], this is its SQL spelling):
  *
  * {{{
  *   MERGE INTO graft.`/path/to/table` t
  *   USING updates s
  *   ON t.id = s.id
  *   WHEN MATCHED AND s.tombstone THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET amt = s.amt * 2
  *   WHEN NOT MATCHED AND s.id % 2 = 1 THEN INSERT (id, amt) VALUES (s.id, s.amt)
  *   WHEN NOT MATCHED BY SOURCE AND t.expired THEN DELETE
  * }}}
  *
  * Spark's OWN parser produces the [[MergeIntoTable]] plan (clause
  * conditions, assignments, star forms — full syntax for free); this
  * resolution rule claims statements whose target is the `graft.`-
  * qualified path spelling (`graft_dv.` for the merge-on-read strategy,
  * DV masks + new parts instead of copy-on-write) and lowers them onto
  * [[ConditionalMerge]]. Everything else — catalog tables, other
  * sources — passes through untouched for Spark's v2 machinery.
  *
  * The statement defers to EXECUTION via [[DeferredMaintenanceAction]]
  * (the maintenance-TVF contract: EXPLAIN never mutates) and returns a
  * one-row report (version, files_touched, files_kept, parts_written).
  *
  * Lowering contract (all violations fail analysis loudly):
  *  - `ON` must be a conjunction of `t.k = s.k` column equalities (the
  *    key-join shape ConditionalMerge executes; an inequality join has
  *    no pruned-candidate story);
  *  - alias qualifiers (`t.`, `s.`, the bare view name, or literal
  *    `target.`/`source.`) rewrite onto ConditionalMerge's
  *    target./source. working aliases; unqualified references pass
  *    through and resolve wherever they are unambiguous;
  *  - `MERGE WITH SCHEMA EVOLUTION` maps onto ConditionalMerge's
  *    withSchemaEvolution(): the source's NEW columns join the table
  *    schema as nullable (the mutation tier's evolveSchema contract);
  *    without the modifier extra source columns are ignored. */
private[graft] class GraftMergeIntoRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import org.apache.spark.sql.graft.Bridge

  private val Faces = Set("graft", "graft_dv")

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable =>
      unwrapTarget(m.targetTable) match {
        case Some(t) => lower(m, t.face, t.path, t.alias, t.output)
        case None => plan
      }
    case d: DeleteFromTable =>
      unwrapTarget(d.table) match {
        case Some(t) => lowerDelete(d, t.face, t.path, t.alias)
        case None => plan
      }
    case u: UpdateTable =>
      unwrapTarget(u.table) match {
        case Some(t) => lowerUpdate(u, t.face, t.path, t.alias)
        case None => plan
      }
    case _ => plan
  }

  /** The statement lowered as a COMMAND with a one-row report: eager,
    * exactly once, at statement issue (Delta parity — Spark's own DML
    * plans are Commands, and a ported job that discards the frame must
    * still mutate); re-collecting replays the cached report. `EXPLAIN
    * <statement>` never mutates (commands explain under
    * CommandExecutionMode.SKIP). */
  private def report(name: String)
                    (action: () => graft.io.FeatherMutations.Result)
      : LogicalPlan = GraftDml.report(name)(action)

  private def normOf: String => String = {
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    s => if (caseSensitive) s else s.toLowerCase
  }

  /** Assignment-key column name: bare, or qualified by a KNOWN alias.
    * A wrong qualifier or a nested-field path refuses loudly — silently
    * taking the last name part would update a DIFFERENT top-level
    * column (`SET addr.city = ..` must not rewrite `city`). */
  private def assignName(key: Expression, quals: Set[String],
                         norm: String => String, what: String,
                         bad: String => Nothing): String = key match {
    case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
      ua.nameParts.head
    case ua: UnresolvedAttribute if ua.nameParts.length == 2 &&
        quals(norm(ua.nameParts.head)) =>
      ua.nameParts(1)
    case ua: UnresolvedAttribute =>
      bad(s"$what assigns to '${ua.name}' — assign a bare top-level " +
        "column, optionally qualified by the target alias (nested-field " +
        "assignment is not supported)")
    case attr: Attribute => attr.name
    case other => bad(s"$what assigns to ${other.sql}, not a column")
  }

  /** Strip the table alias qualifier off references (`t.amt` → `amt`):
    * DELETE/UPDATE are single-relation statements, and
    * [[graft.io.PredicateMutations]] evaluates over one unaliased
    * working frame. A catalog-resolved statement arrives with
    * references already BOUND to the claimed relation's attribute
    * ids — re-anchor those by bare name the same way (single relation,
    * so the name is unambiguous). */
  private def stripQual(e: Expression, quals: Set[String],
                        norm: String => String): Expression =
    e.transform {
      case ua: UnresolvedAttribute if ua.nameParts.length >= 2 &&
          quals(norm(ua.nameParts.head)) =>
        UnresolvedAttribute(ua.nameParts.tail)
      case ar: AttributeReference => UnresolvedAttribute(Seq(ar.name))
    }

  /** SQL `DELETE FROM graft.`/p`` [t] WHERE ...` — predicate delete;
    * the `graft_dv.` spelling masks instead of rewriting (DV sidecars,
    * bytes ∝ deleted rows). No WHERE deletes every row (Spark's parser
    * supplies a literal-true condition). */
  private def lowerDelete(d: DeleteFromTable, face: String, path: String,
                          alias: Option[String]): LogicalPlan = {
    val norm = normOf
    val quals = alias.toSeq.map(norm).toSet
    val cond = Bridge.column(stripQual(d.condition, quals, norm))
    report(s"delete_from($face, $path)") { () =>
      if (face == "graft_dv")
        graft.io.PredicateMutations.deleteWhereDV(spark, path, cond)
      else graft.io.PredicateMutations.deleteWhere(spark, path, cond)
    }
  }

  /** SQL `UPDATE graft.`/p`` [t] SET ... [WHERE ...]` — predicate
    * update, copy-on-write (a SET on a partition column moves rows).
    * `graft_dv.` is refused: an update REWRITES rows; the
    * mask-and-reinsert spelling is `MERGE INTO graft_dv.`..``. */
  private def lowerUpdate(u: UpdateTable, face: String, path: String,
                          alias: Option[String]): LogicalPlan = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"UPDATE $face.`$path`: $msg")
    if (face == "graft_dv")
      bad("UPDATE has no merge-on-read strategy — an update rewrites " +
        "rows; use MERGE INTO graft_dv.`..` for mask-and-reinsert")
    val norm = normOf
    val quals = alias.toSeq.map(norm).toSet
    val named = u.assignments.map { a =>
      assignName(a.key, quals, norm, "SET", bad) ->
        Bridge.column(stripQual(a.value, quals, norm))
    }
    val dups = named.groupBy(n => norm(n._1)).collect {
      case (_, vs) if vs.size > 1 => vs.head._1 }
    if (dups.nonEmpty)
      bad(s"SET assigns ${dups.mkString(", ")} more than once")
    val cond = u.condition.map(c =>
      Bridge.column(stripQual(c, quals, norm)))
    report(s"update($face, $path)") { () =>
      graft.io.PredicateMutations.updateWhere(spark, path, named.toMap,
        cond)
    }
  }

  /** The claimed DML target: path spelling (still unresolved) or a
    * catalog-resolved graft relation. `output` is non-empty only for
    * the resolved shape — by the time this rule runs, the analyzer may
    * already have bound clause references to those attribute ids, and
    * the lowering re-anchors them by NAME onto its own working frames. */
  private final case class Target(face: String, path: String,
                                  alias: Option[String],
                                  output: Seq[Attribute])

  /** `graft.`/`graft_dv.`-qualified path target, with optional alias;
    * or a [[graft.catalog.GraftCatalog]]-resolved relation (the DV
    * strategy rides the catalog NAME — graft_dv = merge-on-read). */
  private def unwrapTarget(t: LogicalPlan): Option[Target] = t match {
    case SubqueryAlias(id, child) =>
      unwrapTarget(child).map(_.copy(alias = Some(id.name)))
    case UnresolvedRelation(parts, _, _)
        if parts.length == 2 && Faces(parts.head.toLowerCase) &&
          (parts(1).contains("/") || parts(1).contains("://") ||
            spark.conf.getOption(
              s"spark.sql.catalog.${parts.head.toLowerCase}").isEmpty) =>
      Some(Target(parts.head.toLowerCase, parts(1), None, Nil))
    case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2Relation =>
      r.table match {
        case g: graft.catalog.GraftTable =>
          Some(Target(if (g.dvFace) "graft_dv" else "graft", g.path,
            None, r.output))
        case _ => None
      }
    case _ => None
  }

  private def sourceNameOf(s: LogicalPlan): Option[String] = s match {
    case SubqueryAlias(id, _) => Some(id.name)
    case UnresolvedRelation(parts, _, _) => Some(parts.last)
    case _ => None
  }

  private def lower(m: MergeIntoTable, face: String, path: String,
                    targetAlias: Option[String],
                    targetOutput: Seq[Attribute]): LogicalPlan = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"MERGE INTO $face.`$path`: $msg")
    // MERGE WITH SCHEMA EVOLUTION maps onto ConditionalMerge's
    // withSchemaEvolution() (the source's NEW columns join as nullable)

    // identifier matching honors spark.sql.caseSensitive like Spark's
    // own resolver (lowercased under the default conf, exact otherwise)
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def norm(s: String): String = if (caseSensitive) s else s.toLowerCase
    val tQuals: Set[String] =
      (targetAlias.toSeq :+ "target").map(norm).toSet
    val sQuals: Set[String] =
      (sourceNameOf(m.sourceTable).toSeq :+ "source")
        .map(norm).toSet
    // a user alias that collides with the reserved working names —
    // source aliased 'target', target aliased 'source' — would have its
    // references SILENTLY remapped onto the wrong side (tQuals wins the
    // remap order); refuse instead of mis-routing rows
    val collided = tQuals.intersect(sQuals)
    if (collided.nonEmpty)
      bad(s"alias '${collided.head}' collides with the reserved " +
        "target./source. working names — rename the alias")

    // the USING side analyzes independently — exactly what a
    // free-standing source relation/subquery means
    val sourceDf = Bridge.ofRows(spark, m.sourceTable)

    // a catalog-resolved statement may arrive with clause references
    // already BOUND (the analyzer resolves within the same fix-point
    // iteration that resolved the target): classify those by exprId —
    // target-relation ids re-anchor as target., source-plan ids as
    // source. — so the lowering below treats them exactly like the
    // still-unresolved qualified spellings
    val targetIds = targetOutput.map(_.exprId).toSet
    val sourceIds =
      if (m.sourceTable.resolved) m.sourceTable.output.map(_.exprId).toSet
      else Set.empty[org.apache.spark.sql.catalyst.expressions.ExprId]

    // ---- ON clause → key columns -----------------------------------------
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    sealed trait Side
    case object T extends Side; case object S extends Side
    case object U extends Side
    def nameSide(e: Expression): Option[(String, Side)] = e match {
      case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
        Some((ua.nameParts.head, U))
      case ua: UnresolvedAttribute if ua.nameParts.length == 2 =>
        val q = norm(ua.nameParts.head)
        if (tQuals(q)) Some((ua.nameParts(1), T))
        else if (sQuals(q)) Some((ua.nameParts(1), S))
        else None
      // catalog-resolved references classify by exprId (bound to the
      // claimed target relation or the source plan)
      case ar: AttributeReference if targetIds(ar.exprId) =>
        Some((ar.name, T))
      case ar: AttributeReference if sourceIds(ar.exprId) =>
        Some((ar.name, S))
      // a source built straight from a DataFrame (createOrReplaceTempView
      // round-trips as UnresolvedAttribute; a resolved reference appears
      // only if someone hand-builds the plan) — name is enough: ON is
      // validated by the key-name equality below either way
      case ar: AttributeReference => Some((ar.name, U))
      case _ => None
    }
    val keys: Seq[String] = conjuncts(m.mergeCondition).map {
      case EqualTo(l, r) =>
        (nameSide(l), nameSide(r)) match {
          case (Some((ln, ls)), Some((rn, rs)))
              if norm(ln) == norm(rn) &&
                ((ls, rs) match {
                  case (T, S) | (S, T) | (U, U) => true
                  case (U, _) | (_, U) => true // one side unqualified
                  case _ => false
                }) =>
            ln
          case _ =>
            bad(s"ON clause term ${EqualTo(l, r).sql} is not a " +
              "target-key = source-key equality on one column name — " +
              "the merge joins by key columns (t.k = s.k AND ...)")
        }
      case other =>
        bad(s"ON clause term ${other.sql} is not a column equality — " +
          "the merge joins by key columns (t.k = s.k AND ...)")
    }.distinct

    // ---- expression re-aliasing onto target./source. -----------------------
    def remap(e: Expression): Column = Bridge.column(e.transform {
      case ua: UnresolvedAttribute if ua.nameParts.length >= 2 &&
          tQuals(norm(ua.nameParts.head)) =>
        UnresolvedAttribute("target" +: ua.nameParts.tail)
      case ua: UnresolvedAttribute if ua.nameParts.length >= 2 &&
          sQuals(norm(ua.nameParts.head)) =>
        UnresolvedAttribute("source" +: ua.nameParts.tail)
      case ar: AttributeReference if targetIds(ar.exprId) =>
        UnresolvedAttribute(Seq("target", ar.name))
      case ar: AttributeReference if sourceIds(ar.exprId) =>
        UnresolvedAttribute(Seq("source", ar.name))
    })
    def remapOpt(c: Option[Expression]): Option[Column] = c.map(remap)
    def setOf(assigns: Seq[Assignment], what: String): Map[String, Column] = {
      val named = assigns.map { a =>
        assignName(a.key, tQuals, norm, what, bad) -> remap(a.value)
      }
      // `.toMap` would silently keep the LAST duplicate — Spark's own
      // MERGE resolution raises an analysis error here, and so must we
      // (this rule claims the plan before Spark's checks run)
      val dups = named.groupBy(n => norm(n._1)).collect {
        case (_, vs) if vs.size > 1 => vs.head._1 }
      if (dups.nonEmpty)
        bad(s"$what assigns ${dups.mkString(", ")} more than once")
      named.toMap
    }

    // ---- clauses ------------------------------------------------------------
    var merge = ConditionalMerge(spark, path, sourceDf, keys,
      evolveSchema = m.withSchemaEvolution)
    m.matchedActions.foreach {
      case UpdateAction(cond, assigns, _) =>
        merge = merge.whenMatchedUpdate(remapOpt(cond),
          setOf(assigns, "WHEN MATCHED UPDATE"))
      case UpdateStarAction(cond) =>
        merge = merge.whenMatchedUpdateAll(remapOpt(cond))
      case DeleteAction(cond) =>
        merge = merge.whenMatchedDelete(remapOpt(cond))
      case other => bad(s"unsupported WHEN MATCHED action $other")
    }
    m.notMatchedActions.foreach {
      case InsertAction(cond, assigns) =>
        merge = merge.whenNotMatchedInsert(remapOpt(cond),
          setOf(assigns, "WHEN NOT MATCHED INSERT"))
      case InsertStarAction(cond) =>
        merge = merge.whenNotMatchedInsertAll(remapOpt(cond))
      case other => bad(s"unsupported WHEN NOT MATCHED action $other")
    }
    m.notMatchedBySourceActions.foreach {
      case UpdateAction(cond, assigns, _) =>
        merge = merge.whenNotMatchedBySourceUpdate(remapOpt(cond),
          setOf(assigns, "WHEN NOT MATCHED BY SOURCE UPDATE"))
      case DeleteAction(cond) =>
        merge = merge.whenNotMatchedBySourceDelete(remapOpt(cond))
      case other => bad(s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
    }
    val frozen = merge
    report(s"merge_into($face, $path)") { () =>
      if (face == "graft_dv") frozen.executeDV() else frozen.execute()
    }
  }
}
