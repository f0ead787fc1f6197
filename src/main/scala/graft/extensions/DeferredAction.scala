package graft.extensions

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Row
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** A table-maintenance action deferred to EXECUTION time.
  *
  * The maintenance table functions ([[GraftTableFunctions]]) mutate the
  * table (restore, expire, vacuum, compaction, clustering). Running the
  * action while the TVF builder constructs the plan would fire it at
  * ANALYSIS — `df.explain()`, a BI tool eagerly analyzing statements, or
  * a twice-resolved CTE would each mutate the table without the
  * statement ever "running". This leaf defers the side effect into the
  * physical plan: `doExecute` runs the closure ON THE DRIVER (the action
  * spawns its own Spark jobs) exactly when the enclosing statement
  * executes, and the one-row result the SELECT returns is whatever the
  * action reports — the same contract as Delta's RESTORE/OPTIMIZE
  * commands. A plan that references the node twice executes the action
  * twice, exactly like issuing the statement twice.
  *
  * Corollary (documented, deliberate): the action runs iff the leaf
  * SURVIVES optimization. A statement that provably never reads the
  * result — `WHERE 1=0`, `LIMIT 0` — is pruned to an empty relation and
  * skips the action, the same way it would skip reading a table. Drive
  * maintenance with a plain `SELECT * FROM graft_...(...)`.
  *
  * Precise firing point: `doExecute` runs when the statement's physical
  * RDD is ASSEMBLED (`QueryExecution.toRdd`), so `df.rdd` /
  * `df.queryExecution.toRdd` on a statement containing this leaf fires
  * the action even if no job ever runs over the returned RDD — slightly
  * stronger than "when the statement executes". The action cannot move
  * into task compute (it spawns driver-side Spark jobs of its own), so
  * this is the tightest deferral available; treat obtaining the RDD of a
  * maintenance statement as executing it. */
private[extensions] case class DeferredMaintenanceAction(
    name: String,
    output: Seq[Attribute],
    action: () => Seq[Row]) extends LeafNode {
  // one summary row; a join against this is always broadcast-cheap
  override def computeStats(): Statistics = Statistics(sizeInBytes = 64)
  override def simpleString(maxFields: Int): String =
    s"DeferredMaintenanceAction $name"
}

/** The COMMAND twin of [[DeferredMaintenanceAction]], for the SQL DML
  * statements (MERGE INTO / UPDATE / DELETE FROM): Spark's own
  * MergeIntoTable/UpdateTable/DeleteFromTable are Commands, so the
  * graft lowering must keep the Command contract — `spark.sql("DELETE
  * FROM graft.\`/t\` ...")` executes EAGERLY, exactly ONCE, at
  * statement issue (Delta parity; a ported ETL job that discards the
  * returned frame must still mutate), and re-collecting the returned
  * frame replays the CACHED one-row report, never the mutation.
  * `EXPLAIN <statement>` still never mutates — Spark analyzes explained
  * commands with CommandExecutionMode.SKIP. The TVF tier keeps the
  * DEFERRED leaf above: a table function lives inside a SELECT, where
  * eager execution at analysis would be the bug. */
private[extensions] case class GraftDmlCommand(
    name: String,
    override val output: Seq[Attribute],
    action: () => Seq[Row]) extends LeafNode
    with org.apache.spark.sql.catalyst.plans.logical.Command {
  override def simpleString(maxFields: Int): String =
    s"GraftDmlCommand $name"
}

/** The one-row DML report every SQL mutation statement returns
  * (version, files_touched, files_kept, parts_written), lowered as a
  * [[GraftDmlCommand]] — shared by the MERGE/UPDATE/DELETE rule and the
  * INSERT rule so the two spellings of one mutation tier report
  * identically. */
private[extensions] object GraftDml {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types._

  def report(name: String)
            (action: () => graft.io.FeatherMutations.Result): LogicalPlan = {
    val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files_touched", IntegerType, nullable = false),
      StructField("files_kept", IntegerType, nullable = false),
      StructField("parts_written", IntegerType, nullable = false)))
    GraftDmlCommand(name,
      schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
        .toSeq,
      () => {
        val r = action()
        Seq(Row(r.version, r.filesTouched, r.filesKept, r.partsWritten))
      })
  }
}

private[extensions] case class DeferredMaintenanceActionExec(
    name: String,
    output: Seq[Attribute],
    action: () => Seq[Row]) extends LeafExecNode {
  override protected def doExecute(): RDD[InternalRow] = {
    // doExecute runs driver-side while the statement's RDD DAG is
    // assembled — i.e. at statement execution, never at EXPLAIN/analysis
    val rows = action()
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    // parents consume UnsafeRow (SparkPlan's byte-array collect path
    // casts); copy() because the projection reuses its buffer
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(schema)
    sparkContext.parallelize(
      rows.map(r => proj(toCatalyst(r).asInstanceOf[InternalRow]).copy()
        : InternalRow), 1)
  }
  override def simpleString(maxFields: Int): String =
    s"DeferredMaintenanceActionExec $name"
}

private[extensions] class DeferredActionStrategy(spark: SparkSession)
    extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case d: DeferredMaintenanceAction =>
      DeferredMaintenanceActionExec(d.name, d.output, d.action) :: Nil
    case c: GraftDmlCommand =>
      // same exec node: doExecute runs the action when the command's
      // RDD assembles — for a Command that is commandExecuted's ONE
      // eager executeCollect at statement issue
      DeferredMaintenanceActionExec(c.name, c.output, c.action) :: Nil
    case _ => Nil
  }
}
