package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property layer for the catalog's DDL lifecycle: seeded random
  * sequences of CREATE / INSERT / TRUNCATE / RENAME / DROP over named
  * tables inside a per-scenario namespace, folded against an in-memory
  * model (name → row ids). After every step `SHOW TABLES` must
  * enumerate exactly the model's names; at the end every surviving
  * table's content must equal the model's rows — and every
  * precondition violation (CREATE over an existing name, RENAME onto
  * an occupied name, DROP of a missing one) must refuse loudly without
  * corrupting the store. The filesystem IS the store, so this is the
  * consistency fuzz a metastore-backed catalog would need a protocol
  * for. Deterministic: fixed master seed. */
class CatalogPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val warehouse =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_tables"

  private sealed trait Op
  private case class Create(t: Int) extends Op
  private case class Insert(t: Int, n: Int) extends Op
  private case class Truncate(t: Int) extends Op
  private case class Rename(from: Int, to: Int) extends Op
  private case class Drop(t: Int, ifExists: Boolean) extends Op
  private case class Replace(t: Int, n: Int) extends Op

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("20 seeded DDL-lifecycle sequences: SHOW TABLES tracks the " +
       "model after every step, content survives renames, and every " +
       "precondition violation refuses without corrupting the store") {
    val opGen: Gen[Op] = {
      val t = Gen.chooseNum(0, 3)
      Gen.frequency(
        3 -> t.map(Create),
        4 -> Gen.zip(t, Gen.chooseNum(1, 5)).map((Insert.apply _).tupled),
        1 -> t.map(Truncate),
        2 -> Gen.zip(t, t).map((Rename.apply _).tupled),
        2 -> Gen.zip(t, Gen.oneOf(true, false)).map((Drop.apply _).tupled),
        2 -> Gen.zip(t, Gen.chooseNum(1, 5)).map((Replace.apply _).tupled))
    }
    val scenarios = sample(Gen.listOfN(20, Gen.listOfN(12, opGen)), 816L)

    scenarios.zipWithIndex.foreach { case (ops, i) =>
      val ns = s"fz_$i"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(s"$warehouse/$ns"))
      spark.sql(s"CREATE NAMESPACE graft.$ns").collect(): Unit
      val model = scala.collection.mutable.Map.empty[String, Vector[Long]]
      var nextId = 0L
      def name(t: Int) = s"t$t"
      def full(t: Int) = s"graft.$ns.${name(t)}"

      ops.zipWithIndex.foreach { case (op, step) =>
        val clue = s"scenario $i step $step: $op"
        op match {
          case Create(t) =>
            if (model.contains(name(t))) {
              val e = intercept[Exception] {
                spark.sql(s"CREATE TABLE ${full(t)} (id BIGINT) " +
                  "USING feather").collect()
              }
              assert(e.getMessage.contains("TABLE_OR_VIEW_ALREADY_EXISTS")
                || e.getMessage.contains("already exists"), s"$clue: $e")
            } else {
              spark.sql(s"CREATE TABLE ${full(t)} (id BIGINT) " +
                "USING feather").collect(): Unit
              model(name(t)) = Vector.empty
            }
          case Insert(t, n) =>
            if (!model.contains(name(t))) {
              val e = intercept[Exception] {
                spark.sql(s"INSERT INTO ${full(t)} SELECT 1L").collect()
              }
              assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
                s"$clue: $e")
            } else {
              val ids = (nextId until nextId + n).toVector
              nextId += n
              spark.sql(s"INSERT INTO ${full(t)} SELECT id + ${ids.head} " +
                s"FROM range($n)").collect(): Unit
              model(name(t)) = model(name(t)) ++ ids
            }
          case Truncate(t) =>
            if (model.contains(name(t))) {
              spark.sql(s"TRUNCATE TABLE ${full(t)}").collect(): Unit
              model(name(t)) = Vector.empty
            }
          case Rename(from, to) =>
            (model.contains(name(from)), model.contains(name(to))) match {
              case (true, false) if from != to =>
                spark.sql(s"ALTER TABLE ${full(from)} RENAME TO " +
                  s"$ns.${name(to)}").collect(): Unit
                model(name(to)) = model.remove(name(from)).get
              case (true, true) =>
                val e = intercept[Exception] {
                  spark.sql(s"ALTER TABLE ${full(from)} RENAME TO " +
                    s"$ns.${name(to)}").collect()
                }
                assert(
                  e.getMessage.contains("TABLE_OR_VIEW_ALREADY_EXISTS") ||
                  e.getMessage.contains("already exists"), s"$clue: $e")
              case (false, _) =>
                val e = intercept[Exception] {
                  spark.sql(s"ALTER TABLE ${full(from)} RENAME TO " +
                    s"$ns.${name(to)}").collect()
                }
                assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
                  s"$clue: $e")
              case _ => ()
            }
          // CREATE OR REPLACE: one commit swaps the content whether the
          // name exists (replace) or not (create) — the model simply
          // overwrites its entry either way
          case Replace(t, n) =>
            val ids = (nextId until nextId + n).toVector
            nextId += n
            spark.sql(s"CREATE OR REPLACE TABLE ${full(t)} USING " +
              s"feather AS SELECT id + ${ids.head} AS id FROM range($n)")
              .collect(): Unit
            model(name(t)) = ids
          case Drop(t, ifExists) =>
            if (model.contains(name(t))) {
              spark.sql(s"DROP TABLE ${full(t)}").collect(): Unit
              model.remove(name(t)): Unit
            } else if (ifExists)
              spark.sql(s"DROP TABLE IF EXISTS ${full(t)}").collect(): Unit
            else {
              val e = intercept[Exception] {
                spark.sql(s"DROP TABLE ${full(t)}").collect()
              }
              assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
                s"$clue: $e")
            }
        }
        val shown = spark.sql(s"SHOW TABLES IN graft.$ns").collect()
          .map(_.getString(1)).toSet
        assert(shown === model.keySet.toSet,
          s"$clue: SHOW TABLES drifted from the model")
      }
      // final content check: every surviving table equals the model
      model.foreach { case (t, ids) =>
        val got = spark.sql(s"SELECT id FROM graft.$ns.$t").collect()
          .map(_.getLong(0)).sorted.toSeq
        assert(got === ids.sorted,
          s"scenario $i: table $t content drifted from the model")
      }
      model.keys.toSeq.foreach(t =>
        spark.sql(s"DROP TABLE graft.$ns.$t").collect(): Unit)
      spark.sql(s"DROP NAMESPACE graft.$ns").collect(): Unit
    }
  }
}
