package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ConditionalMerge, PredicateMutations}

/** Property-fuzz of the DML triad (DELETE / UPDATE / MERGE): seeded
  * ScalaCheck scenarios generate a random table (flat feather, flat
  * parquet, or hive-partitioned parquet) and a random statement
  * sequence — predicates, partial SETs, clause orders and conditions,
  * partial INSERT values, COW vs DV strategies — and fold the same
  * statements over an in-memory model with SQL three-valued predicate
  * semantics (the reference's own test strategy: random frames vs a
  * pandas fold, testing/dataset_generator.py:285 rand_dataframe). After
  * every statement the table's full content must equal the model's.
  * Example-based specs pin the loud contracts and schema evolution;
  * this layer sweeps the combinatorics they cannot enumerate. */
class DmlPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp(n: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_dml_prop/$n"
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(): Unit
    }
    wipe(new java.io.File(p))
    p
  }

  // ---- the model row -------------------------------------------------------
  // id is the merge key (never null); amt/grp/day go null through partial
  // inserts, so predicate eval is Kleene three-valued like SQL's
  private case class MR(id: Long, grp: Option[String], amt: Option[Double],
                        day: Option[String])

  // ---- predicate AST: one definition, two interpreters ---------------------
  private sealed trait Pred {
    def col(q: String => Column): Column
    def eval(r: MR): Option[Boolean]
  }
  private case class IdMod(k: Long, m: Long) extends Pred {
    def col(q: String => Column) = q("id") % k === m
    def eval(r: MR) = Some(r.id % k == m)
  }
  private case class IdLe(v: Long) extends Pred {
    def col(q: String => Column) = q("id") <= v
    def eval(r: MR) = Some(r.id <= v)
  }
  private case class AmtGt(v: Double) extends Pred {
    def col(q: String => Column) = q("amt") > v
    def eval(r: MR) = r.amt.map(_ > v)
  }
  private case class GrpEq(v: String) extends Pred {
    def col(q: String => Column) = q("grp") === v
    def eval(r: MR) = r.grp.map(_ == v)
  }
  private case class DayEq(v: String) extends Pred {
    def col(q: String => Column) = q("day") === v
    def eval(r: MR) = r.day.map(_ == v)
  }
  private case class PAnd(a: Pred, b: Pred) extends Pred {
    def col(q: String => Column) = a.col(q) && b.col(q)
    def eval(r: MR) = (a.eval(r), b.eval(r)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
  }
  private case class POr(a: Pred, b: Pred) extends Pred {
    def col(q: String => Column) = a.col(q) || b.col(q)
    def eval(r: MR) = (a.eval(r), b.eval(r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
  }
  private case class PNot(a: Pred) extends Pred {
    def col(q: String => Column) = !a.col(q)
    def eval(r: MR) = a.eval(r).map(!_)
  }

  // ---- SET/VALUES expressions ----------------------------------------------
  // target-side (UPDATE and matched-UPDATE clauses) expressions; the
  // source side of a merge contributes via SrcAmt
  private sealed trait SE {
    def col(q: String => Column): Column
    def eval(r: MR, s: Option[MR]): Any // null = SQL NULL
  }
  private case class AmtTimes(k: Double) extends SE {
    def col(q: String => Column) = q("amt") * k
    def eval(r: MR, s: Option[MR]) = r.amt.map(_ * k).orNull
  }
  private case class AmtFromId(c: Double) extends SE {
    def col(q: String => Column) = q("id") * 1.0 + c
    def eval(r: MR, s: Option[MR]) = r.id * 1.0 + c
  }
  private case class SrcAmt(k: Double) extends SE { // merge-only
    def col(q: String => Column) = org.apache.spark.sql.functions
      .col("source.amt") * k
    def eval(r: MR, s: Option[MR]) = s.flatMap(_.amt).map(_ * k).orNull
  }
  private case class SLit(v: String) extends SE {
    def col(q: String => Column) = lit(v)
    def eval(r: MR, s: Option[MR]) = v
  }

  // ---- statements ------------------------------------------------------------
  private sealed trait Stmt
  private case class Del(p: Pred, dv: Boolean) extends Stmt
  private case class Upd(set: Map[String, SE], p: Option[Pred]) extends Stmt
  private sealed trait MAct
  private case class MUpd(set: Map[String, SE]) extends MAct
  private case object MDel extends MAct
  private case class Mrg(srcRows: Seq[MR],
                         matched: Seq[(Option[Pred], MAct)],
                         insertVals: Option[(Option[Pred], Map[String, SE])],
                         bySource: Seq[(Option[Pred], MAct)],
                         dv: Boolean) extends Stmt
  /** SQL INSERT INTO (blind append) / INSERT OVERWRITE — `dynamic` maps
    * onto Spark's partitionOverwriteMode conf (leaf-replace on a
    * partitioned table; adjust() clears it on flat layouts where the
    * conf has no effect and OVERWRITE replaces the whole table). */
  private case class Ins(rows: Seq[MR], overwrite: Boolean,
                         dynamic: Boolean) extends Stmt
  /** replaceWhere: atomic predicate-scoped overwrite; rows are filtered
    * to the predicate at GENERATION time (eval == Some(true), the same
    * Kleene fire the engine's scope constraint enforces). */
  private case class RepW(p: Pred, rows: Seq[MR]) extends Stmt
  /** SQL TRUNCATE TABLE — the schema (and layout) survive; the model
    * folds to empty. */
  private case object Trunc extends Stmt

  // ---- generators -------------------------------------------------------------
  private val genLeaf: Gen[Pred] = Gen.oneOf(
    Gen.chooseNum(2L, 7L).flatMap(k => Gen.chooseNum(0L, k - 1)
      .map(m => IdMod(k, m))),
    Gen.chooseNum(5L, 120L).map(IdLe(_)),
    Gen.chooseNum(5.0, 150.0).map(AmtGt(_)),
    Gen.oneOf("g0", "g1", "g2", "g3").map(GrpEq(_)),
    Gen.oneOf("d0", "d1", "d2", "d9").map(DayEq(_)))
  private val genPred: Gen[Pred] = Gen.oneOf(
    genLeaf,
    for { a <- genLeaf; b <- genLeaf } yield PAnd(a, b),
    for { a <- genLeaf; b <- genLeaf } yield POr(a, b),
    genLeaf.map(PNot(_)))

  private def genTargetSE(col: String): Gen[SE] = col match {
    case "amt" => Gen.oneOf(
      Gen.chooseNum(0.5, 3.0).map(AmtTimes(_)),
      Gen.chooseNum(-5.0, 5.0).map(AmtFromId(_)))
    case "grp" => Gen.oneOf("g0", "g9", "gX").map(SLit(_))
    case _ => Gen.oneOf("d0", "d1", "d2", "d9").map(SLit(_))
  }
  private def genMergeSE(col: String): Gen[SE] = col match {
    case "amt" => Gen.oneOf(
      Gen.chooseNum(0.5, 3.0).map(AmtTimes(_)),
      Gen.chooseNum(0.5, 3.0).map(SrcAmt(_)))
    case other => genTargetSE(other)
  }
  private def genSet(gen: String => Gen[SE]): Gen[Map[String, SE]] = for {
    cols <- Gen.someOf("amt", "grp", "day").suchThat(_.nonEmpty)
    ses <- Gen.sequence[Seq[SE], SE](cols.map(gen))
  } yield cols.toSeq.zip(ses).toMap

  private val genDel: Gen[Stmt] = for {
    p <- genPred; dv <- Gen.oneOf(true, false)
  } yield Del(p, dv)
  private val genUpd: Gen[Stmt] = for {
    set <- genSet(genTargetSE)
    p <- Gen.option(genPred)
  } yield Upd(set, p)
  private def genMrg(maxId: Long): Gen[Stmt] = for {
    // a mix of existing and fresh ids, unique by construction
    lo <- Gen.chooseNum(1L, maxId)
    width <- Gen.chooseNum(5L, 40L)
    step <- Gen.chooseNum(1L, 3L)
    srcRows = (lo to (lo + width) by step).map(i =>
      MR(i, Some(s"g${i % 4}"), Some(i * 2.0 + 0.5), Some(s"d${i % 3}")))
    nMatched <- Gen.chooseNum(0, 2)
    matched <- Gen.listOfN(nMatched, for {
      c <- Gen.option(genPred)
      a <- Gen.oneOf(genSet(genMergeSE).map(MUpd(_)), Gen.const(MDel))
    } yield (c, a))
    ins <- Gen.option(for {
      c <- Gen.option(genPred)
      set <- genSet(genMergeSE)
    } yield (c, set))
    nBySrc <- Gen.chooseNum(0, 1)
    bySrc <- Gen.listOfN(nBySrc, for {
      c <- Gen.option(genPred)
      a <- Gen.oneOf(genSet(genTargetSE).map(MUpd(_)), Gen.const(MDel))
    } yield (c, a))
    dv <- Gen.oneOf(true, false)
  } yield Mrg(srcRows, matched, ins, bySrc, dv)

  /** Fresh full rows (never-null fields so partitioned routing and the
    * replaceWhere scope stay well-defined), ids offset above the base
    * table's range sometimes and overlapping it sometimes. */
  private def genFullRows(maxId: Long): Gen[Seq[MR]] = for {
    lo <- Gen.oneOf(Gen.chooseNum(1L, maxId),
      Gen.chooseNum(maxId + 1, maxId + 200))
    width <- Gen.chooseNum(4L, 30L)
  } yield (lo to lo + width).map(i =>
    MR(i, Some(s"g${i % 4}"), Some(i * 3.0 + 0.25), Some(s"d${i % 3}")))

  private def genIns(maxId: Long): Gen[Stmt] = for {
    rows <- genFullRows(maxId)
    overwrite <- Gen.frequency(2 -> Gen.const(false), 1 -> Gen.const(true))
    dynamic <- Gen.oneOf(true, false)
  } yield Ins(rows, overwrite, dynamic)

  private def genRepW(maxId: Long): Gen[Stmt] = for {
    p <- genPred
    rows0 <- genFullRows(maxId)
  } yield RepW(p, rows0.filter(r => p.eval(r).contains(true)))

  private def genScenario(maxId: Long): Gen[(Int, Seq[MR], Seq[Stmt])] = for {
    face <- Gen.chooseNum(0, 2) // 0 feather flat, 1 parquet flat, 2 parquet partitioned
    n <- Gen.chooseNum(40L, maxId)
    rows = (1L to n).map(i =>
      MR(i, Some(s"g${i % 4}"), Some(i * 1.0), Some(s"d${i % 3}")))
    stmts <- Gen.listOfN(7, Gen.frequency(
      2 -> genDel, 2 -> genUpd, 3 -> genMrg(maxId),
      2 -> genIns(maxId), 1 -> genRepW(maxId),
      1 -> Gen.const(Trunc: Stmt)))
  } yield (face, rows, stmts)

  // ---- model folds -------------------------------------------------------------
  private def fire(p: Option[Pred], r: MR): Boolean =
    p.forall(_.eval(r).getOrElse(false))
  private def applySet(r: MR, set: Map[String, SE], s: Option[MR]): MR = {
    def v(c: String): Option[Any] = set.get(c).map(_.eval(r, s))
    MR(r.id,
      v("grp").map(x => Option(x).map(_.asInstanceOf[String]))
        .getOrElse(r.grp),
      v("amt").map(x => Option(x).map(_.asInstanceOf[Double]))
        .getOrElse(r.amt),
      v("day").map(x => Option(x).map(_.asInstanceOf[String]))
        .getOrElse(r.day))
  }
  private def foldModel(rows: Seq[MR], st: Stmt): Seq[MR] = st match {
    case Trunc => Nil
    case Ins(fresh, false, _) => rows ++ fresh // blind append
    case Ins(fresh, true, dynamic) =>
      if (!dynamic) fresh // static overwrite truncates the whole scope
      else { // dynamic: replace exactly the leaves the fresh rows land in
        val days = fresh.flatMap(_.day).toSet
        rows.filterNot(r => r.day.exists(days)) ++ fresh
      }
    case RepW(p, fresh) =>
      rows.filterNot(r => p.eval(r).getOrElse(false)) ++ fresh
    case Del(p, _) => rows.filterNot(r => p.eval(r).getOrElse(false))
    case Upd(set, p) =>
      rows.map(r => if (fire(p, r)) applySet(r, set, None) else r)
    case Mrg(src, matched, ins, bySrc, _) =>
      val byId = src.map(s => s.id -> s).toMap
      val kept = rows.flatMap { r =>
        byId.get(r.id) match {
          case Some(s) =>
            matched.find { case (c, _) => fire(c, r) } match {
              case Some((_, MDel)) => None
              case Some((_, MUpd(set))) => Some(applySet(r, set, Some(s)))
              case None => Some(r)
            }
          case None =>
            bySrc.find { case (c, _) => fire(c, r) } match {
              case Some((_, MDel)) => None
              case Some((_, MUpd(set))) => Some(applySet(r, set, None))
              case None => Some(r)
            }
        }
      }
      val existing = rows.map(_.id).toSet
      val inserts = ins.toSeq.flatMap { case (c, values) =>
        src.filterNot(s => existing(s.id)).filter(s => fire(c, s)).map { s =>
          def v(col: String): Option[Any] = values.get(col).map(_.eval(s, Some(s)))
          MR(s.id,
            v("grp").flatMap(Option(_)).map(_.asInstanceOf[String]),
            v("amt").flatMap(Option(_)).map(_.asInstanceOf[Double]),
            v("day").flatMap(Option(_)).map(_.asInstanceOf[String]))
        }
      }
      kept ++ inserts
  }

  // ---- execution ----------------------------------------------------------------
  private def toDf(rows: Seq[MR]): DataFrame = {
    import spark.implicits._
    rows.map(r => (r.id, r.grp.orNull, r.amt.map(Double.box).orNull,
      r.day.orNull)).toDF("id", "grp", "amt", "day")
  }
  private def unq: String => Column = org.apache.spark.sql.functions.col
  private def tq: String => Column = n => col(s"target.$n")
  private def sq: String => Column = n => col(s"source.$n")

  /** The day value an adjusted partitioned insert carries implicitly. */
  private object DayFromSource extends SE {
    def col(q: String => Column) = org.apache.spark.sql.functions
      .col("source.day")
    def eval(r: MR, s: Option[MR]) = s.flatMap(_.day).orNull
  }

  /** ONE adjustment both interpreters share: a partitioned insert must
    * name `day` (routed by the source's), a DV merge drops its bySource
    * clauses, a merge left with no clauses is skipped (the builder
    * refuses empty clause lists), and the dynamic-overwrite flag clears
    * on flat layouts (the conf has no effect there — OVERWRITE replaces
    * the whole table either way, which is what the model must fold). */
  private def adjust(st: Stmt, partitioned: Boolean): Option[Stmt] =
    st match {
      case m: Mrg =>
        val ins = m.insertVals.map { case (c, values) =>
          (c, if (!partitioned || values.contains("day")) values
              else values + ("day" -> (DayFromSource: SE)))
        }
        val a = m.copy(insertVals = ins,
          bySource = if (m.dv) Nil else m.bySource)
        if (a.matched.nonEmpty || a.insertVals.nonEmpty ||
            a.bySource.nonEmpty) Some(a)
        else None
      case i: Ins if !partitioned => Some(i.copy(dynamic = false))
      case other => Some(other)
    }

  private def withOverwriteMode[A](mode: String)(body: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def runStmt(path: String, st: Stmt): Unit =
    st match {
      case Trunc =>
        spark.sql(s"TRUNCATE TABLE graft.`$path`").collect(): Unit
      case Ins(fresh, overwrite, dynamic) =>
        toDf(fresh).createOrReplaceTempView("dml_prop_ins_src")
        val verb = if (overwrite) "INSERT OVERWRITE" else "INSERT INTO"
        val sql = s"$verb graft.`$path` " +
          "SELECT id, grp, amt, day FROM dml_prop_ins_src"
        withOverwriteMode(if (dynamic) "dynamic" else "static") {
          spark.sql(sql).collect(): Unit
        }
      case RepW(p, fresh) =>
        PredicateMutations.replaceWhere(spark, path, toDf(fresh),
          p.col(unq)): Unit
      case Del(p, dv) =>
        if (dv) PredicateMutations.deleteWhereDV(spark, path, p.col(unq))
        else PredicateMutations.deleteWhere(spark, path, p.col(unq))
        (): Unit
      case Upd(set, p) =>
        PredicateMutations.updateWhere(spark, path,
          set.map { case (c, se) => c -> se.col(unq) }, p.map(_.col(unq)))
        (): Unit
      case Mrg(src, matched, ins, bySrc, dv) =>
        var m = ConditionalMerge(spark, path, toDf(src), Seq("id"))
        matched.foreach {
          case (c, MUpd(set)) => m = m.whenMatchedUpdate(c.map(_.col(tq)),
            set.map { case (n, se) => n -> se.col(tq) })
          case (c, MDel) => m = m.whenMatchedDelete(c.map(_.col(tq)))
        }
        // insert VALUES see the SOURCE row only — expressions render
        // with the source qualifier (the model evals them over the
        // source row the same way); id always inserts
        ins.foreach { case (c, values) =>
          m = m.whenNotMatchedInsert(c.map(_.col(sq)),
            values.map { case (n, se) => n -> se.col(sq) } +
              ("id" -> col("source.id")))
        }
        bySrc.foreach {
          case (c, MUpd(set)) =>
            m = m.whenNotMatchedBySourceUpdate(c.map(_.col(tq)),
              set.map { case (n, se) => n -> se.col(tq) })
          case (c, MDel) => m = m.whenNotMatchedBySourceDelete(c.map(_.col(tq)))
        }
        if (dv) m.executeDV() else m.execute()
        (): Unit
    }

  private def readBack(path: String, face: Int): Set[MR] = {
    val df = face match {
      case 0 => spark.read.format("feather").load(path)
      case _ => graft.io.ParquetTable.read(spark, path)
    }
    df.select("id", "grp", "amt", "day").collect().map { r =>
      MR(r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        Option(r.getString(3)))
    }.toSet
  }

  test("120 seeded random DML statements agree with the in-memory fold " +
       "across faces, layouts, and strategies") {
    val MaxId = 160L
    var statements = 0
    for (i <- 0 until 20) {
      val (face, rows0, stmts) = genScenario(MaxId)
        .pureApply(Gen.Parameters.default, Seed(91500L + i))
      val path = tmp(s"sc$i")
      val partitioned = face == 2
      face match {
        case 0 => toDf(rows0).repartitionByRange(3, col("id"))
          .write.format("feather").mode("overwrite")
          .option("snapshots", "true").save(path)
        case 1 => graft.io.ParquetTable.write(
          toDf(rows0).repartitionByRange(3, col("id")), path)
        case _ => graft.io.ParquetTable.write(toDf(rows0), path,
          partitionBy = Seq("day"))
      }
      var model = rows0
      stmts.zipWithIndex.foreach { case (st0, j) =>
        adjust(st0, partitioned).foreach { st =>
          runStmt(path, st)
          model = foldModel(model, st)
          statements += 1
          val got = readBack(path, face)
          val want = model.toSet
          assert(got === want,
            s"scenario $i (face $face, partitioned=$partitioned) " +
              s"diverged after statement $j: $st\n  " +
              s"extra=${(got -- want).take(5)}\n  " +
              s"missing=${(want -- got).take(5)}")
        }
      }
    }
    assert(statements >= 100, s"only $statements statement-cases ran")
  }
}
