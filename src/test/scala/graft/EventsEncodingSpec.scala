package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pins `Tables.events` against every physical `ts` encoding the driver
  * fixture has shipped with (and the remaining TIMESTAMP variants), so a
  * regenerated testdata file can never silently take the events surface
  * down again (round-9 incident: the fixture moved NANOS→MICROS and the
  * loader hardcoded the nanos read path — 11 oracle queries red).
  *
  * The reference treats all timestamp resolutions as first-class
  * (cpp/include/cudf/types.hpp:216-220); the loader's contract is: any
  * encoding normalizes to `ts` = TimestampType (µs precision) and
  * `ts_ns` = epoch-nanos long, with identical values across encodings
  * for timestamps representable in all of them.
  */
class EventsEncodingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // whole-µs epoch nanos (µs fixtures carry no sub-µs information, so
  // cross-encoding equality requires µs-aligned inputs); mixed signs and
  // a DST-shoulder instant to catch any TZ-shifting cast
  private val rows: Seq[(Long, Long)] = Seq(
    (1L, 0L),
    (2L, 1672531200123456000L),            // 2023-01-01 00:00:00.123456 UTC
    (3L, 1667091600000001000L),            // 2022-10-30 01:00:00.000001 UTC (EU DST fold)
    (4L, -86400000000000L),                // 1969-12-31
    (5L, 4102444800999999000L))            // 2100-01-01, far future

  private def load(dir: String): Seq[(Long, java.sql.Timestamp, Long)] = {
    val df = Tables.events(spark, dir).select("event_id", "ts", "ts_ns")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    df.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
  }

  test("nanos, micros-NTZ and micros-UTC encodings yield identical (ts, ts_ns)") {
    val base = java.nio.file.Files.createTempDirectory("events_enc").toString
    io.ForeignParquet.writeEventsTs(s"$base/nanos/events.parquet", TimeUnit.NANOS, adjustedToUTC = true, rows)
    io.ForeignParquet.writeEventsTs(s"$base/us_ntz/events.parquet", TimeUnit.MICROS, adjustedToUTC = false, rows)
    io.ForeignParquet.writeEventsTs(s"$base/us_utc/events.parquet", TimeUnit.MICROS, adjustedToUTC = true, rows)

    val fromNanos = load(s"$base/nanos")
    val fromMicrosNtz = load(s"$base/us_ntz")
    val fromMicrosUtc = load(s"$base/us_utc")

    assert(fromNanos == fromMicrosNtz)
    assert(fromNanos == fromMicrosUtc)
    // ts_ns carries the exact stored nanos; ts is its µs truncation
    assert(fromNanos.map(r => (r._1, r._3)) == rows)
    assert(fromNanos.forall { case (_, ts, ns) =>
      ts.getTime == Math.floorDiv(ns, 1000000L) &&
        ts.getNanos.toLong == Math.floorMod(ns, 1000000000L) })
  }

  test("the live driver fixture loads through the schema branch without conf assumptions") {
    val df = Tables.events(spark, TestSpark.sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    assert(df.limit(1).count() == 1)
  }
}
