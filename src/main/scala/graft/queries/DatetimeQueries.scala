// (session-window batch query appended at the bottom of this pack)
package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.GF

/** Datetime surface (SURVEY §2.8; reference cpp/include/cudf/datetime.hpp:45-205,
  * dt accessor series.py:6026-6397, to_datetime core/tools/datetimes.py).
  *
  * cuDF semantics pinned here: weekday is Monday=0 (pandas), ns timestamps
  * narrow to µs (documented §1.2), month arithmetic clamps to month end.
  */
object DatetimeQueries extends QueryPack {

  // --- extract family (datetime.hpp extract_*) ------------------------------
  register("dt_extract",
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y, month(o_orderdate) AS mo, day(o_orderdate) AS dd,
      |  (dayofweek(o_orderdate) + 6) % 7 AS weekday_mon0,
      |  dayofyear(o_orderdate) AS doy,
      |  CAST(ceil(month(o_orderdate) / 3.0) AS INT) AS quarter
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val t = col("o_orderdate")
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"),
        year(t).as("y"), month(t).as("mo"), dayofmonth(t).as("dd"),
        ((dayofweek(t) + 5) % 7).as("weekday_mon0"),
        dayofyear(t).as("doy"),
        quarter(t).as("quarter"))
      .orderBy("o_orderkey")
  }

  // --- time-of-day extract on events (ts carries sub-second precision) ------
  register("dt_extract_time",
    """SELECT event_id,
      |  hour(CAST(ts AS TIMESTAMP)) AS h, minute(CAST(ts AS TIMESTAMP)) AS mi,
      |  second(CAST(ts AS TIMESTAMP)) AS sec,
      |  CAST(millisecond(CAST(ts AS TIMESTAMP)) % 1000 AS INT) AS ms
      |FROM events WHERE event_id <= 2000 ORDER BY event_id""".stripMargin) { (s, d) =>
    val t = col("ts")
    Tables.events(s, d)
      .filter(col("event_id") <= 2000)
      .select(col("event_id"),
        hour(t).as("h"), minute(t).as("mi"), second(t).as("sec"),
        (expr("ts_ns div 1000000") % 1000).cast(IntegerType).as("ms"))
      .orderBy("event_id")
  }

  // --- calendar arithmetic (add_calendrical_months datetime.hpp, last_day,
  //     is_leap_year, days_in_month) ----------------------------------------
  register("dt_calendar_arith",
    """SELECT o_orderkey,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3mo,
      |  CAST(o_orderdate + INTERVAL 45 DAY AS TIMESTAMP) AS plus_45d,
      |  last_day(o_orderdate) AS month_end,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  year(o_orderdate) % 4 = 0 AND (year(o_orderdate) % 100 <> 0 OR year(o_orderdate) % 400 = 0) AS is_leap,
      |  day(last_day(o_orderdate)) AS days_in_month
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val t = col("o_orderdate")
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"),
        add_months(t, 3).cast(TimestampType).as("plus_3mo"),
        date_add(t, 45).cast(TimestampType).as("plus_45d"),
        last_day(t).as("month_end"),
        trunc(t, "month").as("month_start"),
        GF.isLeapYear(t).as("is_leap"),
        GF.daysInMonth(t).as("days_in_month"))
      .orderBy("o_orderkey")
  }

  // --- strftime / parse round-trip (convert_datetime.hpp:71; to_datetime) ---
  register("dt_format_parse",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
      |  strftime(o_orderdate, '%d/%m/%Y') AS euro_date,
      |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS TIMESTAMP) AS reparsed
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val t = col("o_orderdate")
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"),
        date_format(t, "yyyy-MM-dd").as("iso_date"),
        date_format(t, "dd/MM/yyyy").as("euro_date"),
        to_timestamp(date_format(t, "yyyy-MM-dd"), "yyyy-MM-dd").as("reparsed"))
      .orderBy("o_orderkey")
  }

  // --- durations (DURATION_* types.hpp:221; timedelta accessor) -------------
  // shipdate − orderdate as an exact integer duration at several resolutions.
  register("dt_duration",
    """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
      |  CAST(epoch(l.l_shipdate) - epoch(o.o_orderdate) AS BIGINT) AS lag_seconds,
      |  CAST(floor((epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 86400.0) AS BIGINT) AS lag_days
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_orderkey <= 500
      |ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).filter(col("l_orderkey") <= 500)
    val o = Tables.orders(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        (col("l_shipdate").cast(TimestampType).cast(LongType) -
          col("o_orderdate").cast(TimestampType).cast(LongType)).as("lag_seconds"),
        floor((col("l_shipdate").cast(TimestampType).cast(LongType) -
          col("o_orderdate").cast(TimestampType).cast(LongType)) / 86400.0)
          .cast(LongType).as("lag_days"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  // --- timedelta components accessor (core/column/timedelta.py components;
  // dt.days/seconds/microseconds) — decompose a µs-precision duration into
  // the pandas components columns. Pure integer div/mod projection, fused
  // into the scan. (The duration here is the event's µs offset from the
  // epoch — the decomposition arithmetic is what's under test.)
  register("dt_duration_components",
    """SELECT event_id,
      |  d // 86400000000 AS days,
      |  (d % 86400000000) // 3600000000 AS hours,
      |  (d % 3600000000) // 60000000 AS minutes,
      |  (d % 60000000) // 1000000 AS seconds,
      |  (d % 1000000) // 1000 AS ms,
      |  d % 1000 AS us
      |FROM (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS d FROM events)
      |WHERE event_id <= 2000 ORDER BY event_id""".stripMargin) { (s, d) =>
    val dur = expr("ts_ns div 1000")
    Tables.events(s, d)
      .filter(col("event_id") <= 2000)
      .select(col("event_id"), dur.as("d"))
      .select(col("event_id"),
        expr("d div 86400000000").as("days"),
        expr("(d % 86400000000) div 3600000000").as("hours"),
        expr("(d % 3600000000) div 60000000").as("minutes"),
        expr("(d % 60000000) div 1000000").as("seconds"),
        expr("(d % 1000000) div 1000").as("ms"),
        expr("d % 1000").as("us"))
      .orderBy("event_id")
  }

  // --- epoch / unix time (events ts_ns keeps exact nanos; DuckDB's parquet
  //     read truncates ns→µs so only the µs view is oracle-checkable) -------
  register("dt_epoch",
    """SELECT event_id,
      |  epoch_us(CAST(ts AS TIMESTAMP)) AS epoch_us,
      |  epoch_ms(CAST(ts AS TIMESTAMP)) AS epoch_ms,
      |  CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ts_hour
      |FROM events WHERE event_id <= 2000 ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") <= 2000)
      .select(col("event_id"),
        expr("ts_ns div 1000").as("epoch_us"),
        expr("ts_ns div 1000000").as("epoch_ms"),
        date_trunc("hour", col("ts")).as("ts_hour"))
      .orderBy("event_id")
  }

  // --- event-time bucketed aggregation (the batch form of the streaming
  //     tumbling window — same expression runs under readStream, §7.6) ------
  register("dt_window_bucket",
    """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_value"))
      .orderBy("bucket", "event_type")
  }

  // --- datetime ceil/floor/round to a frequency (datetime.hpp:260-321
  // ceil/floor/round_datetimes) — computed in epoch-µs arithmetic so both
  // engines evaluate identical integer expressions (no tz/timestamp-type
  // divergence). Hour precision.
  register("dt_round_ceil",
    """WITH t AS (SELECT event_id, epoch_us(ts) AS tus FROM events WHERE event_id <= 2000)
      |SELECT event_id,
      |  tus // 3600000000 * 3600000000 AS floor_hour_us,
      |  CASE WHEN tus % 3600000000 = 0 THEN tus
      |       ELSE (tus // 3600000000 + 1) * 3600000000 END AS ceil_hour_us,
      |  CASE WHEN tus % 3600000000 >= 1800000000
      |       THEN (tus // 3600000000 + 1) * 3600000000
      |       ELSE tus // 3600000000 * 3600000000 END AS round_hour_us
      |FROM t ORDER BY event_id""".stripMargin) { (s, d) =>
    val hourUs = 3600000000L
    val q = expr(s"tus div $hourUs") // exact integer division
    Tables.events(s, d)
      .filter(col("event_id") <= 2000)
      .select(col("event_id"), expr("ts_ns div 1000").as("tus"))
      .select(col("event_id"),
        (q * hourUs).as("floor_hour_us"),
        when(col("tus") % hourUs === 0, col("tus"))
          .otherwise((q + 1) * hourUs).as("ceil_hour_us"),
        when(col("tus") % hourUs >= hourUs / 2, (q + 1) * hourUs)
          .otherwise(q * hourUs).as("round_hour_us"))
      .orderBy("event_id")
  }

  // --- session windows in BATCH (session_window(ts, gap)) — the same
  // grouping runs under readStream; the oracle derives identical sessions
  // with the gaps-and-islands construction (lag → new-session flags →
  // running session ids). 30-minute gap per user. --------------------------
  register("dt_session_window",
    """WITH x AS (
      |  SELECT user_id, epoch_us(ts) AS tus,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |y AS (
      |  SELECT user_id, tus,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, min(tus) AS session_start_us, count(*) AS n_events
      |FROM y GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
  }
}
