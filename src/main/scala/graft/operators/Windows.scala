package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Time-window operators over `events` — the batch twins of the
  * streaming pipeline's aggregations (same `window` / `session_window`
  * expressions run under Structured Streaming in
  * [[graft.streaming.TrafficPipeline]] / [[graft.streaming.Sessionize]]).
  * Oracle-checked against gaps-and-islands / generate_series SQL.
  */
object Windows {
  import QueryDef.sql

  /** Sliding 1 h window, 15 min slide (epoch-aligned, like Spark's
    * `window()`): event count + value sum per window. Scale: windows
    * assign per-row (×4 fan-out for 60/15), then partial agg — shuffle
    * carries only (window, partial) pairs. */
  val q31SlidingWindow: QueryDef = sql(
    "q31_sliding_window",
    """SELECT epoch_ms(ws) AS window_start_ms,
      |       COUNT(*) AS n_events,
      |       ROUND(SUM(value), 2) AS sum_value
      |FROM events
      |JOIN (SELECT unnest(generate_series(
      |        (SELECT date_trunc('hour', min(ts)) - INTERVAL 1 HOUR FROM events),
      |        (SELECT date_trunc('hour', max(ts)) + INTERVAL 1 HOUR FROM events),
      |        INTERVAL 15 MINUTE)) AS ws) g
      |  ON ts >= ws AND ts < ws + INTERVAL 1 HOUR
      |GROUP BY ws
      |ORDER BY window_start_ms""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        expr("unix_millis(window.start)").as("window_start_ms"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start_ms")
  }

  /** Session windows per user, 30 min inactivity gap. Spark's
    * `session_window` vs. the classic gaps-and-islands SQL — equal
    * session boundaries (new session when gap ≥ 30 min). */
  val q32SessionWindow: QueryDef = sql(
    "q32_session_window",
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id,
      |       epoch_ms(MIN(ts)) AS session_start_ms,
      |       epoch_ms(MAX(ts)) AS session_end_ms,
      |       COUNT(*) AS n_events,
      |       ROUND(SUM(value), 2) AS sum_value
      |FROM sessions
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start_ms""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        expr("unix_millis(min(ts))").as("session_start_ms"),
        expr("unix_millis(max(ts))").as("session_end_ms"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select("user_id", "session_start_ms", "session_end_ms", "n_events", "sum_value")
      .orderBy("user_id", "session_start_ms")
  }

  /** Per-ROW trailing event-time window (RANGE frame over an interval):
    * each event gets its user's 1-hour-trailing average and count —
    * the time-series feature shape (EWMA-style trailing stats) that
    * row-count frames (q66) can't express when event spacing is
    * irregular. Ordering is epoch MICROSECONDS as a long, so the range
    * offset is exact integer arithmetic; the window partitions by user,
    * so each user's timeline streams through its partition sorted once.
    */
  val q86TrailingWindow: QueryDef = sql(
    "q86_trailing_window",
    """SELECT event_id, user_id,
      |       ROUND(AVG(value) OVER (
      |         PARTITION BY user_id ORDER BY ts
      |         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) AS avg_1h,
      |       CAST(COUNT(*) OVER (
      |         PARTITION BY user_id ORDER BY ts
      |         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // exact epoch micros as the ordering key: the double round-trip
    // (cast("double") * 1e6) loses ~1 ulp at microsecond magnitudes,
    // so a boundary event exactly 1 h back could land on the wrong
    // side of the frame vs the oracle's exact INTERVAL arithmetic
    val micros = expr("unix_micros(ts)")
    val w = Window.partitionBy("user_id").orderBy(micros)
      .rangeBetween(-3600L * 1000000, 0)
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        round(avg("value").over(w), 4).as("avg_1h"),
        count(lit(1)).over(w).as("n_1h"))
      .orderBy("event_id")
  }

  val all: Seq[QueryDef] = Seq(q31SlidingWindow, q32SessionWindow, q86TrailingWindow)
}
