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

  /** Ordered FUNNEL analysis (view → click → purchase): per user, the
    * earliest view, the earliest click strictly AFTER that view, the
    * earliest purchase strictly after that click — the sequential-
    * pattern query every event-analytics stack ships (match_recognize
    * / ClickHouse windowFunnel), composed here from three conditional
    * min-aggregations. Each stage is one user-keyed aggregate whose
    * shuffle carries a single timestamp per user; the event table is
    * scanned once per stage with the stage predicate pushed into the
    * scan — no per-user sort, no window over the full event stream.
    * Conversion latency is exact µs arithmetic (the q86 rule: never
    * round-trip a timestamp through double seconds). */
  val q124Funnel: QueryDef = sql(
    "q124_funnel",
    """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t2
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t3
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM events)
      |SELECT u.user_id,
      |       CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
      |                 WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS reached_stage,
      |       ROUND((epoch_us(t3) - epoch_us(t1)) / 3600000000.0, 2) AS hours_to_convert
      |FROM u LEFT JOIN v ON u.user_id = v.user_id
      |       LEFT JOIN c ON u.user_id = c.user_id
      |       LEFT JOIN p ON u.user_id = p.user_id
      |ORDER BY u.user_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    ev.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(
        col("user_id"),
        when(col("t3").isNotNull, 3L).when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L).otherwise(0L).as("reached_stage"),
        round((expr("unix_micros(t3)") - expr("unix_micros(t1)")) / lit(3600000000.0), 2)
          .as("hours_to_convert"))
      .orderBy("user_id")
  }

  val all: Seq[QueryDef] = Seq(q31SlidingWindow, q32SessionWindow, q86TrailingWindow,
    q124Funnel)
}
