package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Product/time-series analytics over the `events` stream table plus
  * corpus-level statistics the reference's SQL-on-stream surface
  * (KafkaToKuduScala.scala:44-49 — windowed aggregation re-served as a
  * SQL relation) implies but never ships: gap-filled resampling,
  * rolling anomaly scores, active-user windows, last-touch attribution,
  * grouped regression, TF-IDF keywording, deterministic weighted
  * sampling, and a blocked fuzzy join.
  *
  * Scale posture (100 TB): every query here shuffles at most
  * (group, day-or-hour) aggregates — never raw events — except the
  * per-user windows (q136 pairs, q137 per-user sort), which shuffle one
  * small row per (user, day) / per event and parallelize by user hash.
  * Trailing windows over the pair set ride the offset-explode
  * equi-plan (7×|pairs| equi-shuffled rows — no range join, no nested
  * loop anywhere in the pack); at petabyte user counts the exact
  * distinct swaps for the sliding-HLL union (q148/q153).
  */
object Analytics {
  import QueryDef.sql

  /** Hourly downsample + forward fill: per event_type, sum(value) per
    * hour over a dense spine from the corpus' first to last hour; gaps
    * carry the last observed hour forward (`last(..., ignoreNulls)`
    * running window) and are flagged. The spine is built once from a
    * single global min/max row (broadcast cross join) and exploded with
    * `sequence` — spine size = hours × types, metadata-scale; only the
    * hourly aggregates shuffle, never raw events. */
  val q134GapfillResample: QueryDef = sql(
    "q134_gapfill_resample",
    """WITH agg AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, ROUND(SUM(value), 2) AS sv
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events),
      |grid AS (
      |  SELECT t.event_type, u.h
      |  FROM (SELECT DISTINCT event_type FROM events) t,
      |       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) u)
      |SELECT event_type, epoch_ms(h) AS hour_ms,
      |       last_value(sv IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value,
      |       sv IS NULL AS filled
      |FROM grid LEFT JOIN agg USING (event_type, h)
      |ORDER BY event_type, hour_ms""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val agg = ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum("value"), 2).as("sv"))
    val spine = ev.agg(
        date_trunc("hour", min("ts")).as("lo"),
        date_trunc("hour", max("ts")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val grid = ev.select("event_type").distinct().crossJoin(spine)
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("event_type", "h"), "left")
      .select(
        col("event_type"),
        expr("unix_millis(h)").as("hour_ms"),
        last(col("sv"), ignoreNulls = true).over(w).as("sum_value"),
        col("sv").isNull.as("filled"))
      .orderBy("event_type", "hour_ms")
  }

  /** Rolling anomaly score: per event_type daily totals with a
    * trailing-7-day (interval RANGE frame) mean/σ; z-score of each day
    * against its own trailing week, |z| > 2 flagged. Shuffle carries
    * one row per (type, day); the interval frame needs no spine — days
    * with no events simply don't exist on either engine. */
  val q135RollingZscore: QueryDef = sql(
    "q135_rolling_zscore",
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS d, SUM(value) AS total
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, epoch_ms(d) AS day_ms, ROUND(total, 2) AS total,
      |       ROUND((total - avg(total) OVER w) / NULLIF(stddev_samp(total) OVER w, 0), 4) AS z,
      |       COALESCE(ABS((total - avg(total) OVER w) / NULLIF(stddev_samp(total) OVER w, 0)) > 2, FALSE) AS anomaly
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY d
      |             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day_ms""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(sum("value").as("total"))
      // one SQL window expr so the interval RANGE frame matches the oracle
      .withColumn("avg7", expr(
        """avg(total) OVER (PARTITION BY event_type ORDER BY d
          | RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)""".stripMargin))
      .withColumn("sd7", expr(
        """stddev_samp(total) OVER (PARTITION BY event_type ORDER BY d
          | RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)""".stripMargin))
    daily.select(
      col("event_type"),
      expr("unix_millis(d)").as("day_ms"),
      round(col("total"), 2).as("total"),
      round((col("total") - col("avg7")) / nullif(col("sd7"), lit(0)), 4).as("z"),
      coalesce(
        abs((col("total") - col("avg7")) / nullif(col("sd7"), lit(0))) > 2,
        lit(false)).as("anomaly"))
      .orderBy("event_type", "day_ms")
  }

  /** Daily + trailing-7-day active users (DAU / WAU): exact distinct
    * per day, then the trailing window via the OFFSET-EXPLODE
    * equi-plan — each (day, user) pair contributes to the ≤7 target
    * days it serves (explode over 0..6, semi-filter to the day
    * spine), then one countDistinct per target day. Everything after
    * the first distinct is day×user pairs — metadata-sized vs the raw
    * events — and the window costs exactly 7×|pairs| equi-shuffled
    * rows: no nested-loop range join anywhere (the earlier non-equi
    * formulation planned a BroadcastNestedLoopJoin doing |days| ×
    * |pairs| comparisons and sat on the PlanAudit allowlist; this
    * plan removed it). At genuinely unbounded user counts the exact
    * trailing distinct still swaps for the sliding HLL union — q148,
    * same offset-explode shape over KB sketch rows instead of raw
    * pairs; this query is its exactness baseline. */
  val q136ActiveUsers: QueryDef = sql(
    "q136_active_users",
    """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
      |days AS (SELECT DISTINCT d FROM du)
      |SELECT epoch_ms(days.d) AS day_ms,
      |       (SELECT COUNT(*) FROM du WHERE du.d = days.d) AS dau,
      |       (SELECT COUNT(DISTINCT user_id) FROM du
      |         WHERE du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d) AS wau7
      |FROM days ORDER BY day_ms""".stripMargin) { (s, d) =>
    val du = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("d"), col("user_id")).distinct()
    val dau = du.groupBy("d").agg(count(lit(1)).as("dau"))
    val days = du.select(col("d").as("day")).distinct()
    val wau = du
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .withColumn("day", expr("timestampadd(DAY, off, d)"))
      .join(days, Seq("day"), "left_semi")
      .groupBy("day").agg(countDistinct("user_id").as("wau7"))
    dau.join(wau, dau("d") === wau("day"))
      .select(expr("unix_millis(d)").as("day_ms"), col("dau"), col("wau7"))
      .orderBy("day_ms")
  }

  /** Last-touch attribution: each purchase credits the most recent
    * preceding click/view by the same user within 1 day (click wins
    * ties), summarized per channel. One shuffle (user hash) + one
    * per-user sort — the classic "attribution without a self-join"
    * window plan; the strictly-preceding frame keeps a purchase from
    * attributing to itself and costs nothing extra. */
  val q137Attribution: QueryDef = sql(
    "q137_attribution",
    """WITH marked AS (
      |  SELECT event_type, ts, value,
      |         max(CASE WHEN event_type = 'click' THEN ts END) OVER w AS last_click,
      |         max(CASE WHEN event_type = 'view'  THEN ts END) OVER w AS last_view
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT CASE WHEN last_click IS NOT NULL AND last_click >= ts - INTERVAL 1 DAY
      |             AND (last_view IS NULL OR last_click >= last_view) THEN 'click'
      |            WHEN last_view IS NOT NULL AND last_view >= ts - INTERVAL 1 DAY THEN 'view'
      |            ELSE 'none' END AS channel,
      |       COUNT(*) AS n_purchases,
      |       ROUND(SUM(value), 2) AS attributed_value
      |FROM marked WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = Tables.events(s, d)
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("ts"))).over(w))
    marked.filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("last_click").isNotNull &&
             col("last_click") >= col("ts") - expr("interval 1 day") &&
             (col("last_view").isNull || col("last_click") >= col("last_view")),
          "click")
        .when(col("last_view").isNotNull &&
              col("last_view") >= col("ts") - expr("interval 1 day"), "view")
        .otherwise("none"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
           round(sum("value"), 2).as("attributed_value"))
      .orderBy("channel")
  }

  /** Grouped ordinary-least-squares via the SQL2016 regr_* aggregates
    * (slope / intercept / r² of extendedprice on quantity, per return
    * flag). Pure partial-aggregatable sums — the shuffle carries six
    * doubles per group, the textbook 100 TB-safe statistic. */
  val q138RegressionByGroup: QueryDef = sql(
    "q138_regression_by_group",
    """SELECT l_returnflag,
      |       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      |       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").cast("long").as("n"))
      .orderBy("l_returnflag")
  }

  /** Per-document TF-IDF keywords: top-3 terms by tf·ln((N+1)/(df+1)),
    * ties broken by term. One tokenize pass feeds both tf and df; df
    * joins BACK onto tf with a plain shuffle join on the token key —
    * NOT a broadcast: df is vocabulary-sized, and a vocabulary grows
    * with the corpus (1e8-1e9 terms at 100 TB), so broadcasting it is
    * the one plan that gets strictly worse at scale (VERDICT r11 #1);
    * both join sides here shuffle ∝ their own size and AQE still picks
    * a broadcast when df happens to be small. The corpus-sized
    * shuffles are the (doc, term) partial-agg — same staging as the
    * q104 postings build — and the token-keyed join. q149 is this
    * query served FROM that stored index (tf/df/N read, zero
    * re-tokenization), hash-equal by construction. */
  private val q139Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, t AS token
      |  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS u(t)),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
      |scored AS (
      |  SELECT doc_id, token, ROUND(tf * ln((n + 1.0) / (df + 1.0)), 4) AS score
      |  FROM tf JOIN df USING (token), n)
      |SELECT doc_id, token, score, rk
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
      |      FROM scored)
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  val q139TfidfKeywords: QueryDef = sql(
    "q139_tfidf_keywords", q139Sql) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = tf.select("doc_id").distinct().agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log((col("n") + lit(1.0)) / (col("df") + lit(1.0))), 4))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("doc_id", "token", "score", "rk")
      .orderBy("doc_id", "rk")
  }

  /** Fuzzy (edit-distance) join by sorted neighborhood (Hernández–
    * Stolfo): within each (lang, 50-char length bucket) block, docs
    * sort by their 40-char prefix and each doc verifies against only
    * its W=5 successors in sort order — levenshtein ≤ 20 keeps the
    * pair. Candidates are n·W, LINEAR in block size (a plain blocked
    * self-join is quadratic and melts on duplicate-dense blocks — the
    * 10× probe proved it at 88×); near-identical prefixes sort
    * adjacent, so low-distance pairs survive the window.
    *
    * The successor window is an OFFSET-EXPLODE EQUI-JOIN (the q136
    * re-plan): each ranked row emits its W successor ranks as join
    * keys and matches on (lang, bucket, rk) exactly — W·n join rows.
    * The first version equi-joined on the block key alone and filtered
    * the rank band AFTER: every probe still iterated its whole block,
    * an O(Σ|block|²) stream the k=30 decorrelated probe exposed (the
    * 10→30 segment grew ~4× on 3× data while this plan stayed flat —
    * both plans re-measured side-by-side by `graft.FuzzyProbe`; the
    * recorded sweep and its reading live in SCALING.md's round-14
    * section) even though the FILTERED output was linear all along. */
  val q140FuzzySortedNeighborhood: QueryDef = sql(
    "q140_fuzzy_sorted_neighborhood",
    """WITH b AS (
      |  SELECT doc_id, lang, CAST(floor(n_chars / 50.0) AS BIGINT) AS bucket, left(text, 40) AS prefix
      |  FROM documents),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, bucket ORDER BY prefix, doc_id) AS rk
      |  FROM b)
      |SELECT least(a.doc_id, c.doc_id) AS doc_a, greatest(a.doc_id, c.doc_id) AS doc_b,
      |       CAST(levenshtein(a.prefix, c.prefix) AS BIGINT) AS dist
      |FROM r a JOIN r c ON a.lang = c.lang AND a.bucket = c.bucket
      |  AND c.rk > a.rk AND c.rk <= a.rk + 5
      |WHERE levenshtein(a.prefix, c.prefix) <= 20
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val b = Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / 50.0).cast("long").as("bucket"),
      substring(col("text"), 1, 40).as("prefix"))
    // Explicitly co-partition on the block key: the input is file-
    // partition-starved (a small parquet reads as one split) and a
    // broadcast join would inherit that, running every levenshtein on
    // a single core. Same-key same-N repartition → one exchange feeds
    // both the rank window and the join.
    val n = s.sparkContext.defaultParallelism * 2
    val w = Window.partitionBy("lang", "bucket").orderBy("prefix", "doc_id")
    val r = b.repartition(n, col("lang"), col("bucket"))
      .withColumn("rk", row_number().over(w))
    val a = r.select(col("doc_id").as("ida"), col("lang"), col("bucket"),
      col("prefix").as("pa"), col("rk").as("rka"))
      .withColumn("rk", explode(expr("sequence(rka + 1, rka + 5)")))
    val c = r.select(col("doc_id").as("idb"), col("lang"), col("bucket"),
      col("prefix").as("pb"), col("rk"))
    a.join(c.hint("shuffle_hash"), Seq("lang", "bucket", "rk"))
      .withColumn("dist", levenshtein(col("pa"), col("pb")).cast("long"))
      .filter(col("dist") <= 20)
      .select(
        least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"),
        col("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis):
    * rank by ln(u)/w descending where u is the engine-reproducible
    * multiplicative-hash uniform (q59's split primitive) and w the
    * document's char weight — integer hash → exact same u on any
    * engine; adjacent key gaps (~1e-8 here) dwarf double noise, so the
    * selected SET is deterministic. Top-k via one TakeOrdered pass —
    * no global sort, no collect. Domain guards (ADVICE r11): the
    * weight clamps to ≥1 (a zero-length doc would make ln(u)/0 a
    * -Inf/NaN key, and NaN ordering diverges across engines), and the
    * multiplicative hash masks doc_id to 28 bits BEFORE the multiply —
    * 2^28 · 2654435761 < 2^63, so the product never wraps BIGINT
    * (Spark wraps silently where DuckDB errors; the mask keeps both
    * engines in the exact-integer domain at any doc_id). */
  val q141WeightedSample: QueryDef = sql(
    "q141_weighted_sample",
    """WITH w AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
      |         GREATEST(CAST(n_chars AS DOUBLE), 1.0) AS wt,
      |         ((((doc_id % 268435456) * 2654435761) % 4294967296) + 1.0) / 4294967297.0 AS u
      |  FROM documents),
      |keyed AS (SELECT doc_id, weight, ln(u) / wt AS k FROM w)
      |SELECT doc_id, weight,
      |       ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS rank
      |FROM keyed QUALIFY rank <= 25 ORDER BY rank""".stripMargin) { (s, d) =>
    val keyed = Tables.documents(s, d).select(
      col("doc_id"),
      col("n_chars").cast("long").as("weight"),
      (log(((((col("doc_id") % lit(268435456L)) * lit(2654435761L)) % lit(4294967296L)) +
            lit(1.0)) / lit(4294967297.0)) /
        greatest(col("n_chars").cast("double"), lit(1.0))).as("k"))
    // TakeOrderedAndProject bounds the survivors to 25 BEFORE the rank
    // window touches them — the unpartitioned row_number only ever sees
    // k rows, never the corpus.
    keyed.orderBy(col("k").desc, col("doc_id")).limit(25)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("k").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "weight", "rank")
      .orderBy("rank")
  }

  /** Market-basket pair mining: parts co-occurring in an order, with
    * support and lift (observed co-rate over independence). The
    * self-join shuffles on the order key only — pair fan-out is bounded
    * by order size², never corpus² — and the per-part counts are
    * dim-sized, so they broadcast. The frequent-itemset primitive. */
  val q142MarketBasket: QueryDef = sql(
    "q142_market_basket",
    """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
      |pc AS (SELECT p, COUNT(*) AS c FROM op GROUP BY 1),
      |pairs AS (
      |  SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS support
      |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2)
      |SELECT CAST(part_a AS BIGINT) AS part_a, CAST(part_b AS BIGINT) AS part_b,
      |       support,
      |       ROUND(support * n.n_orders / (ca.c * 1.0 * cb.c), 4) AS lift
      |FROM pairs JOIN pc ca ON part_a = ca.p JOIN pc cb ON part_b = cb.p, n
      |ORDER BY support DESC, part_a, part_b LIMIT 20""".stripMargin) { (s, d) =>
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val nOrders = op.agg(countDistinct("o").as("n_orders"))
    val pc = op.groupBy("p").agg(count(lit(1)).as("c"))
    val a = op.select(col("o"), col("p").as("part_a"))
    val b = op.select(col("o"), col("p").as("part_b"))
    val pairs = a.join(b, "o")
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("support"))
    pairs
      .join(broadcast(pc.select(col("p").as("part_a"), col("c").as("ca"))), "part_a")
      .join(broadcast(pc.select(col("p").as("part_b"), col("c").as("cb"))), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(
        col("part_a").cast("long").as("part_a"),
        col("part_b").cast("long").as("part_b"),
        col("support"),
        round(col("support") * col("n_orders") / (col("ca") * lit(1.0) * col("cb")), 4)
          .as("lift"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Session-level conversion: q32's 30-min-gap sessions, bucketed by
    * size, with the share that contain a purchase. Two window passes +
    * two aggs, all partitioned by user — the composition every product
    * funnel report is made of. */
  val q143SessionConversion: QueryDef = sql(
    "q143_session_conversion",
    """WITH marked AS (
      |  SELECT user_id, ts, event_type,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id,
      |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid,
      |         event_type
      |  FROM marked),
      |per_session AS (
      |  SELECT user_id, sid, COUNT(*) AS n_events,
      |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      |  FROM sessions GROUP BY 1, 2)
      |SELECT CASE WHEN n_events <= 2 THEN 'short'
      |            WHEN n_events <= 5 THEN 'medium' ELSE 'long' END AS bucket,
      |       COUNT(*) AS n_sessions,
      |       CAST(SUM(converted) AS BIGINT) AS n_converted,
      |       ROUND(SUM(converted) / (COUNT(*) * 1.0), 4) AS conversion_rate
      |FROM per_session GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts")
    val run = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = Tables.events(s, d)
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(w).isNull ||
             expr("unix_micros(ts)") - expr("unix_micros(lag(ts, 1) over (partition by user_id order by ts))") >= 1800000000L,
          1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(run))
    val perSession = sessions.groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
           max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
    perSession
      .withColumn("bucket",
        when(col("n_events") <= 2, "short")
          .when(col("n_events") <= 5, "medium").otherwise("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_sessions"),
           sum("converted").cast("long").as("n_converted"),
           round(sum("converted") / (count(lit(1)) * lit(1.0)), 4).as("conversion_rate"))
      .orderBy("bucket")
  }

  /** Inter-event time statistics per event type: lag gaps within each
    * (user, type) timeline, then exact percentiles of the gap
    * distribution (Spark's exact `percentile` ≡ DuckDB quantile_cont —
    * linear interpolation on the sorted multiset; the gaps are µs-exact
    * doubles, so interpolation halving is bit-reproducible). */
  val q144IntereventGaps: QueryDef = sql(
    "q144_interevent_gaps",
    """WITH g AS (
      |  SELECT event_type,
      |         CAST(date_diff('microsecond',
      |                lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id),
      |                ts) AS DOUBLE) / 1000000.0 AS gap_s
      |  FROM events)
      |SELECT event_type,
      |       CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
      |       ROUND(AVG(gap_s), 2) AS avg_gap_s,
      |       ROUND(quantile_cont(gap_s, 0.5), 2) AS p50_gap_s,
      |       ROUND(quantile_cont(gap_s, 0.95), 2) AS p95_gap_s,
      |       ROUND(MAX(gap_s), 2) AS max_gap_s
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("gap_s",
        (expr("unix_micros(ts)") - expr("unix_micros(lag(ts, 1) over (partition by user_id, event_type order by ts, event_id))"))
          .cast("double") / 1000000.0)
      .filter(col("gap_s").isNotNull)
      .groupBy("event_type")
      .agg(
        count("gap_s").as("n_gaps"),
        round(avg("gap_s"), 2).as("avg_gap_s"),
        round(expr("percentile(gap_s, 0.5)"), 2).as("p50_gap_s"),
        round(expr("percentile(gap_s, 0.95)"), 2).as("p95_gap_s"),
        round(max("gap_s"), 2).as("max_gap_s"))
      .orderBy("event_type")
  }

  /** Shannon entropy of each document's token distribution — the
    * vocabulary-diversity quality signal (low entropy = repetitive /
    * boilerplate). One (doc, token) groupBy; the per-doc total rides
    * a same-key window, so the plan is a single exchange. */
  val q145TokenEntropy: QueryDef = sql(
    "q145_token_entropy",
    """WITH tf AS (
      |  SELECT doc_id, t AS token, COUNT(*) AS c
      |  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS u(t)
      |  GROUP BY 1, 2),
      |d AS (SELECT doc_id, SUM(c) AS n FROM tf GROUP BY 1)
      |SELECT tf.doc_id,
      |       CAST(d.n AS BIGINT) AS n_tokens,
      |       ROUND(-SUM((c / (d.n * 1.0)) * ln(c / (d.n * 1.0))), 4) AS entropy
      |FROM tf JOIN d ON tf.doc_id = d.doc_id
      |GROUP BY tf.doc_id, d.n ORDER BY tf.doc_id""".stripMargin) { (s, d) =>
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val withN = tf.withColumn("n", sum("c").over(Window.partitionBy("doc_id")))
    withN.groupBy("doc_id")
      .agg(
        first("n").cast("long").as("n_tokens"),
        round(-sum((col("c") / (col("n") * lit(1.0))) *
          log(col("c") / (col("n") * lit(1.0)))), 4).as("entropy"))
      .orderBy("doc_id")
  }

  /** Bigram language-model NLL per document (add-1 smoothing over the
    * corpus vocabulary) — q116's unigram quality score upgraded to
    * conditional probabilities. Bigrams come from one zip_with over the
    * token array (no double explode); the unigram counts attach to the
    * BIGRAM-VOCAB-sized count table first (vocab×vocab' shuffle join on
    * w1 — both sides vocabulary-scale, neither broadcast: a vocabulary
    * grows with the corpus, so broadcasting `uni` is the plan that gets
    * strictly worse at 100× — VERDICT r11 #1), and only then does the
    * enriched count table join the data-sized bigram stream on its
    * (w1, w2) key, the shuffle the query needs anyway. Only the
    * single-row vocab size broadcasts. */
  val q146BigramNll: QueryDef = sql(
    "q146_bigram_nll",
    """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
      |uni AS (
      |  SELECT u.t AS w, COUNT(*) AS c1
      |  FROM t, unnest(toks) AS u(t) GROUP BY 1),
      |v AS (SELECT COUNT(*) AS v FROM uni),
      |bg AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM t, unnest(range(1, len(toks))) AS r(i)),
      |bgc AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2)
      |SELECT bg.doc_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |       ROUND(-AVG(ln((bgc.c2 + 1.0) / (uni.c1 + v.v))), 4) AS bigram_nll
      |FROM bg JOIN bgc ON bg.w1 = bgc.w1 AND bg.w2 = bgc.w2
      |        JOIN uni ON bg.w1 = uni.w, v
      |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
    val uni = t.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val v = uni.agg(count(lit(1)).as("v"))
    val bg = t.select(col("doc_id"), explode(expr(
        """zip_with(slice(toks, 1, size(toks) - 1),
          |         slice(toks, 2, size(toks) - 1),
          |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .join(uni.withColumnRenamed("w", "w1"), "w1")
    bg.join(bgc, Seq("w1", "w2"))
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(-avg(log((col("c2") + lit(1.0)) / (col("c1") + col("v")))), 4)
          .as("bigram_nll"))
      .orderBy("doc_id")
  }

  /** Incremental aggregate maintenance (materialized-view refresh):
    * a daily (event_type, day) rollup persists in the
    * [[graft.streaming.UpsertStore]]; a new event batch advances it by
    * aggregating ONLY the delta and additively merging into the stored
    * rows for the touched keys — base events are never rescanned, and
    * store traffic ∝ |delta keys| (the rollup itself is groups-sized,
    * metadata next to the event log). The declared output serves from
    * the store after the honest build(80%) → extend(20%) lifecycle;
    * the full-recompute oracle proves merge ≡ recompute — the additive
    * twin of q133's sketch-merge. Its continuous face is
    * [[graft.streaming.RollupMaintainer]], which runs exactly this
    * batch body per micro-batch with the txn-ledgered exactly-once
    * discipline an additive (non-idempotent) merge needs. */
  val q147RollupIvm: QueryDef = sql(
    "q147_rollup_ivm",
    """SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day_ms,
      |       COUNT(*) AS n_events,
      |       ROUND(SUM(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY event_type, day_ms""".stripMargin) { (s, d) =>
    import graft.streaming.UpsertStore
    val ev = Tables.events(s, d).select(
      col("event_type"), expr("unix_millis(date_trunc('day', ts))").as("day_ms"),
      col("event_id"), col("value"))
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("event_type", "day_ms")
      .agg(count(lit(1)).as("n_events"), sum("value").as("sv"))
    val cut = ev.agg(expr("percentile(event_id, 0.8)")).head().getDouble(0).toLong
    val path = graft.Scratch.dir("graft_rollup_ivm") + "/store"
    val keys = Seq("event_type", "day_ms")
    // BUILD on the base batch
    UpsertStore.replace(s, path, rollup(ev.filter(col("event_id") <= cut)),
      keys, assumeKeyUnique = true)
    // EXTEND: aggregate the delta alone, additively merge into the
    // stored rows it touches (left join keeps traffic delta-keyed)
    val deltaAgg = rollup(ev.filter(col("event_id") > cut))
    val stored = UpsertStore.read(s, path).get
      .select(col("event_type"), col("day_ms"),
        col("n_events").as("n0"), col("sv").as("sv0"))
    val merged = deltaAgg.join(stored, keys, "left")
      .select(col("event_type"), col("day_ms"),
        (col("n_events") + coalesce(col("n0"), lit(0L))).as("n_events"),
        (col("sv") + coalesce(col("sv0"), lit(0.0))).as("sv"))
    UpsertStore.upsert(s, path, merged, keys, assumeKeyUnique = true)
    // SERVE from the store
    UpsertStore.read(s, path).get
      .select(col("event_type"), col("day_ms"),
        col("n_events"), round(col("sv"), 2).as("sum_value"))
      .orderBy("event_type", "day_ms")
  }

  /** INCREMENTAL MATERIALIZED JOIN VIEW (round 16,
    * [[graft.streaming.JoinViewMaintainer]]) — the JOIN cousin of
    * q147's aggregate IVM: `orders ⋈ customer` materialized in a
    * keyed store and maintained by deltas on EITHER side, never by a
    * view recompute. Lifecycle exercises both delta paths with live
    * consequences: bootstrap on 80% of orders × 80% of customers
    * (orders referencing absent customers are NOT view rows yet —
    * inner-join semantics), `ingestLeft` folds the remaining orders
    * in (ΔA ⋈ B_stored; those pointing at still-absent customers stay
    * pending), then `ingestRight` folds the remaining customers in
    * (A_stored ⋈ ΔB — each late dimension row MATERIALIZES every
    * order that was waiting for it, including ones from the ΔA
    * batch). Final view ≡ the full join, which is exactly what the
    * oracle replays. Scale shape: both paths shuffle delta-keyed rows
    * only, with the delta broadcast against the stored side — the
    * fact table is never rescanned to absorb a dimension trickle. */
  val q194JoinViewIvm: QueryDef = sql(
    "q194_join_view_ivm",
    """SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val cutO = orders.agg(expr("percentile(o_orderkey, 0.8)")).head().getDouble(0).toLong
    val cutC = cust.agg(expr("percentile(c_custkey, 0.8)")).head().getDouble(0).toLong
    val m = new graft.streaming.JoinViewMaintainer(
      s, graft.Scratch.dir("graft_join_view") + "/view")
    m.bootstrap(orders.filter(col("o_orderkey") <= cutO),
      cust.filter(col("c_custkey") <= cutC))
    m.ingestLeft(orders.filter(col("o_orderkey") > cutO), Some(0L))
    m.ingestRight(cust.filter(col("c_custkey") > cutC), Some(1L))
    m.current.orderBy("o_orderkey")
  }

  /** q194's maintained join view read back in PURE SQL by CATALOG
    * table name (the q179/q193 idiom applied to the view family):
    * [[graft.streaming.JoinViewMaintainer.registerCatalog]] exposes
    * the view as `graft.<t>` (+ `__left`/`__right` side tables), so
    * an auditor — or any BI tool speaking SQL — reads the maintained
    * join with no Scala API in the path, with `VERSION AS OF` time
    * travel riding the store contract for free. Shares q194's
    * full-join oracle: catalog read ≡ the maintainer's own `current`,
    * hash-proven. */
  val q196CatalogJoinViewSql: QueryDef = sql(
    "q196_catalog_join_view_sql",
    q194JoinViewIvm.oracle.get) { (s, d) =>
    if (!s.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.UpsertCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.path", graft.Scratch.dir("graft-catalog-wh"))
    }
    val orders = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val cutO = orders.agg(expr("percentile(o_orderkey, 0.8)")).head().getDouble(0).toLong
    val cutC = cust.agg(expr("percentile(c_custkey, 0.8)")).head().getDouble(0).toLong
    val t = s"jv_${PairGraph.dirKey64(d)}"
    // build-or-gate-serve AT the warehouse path (the catalog resolves
    // physical dirs from its warehouse, so the store must live there);
    // replayed runs gate-skip the bootstrap and ledger-skip the ingests
    val m = graft.streaming.JoinViewMaintainer.registerCatalog(s, t,
      orders.filter(col("o_orderkey") <= cutO),
      cust.filter(col("c_custkey") <= cutC))
    m.ingestLeft(orders.filter(col("o_orderkey") > cutO), Some(0L))
    m.ingestRight(cust.filter(col("c_custkey") > cutC), Some(1L))
    s.sql(
      s"""SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
         |FROM graft.`$t` ORDER BY o_orderkey""".stripMargin)
  }

  /** MULTI-WAY (star) materialized view through the SCHEMA-GENERIC
    * [[graft.streaming.JoinViewMaintainer]] (VERDICT r16 #2): lineitem
    * ⋈ part ⋈ supplier — the q125 star-join shape — kept materialized
    * and maintained by deltas on ALL THREE sides. The ΔV union covers
    * every side: the fact delta joins the stored dimensions
    * (broadcast-delta probe), and each dimension delta rewrites
    * exactly its facts' view rows (fan-out-sized), including facts
    * from the EARLIER fact delta that were waiting for a late part or
    * supplier (inner-join semantics: a fact missing any dimension is
    * not a view row until every dimension arrives). The synthetic
    * lineitem declares NO primary key — (l_orderkey, l_linenumber)
    * repeats — so the fact store keys on the full projected tuple
    * (unique at every SF; facts are insert-shaped here — the keyed
    * update/FK-repoint semantics are spec-pinned on the 2-way
    * fixture, whose orders DO have a PK); the FK-redundant dimension
    * keys drop from the projection. Oracle = the full 3-way join
    * replay — bootstrap (80% of each side) + the three deltas must
    * converge to it, hash-proven. Scale shape: no view recompute
    * anywhere; every ingest shuffles delta-keyed rows with the delta
    * broadcast against the stored sides. */
  val q198StarViewIvm: QueryDef = sql(
    "q198_star_view_ivm",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      |       p_name, p_brand, s_name
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val part = s.read.parquet(s"$d/part.parquet")
    val supp = s.read.parquet(s"$d/supplier.parquet")
    val cutL = li.agg(expr("percentile(l_orderkey, 0.8)")).head().getDouble(0).toLong
    val cutP = part.agg(expr("percentile(p_partkey, 0.8)")).head().getDouble(0).toLong
    val cutS = supp.agg(expr("percentile(s_suppkey, 0.8)")).head().getDouble(0).toLong
    val m = new graft.streaming.JoinViewMaintainer(
      s, graft.Scratch.dir("graft_star_view") + "/view",
      factKeys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity"),
      factCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity"),
      dims = Seq(
        graft.streaming.DimSpec(Seq("l_partkey"), Seq("p_partkey"),
          Seq("p_partkey", "p_name", "p_brand")),
        graft.streaming.DimSpec(Seq("l_suppkey"), Seq("s_suppkey"),
          Seq("s_suppkey", "s_name"))))
    m.bootstrap(li.filter(col("l_orderkey") <= cutL),
      Seq(part.filter(col("p_partkey") <= cutP),
        supp.filter(col("s_suppkey") <= cutS)))
    m.ingestFact(li.filter(col("l_orderkey") > cutL), Some(0L))
    m.ingestDim(0, part.filter(col("p_partkey") > cutP), Some(1L))
    m.ingestDim(1, supp.filter(col("s_suppkey") > cutS), Some(2L))
    m.current.orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_quantity")
  }

  /** VIEW-FAMILY TAKEDOWN (round 18 — VERDICT r17 #6: `retractFact` /
    * `retractDim` existed and were spec-pinned, but no declared query
    * exercised them). The full lifecycle on the q194 view: bootstrap
    * (80% × 80%) → both delta ingests → a FACT takedown (every order
    * with `o_orderkey % 97 = 0` — both stores lose the key) → a
    * DIMENSION takedown (every customer with `c_custkey % 31 = 0` —
    * the dim store loses the keys and the view loses exactly the
    * referencing rows, fan-out-sized, while the orphaned facts stay
    * pending) → a PARTIAL RE-INGEST of the retracted dimension (the
    * `% 62 = 0` half comes back, re-materializing its pending facts —
    * the standing late-arrival semantics, post-takedown) → serve.
    * Oracle = the inner join with both deletions applied, hash-proven;
    * the retraction ids ride the view family's separate retraction
    * ledger, so the later dim re-ingest (its own per-dim ingest
    * sequence) is untouched by them. Scale shape: both retractions are
    * keyed deletes sized by the takedown set and its fan-out — the
    * fact table is never rescanned. */
  val q201ViewTakedown: QueryDef = sql(
    "q201_view_takedown",
    """SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey % 97 <> 0
      |  AND (c_custkey % 31 <> 0 OR c_custkey % 62 = 0)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val cutO = orders.agg(expr("percentile(o_orderkey, 0.8)")).head().getDouble(0).toLong
    val cutC = cust.agg(expr("percentile(c_custkey, 0.8)")).head().getDouble(0).toLong
    val m = new graft.streaming.JoinViewMaintainer(
      s, graft.Scratch.dir("graft_view_takedown") + "/view")
    m.bootstrap(orders.filter(col("o_orderkey") <= cutO),
      cust.filter(col("c_custkey") <= cutC))
    m.ingestLeft(orders.filter(col("o_orderkey") > cutO), Some(0L))
    m.ingestRight(cust.filter(col("c_custkey") > cutC), Some(0L))
    m.retractFact(orders.filter(col("o_orderkey") % 97 === 0)
      .select("o_orderkey"), txnId = 1L)
    m.retractDim(0, cust.filter(col("c_custkey") % 31 === 0)
      .select("c_custkey"), txnId = 2L)
    m.ingestRight(cust.filter(col("c_custkey") % 62 === 0), Some(1L))
    m.current.orderBy("o_orderkey")
  }

  /** Sliding-HLL trailing-7-day active users — q136's WAU for
    * unbounded user cardinality. One DataSketches HLL sketch per day is
    * the ONLY user-sized aggregation (partial+final, map-side
    * combining); each day's sketch then explodes onto the ≤7 target
    * days it serves and union-merges per target day — a pure
    * equi-shuffle on the day key carrying |days|×7 KB-scale sketch
    * rows. No nested-loop range join anywhere (q136's trailing window
    * is a BroadcastNestedLoopJoin over the full (day,user) pair set —
    * this is the swap its scaladoc names). The exact side uses the
    * SAME offset-explode equi-plan over the distinct pair set (7×|pairs|
    * rows, still no BNLJ), because the declared contract is q126's:
    * exact value + in-query |est−exact| ≤ max(5, 5·rsd·exact) flag,
    * rsd = 1.04/√2¹² ≈ 1.63% at lgK=12 — the oracle pins the exact
    * WAU and asserts the flag is TRUE everywhere. */
  val q148HllWau: QueryDef = sql(
    "q148_hll_wau",
    """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
      |days AS (SELECT DISTINCT d FROM du)
      |SELECT epoch_ms(days.d) AS day_ms,
      |       (SELECT COUNT(DISTINCT user_id) FROM du
      |         WHERE du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d) AS wau_exact,
      |       TRUE AS within_bound
      |FROM days ORDER BY day_ms""".stripMargin) { (s, d) =>
    val du = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("d"), col("user_id")).distinct()
    val days = du.select(col("d").as("day")).distinct()
    // each source day contributes to target days d..d+6; spine gaps
    // drop out via the semi-join — the exact set the oracle's BETWEEN
    // produces (UTC session TZ keeps day arithmetic DST-free)
    def explodeOffsets(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .withColumn("day", expr("timestampadd(DAY, off, d)"))
      .join(days, Seq("day"), "left_semi")
    val exact = explodeOffsets(du)
      .groupBy("day").agg(countDistinct("user_id").as("wau_exact"))
    val daily = du.groupBy("d").agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
    val est = explodeOffsets(daily)
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    exact.join(est, "day")
      .select(expr("unix_millis(day)").as("day_ms"), col("wau_exact"),
        (abs(col("est") - col("wau_exact")) <=
          greatest(lit(5.0), lit(5 * 0.0163) * col("wau_exact"))).as("within_bound"))
      .orderBy("day_ms")
  }

  /** q139's TF-IDF keywords served FROM the stored postings index —
    * the promise in q139's scaladoc made real: tf, df, and N all come
    * off the [[PostingsIndex]] persistence (build-once, corpus-keyed
    * store path shared with q104), ZERO re-tokenization at serve time.
    * The scoring expression is q139's token-for-token, so q139's
    * from-scratch oracle proves serve ≡ recompute through the
    * persistence roundtrip, hash-proven — the q104 discipline applied
    * to the second scorer the same index can answer. */
  val q149TfidfFromIndex: QueryDef = sql(
    "q149_tfidf_index_serve", q139Sql) { (s, d) =>
    val store = PostingsIndex.storePath(d)
    PostingsIndex.ensure(s, Tables.documents(s, d), store)
    PostingsIndex.tfidfTopK(s, store, 3)
  }

  /** q140's fuzzy join with FULL-TEXT verification: identical
    * sorted-neighborhood candidate generation (block → prefix sort →
    * W=5 window → prefix-distance ≤ 20), then the surviving candidate
    * pairs — already bounded to n·W — join BACK to the corpus by doc
    * id for a levenshtein over the complete texts, kept when the
    * distance is ≤ 25% of the longer text. The id join-back means the
    * block shuffle never carries full documents (only 40-char
    * prefixes); the expensive verify runs on the candidate set alone,
    * which is why a linear candidate generator is worth having at all.
    * `dist` here is the REAL edit distance — q140's prefix-distance
    * variant remains as the cheap triage tier. */
  val q150FuzzyFullVerify: QueryDef = sql(
    "q150_fuzzy_full_verify",
    """WITH b AS (
      |  SELECT doc_id, lang, CAST(floor(n_chars / 50.0) AS BIGINT) AS bucket,
      |         left(text, 40) AS prefix, text
      |  FROM documents),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, bucket ORDER BY prefix, doc_id) AS rk
      |  FROM b)
      |SELECT least(a.doc_id, c.doc_id) AS doc_a, greatest(a.doc_id, c.doc_id) AS doc_b,
      |       CAST(levenshtein(a.text, c.text) AS BIGINT) AS dist
      |FROM r a JOIN r c ON a.lang = c.lang AND a.bucket = c.bucket
      |  AND c.rk > a.rk AND c.rk <= a.rk + 5
      |WHERE levenshtein(a.prefix, c.prefix) <= 20
      |  AND levenshtein(a.text, c.text) <= 0.25 * greatest(length(a.text), length(c.text))
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val b = Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / 50.0).cast("long").as("bucket"),
      substring(col("text"), 1, 40).as("prefix"))
    val n = s.sparkContext.defaultParallelism * 2
    val w = Window.partitionBy("lang", "bucket").orderBy("prefix", "doc_id")
    val r = b.repartition(n, col("lang"), col("bucket"))
      .withColumn("rk", row_number().over(w))
    // offset-explode equi-join (see q140's scaladoc): W·n candidate
    // rows by construction, not an O(Σ|block|²) post-filtered stream
    val a = r.select(col("doc_id").as("ida"), col("lang"), col("bucket"),
      col("prefix").as("pa"), col("rk").as("rka"))
      .withColumn("rk", explode(expr("sequence(rka + 1, rka + 5)")))
    val c = r.select(col("doc_id").as("idb"), col("lang"), col("bucket"),
      col("prefix").as("pb"), col("rk"))
    val cand = a.join(c.hint("shuffle_hash"), Seq("lang", "bucket", "rk"))
      .filter(levenshtein(col("pa"), col("pb")) <= 20)
      .select("ida", "idb")
    val t = Tables.documents(s, d).select(col("doc_id"), col("text"))
    cand
      .join(t.select(col("doc_id").as("ida"), col("text").as("ta")), "ida")
      .join(t.select(col("doc_id").as("idb"), col("text").as("tb")), "idb")
      // two semantics-free guards around the O(len²) levenshtein (the
      // 10× probe read 201× without them on a dup-dense corpus, where
      // most surviving candidates are exact clones): a length gap
      // above the threshold can never pass (lev ≥ |len_a − len_b|),
      // and identical texts are dist 0 by definition — the equality
      // branch turns the dominant dup-dense term into a string compare
      .filter(abs(length(col("ta")) - length(col("tb"))) <=
        lit(0.25) * greatest(length(col("ta")), length(col("tb"))))
      .withColumn("dist",
        when(col("ta") === col("tb"), lit(0L))
          .otherwise(levenshtein(col("ta"), col("tb")).cast("long")))
      .filter(col("dist") <= lit(0.25) * greatest(length(col("ta")), length(col("tb"))))
      .select(
        least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"),
        col("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** STRATIFIED weighted sampling without replacement — q141's
    * Efraimidis–Spirakis key drawn per language: top-5 docs per lang by
    * ln(u)/w with the same deterministic multiplicative-hash uniform
    * and the same domain guards. The per-group selection runs through
    * the bounded-heap [[graft.functions.TopKAggregate]] — each map
    * task keeps a 5-entry heap per group and the final shuffle carries
    * ≤ 5 rows per (group × partition), never the corpus — where a rank
    * window would sort every stratum end-to-end (and the oracle's
    * QUALIFY does exactly that, pinning the heap's tie discipline:
    * score desc, doc_id asc). Weights ride a broadcast join of the
    * 5·|langs| winners back onto the corpus scan. */
  val q152StratifiedSample: QueryDef = sql(
    "q152_stratified_sample",
    """WITH w AS (
      |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
      |         GREATEST(CAST(n_chars AS DOUBLE), 1.0) AS wt,
      |         ((((doc_id % 268435456) * 2654435761) % 4294967296) + 1.0) / 4294967297.0 AS u
      |  FROM documents),
      |keyed AS (SELECT doc_id, lang, weight, ln(u) / wt AS k FROM w)
      |SELECT lang, doc_id, weight,
      |       ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rank
      |FROM keyed QUALIFY rank <= 5 ORDER BY lang, rank""".stripMargin) { (s, d) =>
    val keyed = Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      (log(((((col("doc_id") % lit(268435456L)) * lit(2654435761L)) % lit(4294967296L)) +
            lit(1.0)) / lit(4294967297.0)) /
        greatest(col("n_chars").cast("double"), lit(1.0))).as("k"))
    val top = keyed.groupBy("lang")
      .agg(graft.functions.TopKFunctions
        .top_k_by_score(col("k"), col("doc_id"), 5).as("hits"))
      .select(col("lang"), posexplode(col("hits")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"))
    Tables.documents(s, d).select(col("doc_id"), col("n_chars").cast("long").as("weight"))
      .join(broadcast(top), "doc_id")
      .select("lang", "doc_id", "weight", "rank")
      .orderBy("lang", "rank")
  }

  /** ARBITRARY trailing-window distinct users served from a per-day
    * HLL sketch store — the property that makes the sketch store worth
    * persisting at all: ONE per-day sketch table answers every window
    * length after the fact (7-day and 28-day here, from the same
    * rows), where exact distinct would rescan raw events per window.
    * Build: one user-sized aggregation into |days| KB-scale binaries.
    * Serve: filter the ≤w stored rows, one `hll_union_agg`, estimate —
    * metadata I/O regardless of corpus size. Declared with the q126
    * contract (exact + 5·rsd bound flag, both windows anchored at the
    * corpus' last day), so the oracle pins exactness and the flag pins
    * the sketch. */
  private val q153Sql: String =
    """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
      |mx AS (SELECT MAX(d) AS mxd FROM du)
      |SELECT CAST(v.w AS BIGINT) AS window_days,
      |       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM du, mx
      |         WHERE epoch_ms(du.d) > epoch_ms(mx.mxd) - CAST(v.w AS BIGINT) * 86400000) AS n_exact,
      |       TRUE AS within_bound
      |FROM (VALUES (7), (28)) v(w) ORDER BY window_days""".stripMargin

  val q153HllWindowServe: QueryDef = sql(
    "q153_hll_window_serve", q153Sql) { (s, d) =>
    import graft.streaming.UpsertStore
    val du = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("d"), col("user_id")).distinct()
      .withColumn("day_ms", expr("unix_millis(d)"))
    val path = graft.Scratch.dir("graft_hll_days") + "/store"
    UpsertStore.replace(s, path,
      du.groupBy("day_ms").agg(hll_sketch_agg(col("user_id"), 12).as("sk")),
      Seq("day_ms"), assumeKeyUnique = true)
    val stored = UpsertStore.read(s, path).get
    val maxd = stored.agg(max("day_ms")).head().getLong(0)
    // windows ride an exploded literal array — no join of any kind
    // (a crossJoin against a 2-row frame plans a BNLJ; this stays in
    // whole-stage codegen)
    def inWindow(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("window_days", explode(array(lit(7L), lit(28L))))
      .filter(col("day_ms") > lit(maxd) - col("window_days") * lit(86400000L))
    val est = inWindow(stored).groupBy("window_days")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = inWindow(du).groupBy("window_days")
      .agg(countDistinct("user_id").as("n_exact"))
    exact.join(est, "window_days")
      .select(col("window_days"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <=
          greatest(lit(5.0), lit(5 * 0.0163) * col("n_exact"))).as("within_bound"))
      .orderBy("window_days")
  }

  /** q153's window serve in PURE SQL over the CATALOG-registered
    * sketch store — the q100/q106/q127 idiom for the HLL family, and
    * the fifth derived store a warehouse user can query by name: the
    * per-day sketch table registers as `graft.<name>`, and the whole
    * serve (window expansion by exploded literal array, trailing
    * filter against a scalar-subquery max-day anchor, `hll_union_agg`
    * → `hll_sketch_estimate` — all NATIVE Spark SQL, no custom
    * function registration) plus the exact side and the bound flag is
    * one SQL text. Shares q153's oracle: catalog read + SQL surface +
    * stored sketches ≡ the Column-API serve, hash-proven. */
  val q158CatalogHllSql: QueryDef = sql(
    "q158_catalog_hll_sql", q153Sql) { (s, d) =>
    import graft.streaming.UpsertStore
    if (!s.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.UpsertCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.path", graft.Scratch.dir("graft-catalog-wh"))
    }
    val t = s"hll_days_${PairGraph.dirKey64(d)}"
    val path = s"${PairGraph.catalogWarehouse(s, "graft")}/$t"
    val du = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("dd"), col("user_id")).distinct()
      .withColumn("day_ms", expr("unix_millis(dd)"))
    UpsertStore.replace(s, path,
      du.groupBy("day_ms").agg(hll_sketch_agg(col("user_id"), 12).as("sk")),
      Seq("day_ms"), assumeKeyUnique = true)
    PairGraph.ensureTable(s, "graft", t, path, Seq("day_ms"))
    Tables.registerAll(s, d)
    s.sql(
      s"""WITH expanded AS (
         |  SELECT explode(array(BIGINT(7), BIGINT(28))) AS window_days, day_ms, sk
         |  FROM graft.`$t`),
         |est AS (
         |  SELECT window_days, hll_sketch_estimate(hll_union_agg(sk)) AS est
         |  FROM expanded
         |  WHERE day_ms > (SELECT MAX(day_ms) FROM graft.`$t`)
         |                 - window_days * 86400000
         |  GROUP BY 1),
         |du AS (
         |  SELECT DISTINCT unix_millis(date_trunc('day', ts)) AS day_ms, user_id
         |  FROM events),
         |exact AS (
         |  SELECT window_days, COUNT(DISTINCT user_id) AS n_exact
         |  FROM (SELECT explode(array(BIGINT(7), BIGINT(28))) AS window_days,
         |               day_ms, user_id FROM du)
         |  WHERE day_ms > (SELECT MAX(day_ms) FROM du) - window_days * 86400000
         |  GROUP BY 1)
         |SELECT x.window_days, x.n_exact,
         |       abs(e.est - x.n_exact)
         |         <= greatest(CAST(5.0 AS DOUBLE), 5 * 0.0163 * x.n_exact) AS within_bound
         |FROM exact x JOIN est e ON x.window_days = e.window_days
         |ORDER BY window_days""".stripMargin)
  }

  /** Exponentially-weighted moving average of the daily totals
    * (α = 0.3, the pandas adjust=True estimator): ŝ_i =
    * Σ_j r^(i−j)·x_j / Σ_j r^(i−j) with r = 1−α. The r^i factor
    * cancels in the ratio, so both running sums accumulate
    * x_j·r^(−j) and r^(−j) over a plain ROWS UNBOUNDED PRECEDING
    * frame — ONE (type-keyed) window pass, no recursion, no
    * self-join; both engines sum in the same ascending-day order so
    * the 4 dp round is stable. r^(−j) grows ~1.43^j: fine for the
    * day-grain series here (2^63 headroom past j≈120); a year-plus
    * series re-anchors j per block (e.g. j mod 90 with a carried
    * block factor) — noted, not needed at this grain. */
  val q155DailyEwma: QueryDef = sql(
    "q155_daily_ewma",
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS d, SUM(value) AS x
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) - 1 AS i
      |  FROM daily)
      |SELECT event_type, epoch_ms(d) AS day_ms, ROUND(x, 2) AS total,
      |       ROUND(SUM(x * pow(1 / 0.7, i)) OVER w / SUM(pow(1 / 0.7, i)) OVER w, 4) AS ewma
      |FROM r
      |WINDOW w AS (PARTITION BY event_type ORDER BY i ROWS UNBOUNDED PRECEDING)
      |ORDER BY event_type, day_ms""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(sum("value").as("x"))
    val wi = Window.partitionBy("event_type").orderBy("d")
    val w = Window.partitionBy("event_type").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("i", row_number().over(wi) - 1)
      .withColumn("wt", pow(lit(1 / 0.7), col("i")))
      .select(
        col("event_type"), expr("unix_millis(d)").as("day_ms"),
        round(col("x"), 2).as("total"),
        round(sum(col("x") * col("wt")).over(w) / sum(col("wt")).over(w), 4).as("ewma"))
      .orderBy("event_type", "day_ms")
  }

  val all: Seq[QueryDef] = Seq(
    q134GapfillResample, q135RollingZscore, q136ActiveUsers,
    q137Attribution, q138RegressionByGroup, q139TfidfKeywords,
    q140FuzzySortedNeighborhood, q141WeightedSample,
    q142MarketBasket, q143SessionConversion, q144IntereventGaps,
    q145TokenEntropy, q146BigramNll, q147RollupIvm, q194JoinViewIvm,
    q196CatalogJoinViewSql, q198StarViewIvm, q201ViewTakedown,
    q148HllWau, q149TfidfFromIndex, q150FuzzyFullVerify,
    q152StratifiedSample, q153HllWindowServe, q155DailyEwma,
    q158CatalogHllSql)
}
