package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** As-of (point-in-time) join — an operator Spark lacks natively
  * (SURVEY §2.7 "joins … as-of"). Implemented by composing built-ins
  * (preference order (a) from the build brief): union both sides,
  * single sort within each key partition, and a running `last(...,
  * ignoreNulls)` window to carry the most recent right-side row forward.
  *
  * Scale: ONE shuffle on the join key + a per-partition sort — the same
  * cost profile as a sort-merge join. No per-row subqueries, no
  * nested-loop blowup, no driver-side state; each key's timeline is
  * processed streamingly inside its partition, so it holds at 100 TB
  * provided keys fit a partition (skewed keys: pre-salt by time bucket).
  */
object AsOf {

  import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

  /** Exact integer microseconds on the time axis, for ANY time-like
    * column type. TIMESTAMP_NTZ converts by FIELD arithmetic — days
    * since epoch (wall-clock date) plus time-of-day — NOT via a
    * session-TZ cast: in a DST zone the wall-clock→instant mapping is
    * non-monotonic (fall-back folds an hour, spring-forward skips
    * one), so a cast-based axis could disorder the join or skew
    * tolerance deltas by an hour (ADVICE r10). The field form is
    * TZ-independent — equivalent to interpreting the wall clock as
    * UTC — and every piece (date cast, hour/minute, fractional
    * SECOND extract) reads the NTZ fields directly. Plain numeric
    * columns are treated as epoch SECONDS (the tolerance-gate
    * contract). Centralizing the branch here is what keeps an NTZ
    * input from resurrecting the r9 `cast(ts as bigint)` analysis
    * error: every as-of variant and the auto-decision stats pass go
    * through this one function. */
  private def microsCol(c: Column, dt: DataType): Column = dt match {
    case TimestampType    => unix_micros(c)
    case TimestampNTZType =>
      unix_date(c.cast(org.apache.spark.sql.types.DateType)).cast("long") * lit(86400000000L) +
        hour(c).cast("long") * lit(3600000000L) +
        minute(c).cast("long") * lit(60000000L) +
        (date_part(lit("SECOND"), c) * lit(1000000L)).cast("long")
    case _                => c.cast("long") * lit(1000000L)
  }

  /** For each left row, attach the latest right row with the same key
    * and rightTime <= leftTime. `payload` columns are carried from the
    * right side (each must exist there); left columns pass through.
    * `toleranceSeconds` bounds how stale the match may be — a right
    * row further back than the tolerance yields null payloads (the
    * pandas `merge_asof(tolerance=…)` contract). */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[(String, String)],
      toleranceSeconds: Option[Long] = None): DataFrame =
    asOfCore(left, right, key, leftTime, rightTime, payload, forward = false, toleranceSeconds)

  /** Forward as-of: for each left row, the EARLIEST right row with the
    * same key and rightTime >= leftTime ("next event after"), same
    * shuffle/sort cost as the backward form (the scan just runs down
    * the timeline in reverse). Ties at equal (key, time): the largest
    * first-payload value wins, deterministically. */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[(String, String)],
      toleranceSeconds: Option[Long] = None): DataFrame =
    asOfCore(left, right, key, leftTime, rightTime, payload, forward = true, toleranceSeconds)

  private def asOfCore(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[(String, String)],
      forward: Boolean,
      toleranceSeconds: Option[Long]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
    val leftCols = left.columns
    // ONE struct carries every payload column plus the matched right
    // row's own time (`__rt`, needed for the tolerance gate) through
    // the window TOGETHER. Carrying them as separate last(...,
    // ignoreNulls) aggregates desyncs them when a right row holds a
    // NULL payload value: the stale payload of an OLDER row would pair
    // with the fresher row's time, so the tolerance gate could validate
    // a stale payload against a fresh match — or null out a valid one.
    // A right row with null payload fields still yields a NON-null
    // struct, so last(struct, ignoreNulls) tracks rows, not values.
    val carryType = StructType(payload.map { case (src, dst) =>
      StructField(dst, right.schema(src).dataType)
    } :+ StructField("__rt", right.schema(rightTime).dataType))
    // Right rows sort BEFORE left rows at equal timestamps (side 0 < 1)
    // => "at or before" semantics, matching DuckDB's ASOF (>=) join;
    // same rule under the forward scan ("at or after").
    // `__t` is the microsecond axis, normalized PER SIDE via
    // [[microsCol]] before the union — so mixed time encodings
    // (TIMESTAMP one side, TIMESTAMP_NTZ the other) never rely on
    // implicit union coercion: both sides meet as plain longs on the
    // same UTC-interpreted axis (ADVICE r10).
    val taggedLeft = left
      .withColumn("__t", microsCol(col(leftTime), left.schema(leftTime).dataType))
      .withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(carryType))
    val taggedRight = {
      val base = right
        .withColumn("__t", microsCol(col(rightTime), right.schema(rightTime).dataType))
        .withColumn("__side", lit(0))
        .withColumn("__carry", struct(
          (payload.map { case (src, dst) => col(src).as(dst) } :+
            col(rightTime).as("__rt")): _*))
      // null out the left-only columns, keep schema aligned for union
      leftCols.foldLeft(base) { case (df, c) =>
        if (right.columns.contains(c) && c != key) df.withColumn(c, col(c))
        else if (c == key) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }
    val projected = (leftCols.map(col) ++ Seq(col("__t"), col("__side"), col("__carry"))).toSeq
    val unioned = taggedLeft.select(projected: _*)
      .unionByName(taggedRight.select(projected: _*))
    // Tie-break on the carried struct itself (lexicographic on fields,
    // first payload dominating): multiple right rows sharing (key, t)
    // would otherwise carry a partition-order-dependent payload. Left
    // rows have a null struct and sort first.
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrder, col("__side").asc, col("__carry").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceSeconds match {
      case None =>
        payload.foldLeft(matched) { case (df, (_, dst)) =>
          df.withColumn(dst, col("__carry").getField(dst))
        }
      case Some(tol) =>
        // exact INTEGER time arithmetic: a double round-trip loses ~1 ulp
        // at microsecond magnitudes, so boundary events could disagree
        // with the oracle's exact INTERVAL check
        val withRt = matched.withColumn("__rt", col("__carry").getField("__rt"))
        val lm = microsCol(col(leftTime), left.schema(leftTime).dataType)
        val rm = microsCol(col("__rt"), right.schema(rightTime).dataType)
        val tolUnits = lit(tol * 1000000L)
        val delta = if (forward) rm - lm else lm - rm
        val ok = col("__rt").isNotNull && delta <= tolUnits
        payload.foldLeft(withRt) { case (df, (_, dst)) =>
          df.withColumn(dst, when(ok, col("__carry").getField(dst)))
        }.drop("__rt")
    }
    bounded.drop("__t", "__side", "__carry")
  }

  /** Skew-safe as-of join: a HOT key (bot user, monitoring agent) whose
    * timeline exceeds one partition's sort capacity breaks the plain
    * union+window plan (each key's whole timeline sorts in one task).
    * This variant adds the key's TIME BUCKET to the partitioning, so a
    * hot timeline splits across ⌈span/bucket⌉ tasks:
    *
    *   1. the running-last carry runs per (key, bucket) — local sort,
    *      parallelism = buckets touched, not keys;
    *   2. each bucket's FINAL right-row carry is summarized into ONE
    *      row per (key, bucket) (metadata-scale), and a running last
    *      over the bucket sequence yields each bucket's carry-IN;
    *   3. a left row's match = its local carry, else the carry-in.
    *
    * Forward mode reuses the same scan by negating the time axis
    * (forward-asof on t ≡ backward-asof on −t, same tie rule: largest
    * first-payload wins at equal time). Tolerance is the same exact
    * integer-micros post-gate as [[asOfJoin]]. Output is row-for-row
    * identical to the unbucketed forms — spec-pinned and shared with
    * the q30/q84/q85 oracles via q92. */
  def asOfJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[(String, String)],
      bucketSpanSeconds: Long,
      toleranceSeconds: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    require(bucketSpanSeconds > 0, "bucketSpanSeconds must be positive")
    val leftCols = left.columns
    // signed time axis: negating micros turns the forward scan into the
    // backward one (and flips bucket order with it); numeric time
    // columns are treated as epoch seconds, like the tolerance gate
    def axis(name: String, dt: org.apache.spark.sql.types.DataType): Column = {
      val m = microsCol(col(name), dt)
      if (forward) -m else m
    }
    val spanMicros = bucketSpanSeconds * 1000000L
    val carryType = StructType(payload.map { case (src, dst) =>
      StructField(dst, right.schema(src).dataType)
    } :+ StructField("__rt", right.schema(rightTime).dataType))
    val taggedLeft = left
      .withColumn("__m", axis(leftTime, left.schema(leftTime).dataType))
      .withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(carryType))
    val taggedRight = {
      val base = right
        .withColumn("__m", axis(rightTime, right.schema(rightTime).dataType))
        .withColumn("__side", lit(0))
        .withColumn("__carry", struct(
          (payload.map { case (src, dst) => col(src).as(dst) } :+
            col(rightTime).as("__rt")): _*))
      leftCols.foldLeft(base) { case (df, c) =>
        if (right.columns.contains(c) && c != key) df.withColumn(c, col(c))
        else if (c == key) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }
    val projected = (leftCols.map(col) ++ Seq(col("__m"), col("__side"), col("__carry"))).toSeq
    val unioned = taggedLeft.select(projected: _*)
      .unionByName(taggedRight.select(projected: _*))
      // floor division keeps bucket order aligned with __m for negative
      // values too (floor(-1/n) = -1, not 0)
      .withColumn("__b", floor(col("__m") / spanMicros.toDouble).cast("long"))
    // 1. bucket-local running carry (hot key spreads over its buckets)
    val localW = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__m").asc, col("__side").asc, col("__carry").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = unioned.withColumn("__local",
      last(col("__carry"), ignoreNulls = true).over(localW))
    // 2. per-(key, bucket) final right carry; running last over the
    //    bucket SEQUENCE (one row per touched bucket — metadata-scale)
    //    gives each bucket its carry-in from all earlier buckets
    val summaries = unioned.filter(col("__side") === 0)
      .groupBy(col(key), col("__b"))
      .agg(max(struct(col("__m").as("m"), col("__carry").as("c"))).as("__s"))
      .select(col(key), col("__b"), col("__s").getField("c").as("__bc"))
    val carryInW = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = unioned.select(col(key), col("__b")).distinct()
      .join(summaries, Seq(key, "__b"), "left")
      .withColumn("__cin", last(col("__bc"), ignoreNulls = true).over(carryInW))
      .select(col(key), col("__b"), col("__cin"))
    // 3. resolve: local carry wins (it is never older than the carry-in)
    val matched = local.filter(col("__side") === 1)
      .join(carryIn, Seq(key, "__b"))
      .withColumn("__carry", coalesce(col("__local"), col("__cin")))
    val bounded = toleranceSeconds match {
      case None =>
        payload.foldLeft(matched) { case (df, (_, dst)) =>
          df.withColumn(dst, col("__carry").getField(dst))
        }
      case Some(tol) =>
        val withRt = matched.withColumn("__rt", col("__carry").getField("__rt"))
        val lm = microsCol(col(leftTime), left.schema(leftTime).dataType)
        val rm = microsCol(col("__rt"), right.schema(rightTime).dataType)
        val tolUnits = lit(tol * 1000000L)
        val delta = if (forward) rm - lm else lm - rm
        val ok = col("__rt").isNotNull && delta <= tolUnits
        payload.foldLeft(withRt) { case (df, (_, dst)) =>
          df.withColumn(dst, when(ok, col("__carry").getField(dst)))
        }.drop("__rt")
    }
    bounded.drop("__m", "__side", "__b", "__local", "__cin", "__carry")
  }

  /** The skew decision behind [[asOfJoinAuto]]: per-key row count and
    * time span across BOTH sides (the sorted timeline unions them),
    * from one map-side-combined aggregation + a top-1 read. Returns
    * None when every key's timeline fits the partition budget (plain
    * plan), else Some(bucketSpanSeconds) sized so the hottest key
    * splits into ~count/budget buckets across its own span. A hot key
    * whose rows share ONE timestamp cannot be split by any time
    * bucketing (span floor 1 s) — that degenerate case needs payload
    * pre-aggregation, not a different join plan. */
  /** Upper bound on a DataFrame's row count from optimizer stats alone
    * (no job): the exact rowCount when the plan carries one, else
    * sizeInBytes at a floor of 8 bytes/row. The floor is deliberately
    * below any real (key, timestamp) row width — overestimating rows is
    * the safe direction here, since the bound only SKIPS the stats job
    * when even the overestimate fits the budget, and a miss costs one
    * aggregation, not correctness. */
  private def rowBound(df: DataFrame): Long = {
    val st = df.queryExecution.optimizedPlan.stats
    val cap = BigInt(Long.MaxValue / 2) // sum of two bounds can't overflow
    st.rowCount.map(_.min(cap).toLong).getOrElse((st.sizeInBytes / 8).min(cap).toLong)
  }

  private[graft] def autoDecision(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      partitionBudget: Long): Option[Long] = {
    // Pre-gate (VERDICT r7 #2): the hottest key can never exceed the
    // TOTAL row count, so when optimizer stats already bound
    // |left| + |right| under the budget the key-frequency job is pure
    // overhead — skip straight to the plain plan. At real scale the
    // bound won't fire and the (map-side-combined, tiny) stats pass
    // runs as designed.
    val bound = rowBound(left) + rowBound(right)
    if (bound <= partitionBudget) return None
    def micros(df: DataFrame, t: String): Column =
      microsCol(col(t), df.schema(t).dataType)
    val keyed = left.select(col(key).as("__k"), micros(left, leftTime).as("__m"))
      .unionByName(right.select(col(key).as("__k"), micros(right, rightTime).as("__m")))
    val hot = keyed.groupBy("__k")
      .agg(count(lit(1)).as("__n"), min("__m").as("__lo"), max("__m").as("__hi"))
      .orderBy(col("__n").desc)
      .limit(1)
      .collect().headOption
    hot match {
      // empty input, or a hot key whose timestamps are all null (no
      // timeline to bucket): the plain plan handles both correctly
      case None => None
      case Some(r) if r.isNullAt(2) || r.isNullAt(3) => None
      case Some(r) =>
        val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
        if (n <= partitionBudget) None
        else {
          val buckets = math.max(2L, (n + partitionBudget - 1) / partitionBudget)
          val spanSeconds = math.max(1L, (hi - lo) / 1000000L / buckets)
          Some(spanSeconds)
        }
    }
  }

  /** As-of join with AUTOMATIC skew protection (VERDICT r6 #6): the
    * plain union+window plan sorts each key's whole timeline in one
    * task — right for normal keys, a cliff for a bot-grade hot key.
    * This entry measures key-frequency stats first (one aggregation —
    * the same class of stats read AQE does per stage) and picks the
    * plan: plain when the hottest key fits `partitionBudget` rows per
    * task, [[asOfJoinBucketed]] with a computed bucket span when it
    * does not. Results are identical either way (spec-pinned); only
    * the partitioning changes. Callers with external knowledge (or
    * cached stats) can still call the specific variants directly. */
  def asOfJoinAuto(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[(String, String)],
      toleranceSeconds: Option[Long] = None,
      forward: Boolean = false,
      partitionBudget: Long = 4000000L): DataFrame =
    autoDecision(left, right, key, leftTime, rightTime, partitionBudget) match {
      case Some(span) =>
        asOfJoinBucketed(left, right, key, leftTime, rightTime, payload,
          bucketSpanSeconds = span, toleranceSeconds = toleranceSeconds,
          forward = forward)
      case None =>
        asOfCore(left, right, key, leftTime, rightTime, payload, forward,
          toleranceSeconds)
    }

  /** Declared query: each event joined as-of to the user's most recent
    * signup event (at or before its timestamp). Oracle uses DuckDB's
    * native ASOF LEFT JOIN — same semantics, independent engine. */
  val q30AsOfJoin: QueryDef = QueryDef.sql(
    "q30_asof_last_signup",
    """SELECT e.event_id, e.user_id, e.event_type,
      |       s.event_id AS last_signup_event_id
      |FROM events e
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    val left = events.select("event_id", "user_id", "event_type", "ts")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    asOfJoinAuto(left, signups, key = "user_id", leftTime = "ts", rightTime = "ts",
      payload = Seq("signup_id" -> "last_signup_event_id"))
      .select("event_id", "user_id", "event_type", "last_signup_event_id")
      .orderBy("event_id")
  }

  /** Forward as-of: each event joined to the user's NEXT purchase (at
    * or after its timestamp) — the "time to conversion" primitive.
    * Oracle replays the semantics as a correlated first-row subquery
    * (tie at equal ts: larger event_id, matching the engine's
    * deterministic tie rule). */
  val q84AsOfForward: QueryDef = QueryDef.sql(
    "q84_asof_next_purchase",
    """SELECT e.event_id, e.user_id, e.event_type,
      |       (SELECT s.event_id FROM events s
      |        WHERE s.user_id = e.user_id AND s.event_type = 'purchase'
      |          AND s.ts >= e.ts
      |        ORDER BY s.ts ASC, s.event_id DESC LIMIT 1) AS next_purchase_event_id
      |FROM events e
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    val left = events.select("event_id", "user_id", "event_type", "ts")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    asOfJoinAuto(left, purchases, key = "user_id", leftTime = "ts", rightTime = "ts",
      payload = Seq("purchase_id" -> "next_purchase_event_id"), forward = true)
      .select("event_id", "user_id", "event_type", "next_purchase_event_id")
      .orderBy("event_id")
  }

  /** Tolerance-bounded as-of: last signup within 7 DAYS before the
    * event; staler matches become null (the pandas merge_asof
    * `tolerance` contract). Same one-shuffle plan — the bound is a
    * post-window per-row check on the carried match time. */
  val q85AsOfTolerance: QueryDef = QueryDef.sql(
    "q85_asof_tolerance",
    """SELECT e.event_id, e.user_id,
      |       (SELECT s.event_id FROM events s
      |        WHERE s.user_id = e.user_id AND s.event_type = 'signup'
      |          AND s.ts <= e.ts AND s.ts >= e.ts - INTERVAL 7 DAY
      |        ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS recent_signup_event_id
      |FROM events e
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    val left = events.select("event_id", "user_id", "ts")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    asOfJoinAuto(left, signups, key = "user_id", leftTime = "ts", rightTime = "ts",
      payload = Seq("signup_id" -> "recent_signup_event_id"),
      toleranceSeconds = Some(7L * 24 * 3600))
      .select("event_id", "user_id", "recent_signup_event_id")
      .orderBy("event_id")
  }

  /** The skew-safe bucketed as-of, declared: q85's tolerance join run
    * through [[asOfJoinBucketed]] with 6-hour buckets — the tolerance
    * (7 days) spans ~28 buckets, so the boundary carry-in path is
    * genuinely exercised, and the result must be row-for-row identical
    * to q85 (same DuckDB oracle: the correlated first-row subquery). */
  val q92AsOfBucketed: QueryDef = QueryDef.sql(
    "q92_asof_bucketed",
    """SELECT e.event_id, e.user_id,
      |       (SELECT s.event_id FROM events s
      |        WHERE s.user_id = e.user_id AND s.event_type = 'signup'
      |          AND s.ts <= e.ts AND s.ts >= e.ts - INTERVAL 7 DAY
      |        ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS recent_signup_event_id
      |FROM events e
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    val left = events.select("event_id", "user_id", "ts")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    asOfJoinBucketed(left, signups, key = "user_id", leftTime = "ts", rightTime = "ts",
      payload = Seq("signup_id" -> "recent_signup_event_id"),
      bucketSpanSeconds = 6L * 3600,
      toleranceSeconds = Some(7L * 24 * 3600))
      .select("event_id", "user_id", "recent_signup_event_id")
      .orderBy("event_id")
  }

  val all: Seq[QueryDef] = Seq(q30AsOfJoin, q84AsOfForward, q85AsOfTolerance, q92AsOfBucketed)
}
