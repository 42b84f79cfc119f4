package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.functions.VectorFunctions

/** Cross-cutting operator properties on sf0.001 (oracle equivalence is
  * the driver's gate; these pin the semantics the oracle can't see —
  * approximation quality, recall, invariants). */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sf0001

  test("as-of join: every match is the latest signup at-or-before the event (naive recheck)") {
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"event_type").collect()
    val signups = events.filter(_.getAs[String]("event_type") == "signup")
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[Long]("event_id")))
    val expected = events.map { r =>
      val t = r.getAs[java.sql.Timestamp]("ts").getTime
      val cand = signups.filter(s => s._1 == r.getAs[Long]("user_id") && s._2 <= t)
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(s => (s._2, s._3))._3)
      r.getAs[Long]("event_id") -> best
    }.toMap
    val got = AsOf.q30AsOfJoin.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("last_signup_event_id")).map(_.toLong)).toMap
    assert(got.size == expected.size)
    val diffs = expected.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).toSeq}")
  }

  test("as-of carry: a matched right row with NULL payload yields null, never a stale payload") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: right rows at t=10 (payload 100) and t=20 (payload NULL).
    // A left row at t=25 matches the t=20 row — whose payload is null.
    // Carrying payload and match-time as SEPARATE ignoreNulls aggregates
    // resurrects 100 while validating tolerance against t=20 (desync);
    // the struct carry must return null for both tolerance modes.
    val left = Seq((1L, ts(25)), (1L, ts(15))).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts(10), Option(100L)),
      (1L, ts(20), Option.empty[Long])).toDF("user_id", "ts", "p")
    def run(tol: Option[Long]) =
      AsOf.asOfJoin(left, right, "user_id", "ts", "ts", Seq("p" -> "p_out"), tol)
        .collect()
        .map(r => r.getAs[java.sql.Timestamp]("ts").getTime / 1000 ->
          Option(r.getAs[java.lang.Long]("p_out")).map(_.toLong)).toMap
    // no tolerance: t=25 matches the (null-payload) t=20 row; t=15 the t=10 row
    assert(run(None) == Map(25L -> None, 15L -> Some(100L)))
    // tolerance 6 s: t=25 matches t=20 (fresh, within 6 s) -> null payload;
    // the stale t=10 payload must NOT pass the gate on t=20's time
    assert(run(Some(6L)) == Map(25L -> None, 15L -> Some(100L)))
    // tolerance 4 s: t=15's match (t=10) is 5 s stale -> nulled
    assert(run(Some(4L)) == Map(25L -> None, 15L -> None))
  }

  test("bucketed as-of == plain as-of (backward, forward, tolerance; incl. one hot key)") {
    val events = Tables.events(spark, sf)
    val left = events.select("event_id", "user_id", "ts")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "p").collect()
        .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("p"))).toMap
    for (fwd <- Seq(false, true); tol <- Seq(None, Some(3600L))) {
      val plain =
        if (fwd) AsOf.asOfJoinForward(left, signups, "user_id", "ts", "ts",
          Seq("signup_id" -> "p"), tol)
        else AsOf.asOfJoin(left, signups, "user_id", "ts", "ts",
          Seq("signup_id" -> "p"), tol)
      val bucketed = AsOf.asOfJoinBucketed(left, signups, "user_id", "ts", "ts",
        Seq("signup_id" -> "p"), bucketSpanSeconds = 1800L,
        toleranceSeconds = tol, forward = fwd)
      assert(rows(bucketed) == rows(plain), s"diverged at forward=$fwd tol=$tol")
    }
    // one HOT key: the entire timeline under a single user_id — the
    // case the bucketing exists for — must still match the plain plan
    val hotLeft = left.withColumn("user_id", lit(1L))
    val hotRight = signups.withColumn("user_id", lit(1L))
    val plainHot = AsOf.asOfJoin(hotLeft, hotRight, "user_id", "ts", "ts",
      Seq("signup_id" -> "p"))
    val bucketedHot = AsOf.asOfJoinBucketed(hotLeft, hotRight, "user_id", "ts", "ts",
      Seq("signup_id" -> "p"), bucketSpanSeconds = 900L)
    assert(rows(bucketedHot) == rows(plainHot), "hot-key timeline diverged")
  }

  test("as-of auto plan: uniform keys stay plain, a hot key trips the budget and routes bucketed — identical rows") {
    val events = Tables.events(spark, sf)
    val left = events.select("event_id", "user_id", "ts")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "p").collect()
        .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("p"))).toMap
    // real corpus, generous budget: stats say no key is hot → plain plan
    assert(AsOf.autoDecision(left, signups, "user_id", "ts", "ts",
      partitionBudget = 4000000L).isEmpty,
      "uniform corpus must NOT route to the bucketed plan")
    // the SAME corpus squeezed under one key (bot-grade) with a small
    // budget: the decision must flip and compute a positive span that
    // actually splits the timeline into multiple buckets
    val hotLeft = left.withColumn("user_id", lit(1L))
    val hotRight = signups.withColumn("user_id", lit(1L))
    val n = hotLeft.count() + hotRight.count()
    val budget = 500L
    val span = AsOf.autoDecision(hotLeft, hotRight, "user_id", "ts", "ts", budget)
    assert(span.exists(_ > 0), s"hot key ($n rows under one key) must trip budget=$budget")
    // auto == plain, through every mode, on the skewed corpus
    for (fwd <- Seq(false, true); tol <- Seq(None, Some(3600L))) {
      val auto = AsOf.asOfJoinAuto(hotLeft, hotRight, "user_id", "ts", "ts",
        Seq("signup_id" -> "p"), toleranceSeconds = tol, forward = fwd,
        partitionBudget = budget)
      val plain =
        if (fwd) AsOf.asOfJoinForward(hotLeft, hotRight, "user_id", "ts", "ts",
          Seq("signup_id" -> "p"), tol)
        else AsOf.asOfJoin(hotLeft, hotRight, "user_id", "ts", "ts",
          Seq("signup_id" -> "p"), tol)
      assert(rows(auto) == rows(plain), s"auto diverged at forward=$fwd tol=$tol")
    }
  }

  test("as-of auto on EMPTY input returns an empty frame instead of throwing (ADVICE r7)") {
    // round 7's autoDecision .head()'d the hot-key aggregate — empty
    // events wedged every declared query routed through the auto path
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("user_id", "ts", "p")
    val out = AsOf.asOfJoinAuto(empty.select("user_id", "ts"), empty,
      "user_id", "ts", "ts", Seq("p" -> "p_out"),
      partitionBudget = -1L) // negative budget defeats the stats pre-gate
    assert(out.collect().isEmpty)
    // all-null time columns: no timeline to bucket — plain plan, no NPE
    val nullTs = Seq((1L, null.asInstanceOf[java.sql.Timestamp], 7L),
      (1L, null.asInstanceOf[java.sql.Timestamp], 8L)).toDF("user_id", "ts", "p")
    assert(AsOf.autoDecision(nullTs, nullTs, "user_id", "ts", "ts", -1L).isEmpty)
    val left = Seq((1L, ts(10))).toDF("user_id", "ts")
    AsOf.asOfJoinAuto(left, nullTs, "user_id", "ts", "ts", Seq("p" -> "p_out"),
      partitionBudget = -1L).collect()
  }

  test("as-of auto skips the key-stats job when optimizer stats already fit the budget (VERDICT r7)") {
    // a column whose evaluation THROWS proves no job ran: range(10)'s
    // optimizer stats bound 20 rows under the 4M budget, so autoDecision
    // must return None without ever executing the plan
    val boom = udf((l: Long) => {
      sys.error("autoDecision ran a job despite the stats bound"); l
    })
    val left = spark.range(10).select($"id".as("user_id"), boom($"id").as("ts"))
    val right = spark.range(10).select($"id".as("user_id"), boom($"id").as("ts"))
    assert(AsOf.autoDecision(left, right, "user_id", "ts", "ts", 4000000L).isEmpty)
    // and with a budget below the bound, the stats job DOES run (and throws)
    intercept[Exception] {
      AsOf.autoDecision(left, right, "user_id", "ts", "ts", 1L)
    }
  }

  test("as-of with an empty right side: all left rows pass through with null payloads") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val left = Seq((1L, ts(10)), (2L, ts(20))).toDF("user_id", "ts")
    val right = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("user_id", "ts", "p")
    val out = AsOf.asOfJoin(left, right, "user_id", "ts", "ts", Seq("p" -> "p_out"))
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("p_out"))))
  }

  test("as-of tolerance boundary is exact at microsecond timestamps (integer micros, no double ulp)") {
    // left event at micro-precision T, right row EXACTLY tol seconds
    // earlier: inclusive boundary must match for every micro offset —
    // the double round-trip key ((ts double) * 1e6) loses ~1 ulp at
    // these magnitudes and can flip the comparison either way.
    val baseMicros = 1600000000000001L // epoch micros, not 1e6-divisible
    def tsMicros(m: Long) = {
      val t = new java.sql.Timestamp(m / 1000L)
      t.setNanos(((m % 1000000L) * 1000L).toInt)
      t
    }
    val tol = 3600L
    val offsets = (0L until 64L)
    val left = offsets.map(i => (i, tsMicros(baseMicros + i))).toDF("user_id", "ts")
    val right = offsets.map(i => (i, tsMicros(baseMicros + i - tol * 1000000L), i))
      .toDF("user_id", "ts", "p")
    val got = AsOf.asOfJoin(left, right, "user_id", "ts", "ts",
      Seq("p" -> "p_out"), toleranceSeconds = Some(tol))
      .collect().map(r => r.getAs[Long]("user_id") ->
        Option(r.getAs[java.lang.Long]("p_out"))).toMap
    val misses = offsets.filter(i => !got(i).contains(java.lang.Long.valueOf(i)))
    assert(misses.isEmpty, s"boundary matches dropped at offsets: ${misses.take(5)}")
  }

  test("as-of accepts TIMESTAMP_NTZ time columns — plain, bucketed, auto, tolerance (VERDICT r9)") {
    // The r9 testdata regeneration delivered events.ts as TIMESTAMP_NTZ
    // and every `dataType == TimestampType` branch mis-routed to
    // `cast(ts as bigint)` → analysis error. Pin that NTZ inputs (a)
    // analyze, and (b) produce the same rows as the TimestampType form,
    // WITHOUT the Tables.events loader normalization in the path.
    import org.apache.spark.sql.types.TimestampNTZType
    val events = Tables.events(spark, sf)
    val left = events.select("event_id", "user_id", "ts")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_id"))
    def ntz(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", $"ts".cast(TimestampNTZType))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "p").collect()
        .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("p"))).toMap
    for (tol <- Seq(None, Some(3600L))) {
      val tz = AsOf.asOfJoin(left, signups, "user_id", "ts", "ts",
        Seq("signup_id" -> "p"), tol)
      val noTz = AsOf.asOfJoin(ntz(left), ntz(signups), "user_id", "ts", "ts",
        Seq("signup_id" -> "p"), tol)
      assert(rows(noTz) == rows(tz), s"NTZ plain as-of diverged at tol=$tol")
      val noTzBucketed = AsOf.asOfJoinBucketed(ntz(left), ntz(signups),
        "user_id", "ts", "ts", Seq("signup_id" -> "p"),
        bucketSpanSeconds = 1800L, toleranceSeconds = tol)
      assert(rows(noTzBucketed) == rows(tz), s"NTZ bucketed as-of diverged at tol=$tol")
    }
    // auto's stats pass must also take the micros path on NTZ (budget 1
    // forces the key-frequency job + bucketed route)
    val auto = AsOf.asOfJoinAuto(ntz(left), ntz(signups), "user_id", "ts", "ts",
      Seq("signup_id" -> "p"), partitionBudget = 1L)
    assert(rows(auto) == rows(AsOf.asOfJoin(left, signups, "user_id", "ts", "ts",
      Seq("signup_id" -> "p"))), "NTZ auto as-of diverged")
  }

  test("as-of accepts MIXED time encodings (TIMESTAMP one side, NTZ the other) — ADVICE r10") {
    // the time axis normalizes to micros per side BEFORE the union, so
    // mixed inputs never rely on implicit union coercion; under the UTC
    // session both orientations must reproduce the all-TIMESTAMP rows
    import org.apache.spark.sql.types.TimestampNTZType
    val events = Tables.events(spark, sf)
    val left = events.select("event_id", "user_id", "ts")
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_id"))
    def ntz(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", $"ts".cast(TimestampNTZType))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "p").collect()
        .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("p"))).toMap
    for (tol <- Seq(None, Some(3600L))) {
      val want = rows(AsOf.asOfJoin(left, signups, "user_id", "ts", "ts",
        Seq("signup_id" -> "p"), tol))
      assert(rows(AsOf.asOfJoin(ntz(left), signups, "user_id", "ts", "ts",
        Seq("signup_id" -> "p"), tol)) == want, s"NTZ-left/TS-right diverged at tol=$tol")
      assert(rows(AsOf.asOfJoin(left, ntz(signups), "user_id", "ts", "ts",
        Seq("signup_id" -> "p"), tol)) == want, s"TS-left/NTZ-right diverged at tol=$tol")
    }
  }

  test("NTZ time axis is session-TZ-independent across a DST fold — ADVICE r10") {
    // America/New_York, 2026-11-01: wall clocks 01:00-02:00 happen twice
    // (EDT→EST fall-back). A session-TZ cast maps wall 01:45→EDT and
    // 02:15→EST — an instant delta of 90 min for a 30-min wall delta —
    // so a 60-min tolerance would wrongly drop the match. The field-
    // arithmetic axis reads the wall clock itself: delta 30 min, kept.
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val left = Seq((1L, "2026-11-01 02:15:00")).toDF("k", "s")
        .select($"k", expr("to_timestamp_ntz(s)").as("ts"))
      val right = Seq((1L, "2026-11-01 01:45:00", 7L)).toDF("k", "s", "p")
        .select($"k", expr("to_timestamp_ntz(s)").as("ts"), $"p")
      val got = AsOf.asOfJoin(left, right, "k", "ts", "ts",
        Seq("p" -> "p_out"), toleranceSeconds = Some(3600L))
        .select("p_out").collect().map(r => Option(r.getAs[java.lang.Long]("p_out")))
      assert(got.toSeq == Seq(Some(7L)),
        s"wall-clock delta is 30 min; the DST fold must not inflate it past tolerance: $got")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("trailing RANGE window includes events exactly 1 h back at micro timestamps (q86 key)") {
    import org.apache.spark.sql.expressions.Window
    // same window shape + ordering key as q86: unix_micros, RANGE 1 h
    val baseMicros = 1600000000000001L
    def tsMicros(m: Long) = {
      val t = new java.sql.Timestamp(m / 1000L)
      t.setNanos(((m % 1000000L) * 1000L).toInt)
      t
    }
    val rows = (0L until 32L).flatMap { u =>
      Seq((u, tsMicros(baseMicros + u)), (u, tsMicros(baseMicros + u + 3600L * 1000000L)))
    }.toDF("user_id", "ts")
    val w = Window.partitionBy("user_id").orderBy(expr("unix_micros(ts)"))
      .rangeBetween(-3600L * 1000000L, 0)
    val counts = rows.withColumn("n", count(lit(1)).over(w))
      .groupBy("user_id").agg(max("n").as("mx"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("mx")).toMap
    val bad = counts.filter(_._2 != 2L)
    assert(bad.isEmpty, s"exact 1 h boundary event excluded for users: ${bad.take(5)}")
  }

  test("minhash LSH + exact verify equals the exact n-gram pair set at J >= 0.6") {
    val exact = Dedup.q46DedupNgramJaccard.fn(spark, sf)
      .filter($"jaccard" >= 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.q47DedupMinhash.fn(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert((exact -- lsh).isEmpty, s"LSH missed high-jaccard pairs: ${(exact -- lsh).take(5)}")
    assert((lsh -- exact).isEmpty, s"verify let through sub-threshold pairs: ${(lsh -- exact).take(5)}")
  }

  test("simhash banding + exact verify equals the exact pair set at J >= 0.6") {
    val exact = Dedup.q46DedupNgramJaccard.fn(spark, sf)
      .filter($"jaccard" >= 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.q48DedupSimhash.fn(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(sim == exact, s"simhash path diverged: missed=${(exact -- sim).take(5)} extra=${(sim -- exact).take(5)}")
  }

  test("prefix-filter set-sim join (q173) equals brute-force exact pairs, incl. boundary cases") {
    import spark.implicits._
    // adversarial corpus: an identical pair (J=1), a pair engineered to
    // sit EXACTLY at J=0.5 (shingle sets sized 2α and 2α sharing α), a
    // just-below pair, and background docs. Written as token streams
    // whose 3-gram shingle sets realize those overlaps: doc 3/4 share
    // their first 6 tokens (4 shingles) then diverge for 4 more
    // shingles each → J = 4/(8+8-4) = 1/3 < 0.5; doc 5/6 share 8 of
    // their 12 shingles → J = 8/16 = 0.5 exactly on the threshold.
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val shared6 = words(6, "s")   // 4 shared shingles
    val shared10 = words(10, "c") // 8 shared shingles
    val docs = Seq(
      (1L, s"$shared10 x1 x2 x3 x4"),          // 12 shingles, 8 shared w/ doc 2
      (2L, s"$shared10 y1 y2 y3 y4"),          // J(1,2) = 8/16 = 0.5 — must KEEP
      (3L, s"$shared6 p1 p2 p3 p4"),           // 8 shingles, 4 shared w/ doc 4
      (4L, s"$shared6 q1 q2 q3 q4"),           // J(3,4) = 4/12 = 1/3 — must DROP
      (5L, words(20, "a")),                    //
      (6L, words(20, "a")),                    // J(5,6) = 1 — identical pair
      (7L, words(15, "z")))                    // isolated
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ppj").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.q173SetSimPrefixJoin.fn(spark, dir)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.5), (5L, 6L, 1.0)),
      s"prefix join diverged from ground truth: $got")
  }

  test("top-gram coverage (q178): dominated doc flagged, diverse doc not, counts exact") {
    import spark.implicits._
    val docs = Seq(
      // "x y" appears 10 times in 20 tokens → 2-gram coverage = 1.0
      (1L, Seq.fill(10)("x y").mkString(" ")),
      // all-distinct tokens → every n-gram count 1, coverage = n/20
      (2L, (1 to 20).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tg").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.q178TopgramCoverage.fn(spark, dir)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    // doc 1: "x y" ×10 (but overlapping "y x" ×9); top 2-gram count 10,
    // coverage 10·2/20 = 1.0; top 3-gram "x y x"/"y x y" count 9,
    // coverage 9·3/20 = 1.35 (overlapping grams can exceed 1 — the
    // signal is still monotone in dominance); top 4-gram count 9.
    val d1 = got.filter(_._1 == 1L).map(r => (r._2, r._3, r._4, r._5))
    assert(d1 == Seq((2L, 10L, 1.0, true), (3L, 9L, 1.35, true),
      (4L, 9L, 1.8, true)), s"doc1: $d1")
    val d2 = got.filter(_._1 == 2L).map(r => (r._2, r._3, r._4, r._5))
    assert(d2 == Seq((2L, 1L, 0.1, false), (3L, 1L, 0.15, false),
      (4L, 1L, 0.2, false)), s"doc2: $d2")
  }

  test("near-dup pipeline (dedup-first) equals banding raw docs on a duplicated corpus") {
    // replicate docs 3x with shifted ids: exact-dup clusters of size 3
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1
    val dup = docs
      .unionByName(docs.withColumn("doc_id", $"doc_id" + maxId))
      .unionByName(docs.withColumn("doc_id", $"doc_id" + 2 * maxId))
    val out = Dedup.nearDupPipeline(dup).collect()
    // every representative is from the original id range (min doc_id kept)
    assert(out.forall(r => r.getAs[Long]("doc_a") < maxId && r.getAs[Long]("doc_b") < maxId))
    // every group collapsed exactly 3 copies
    assert(out.forall(r => r.getAs[Long]("n_copies_a") == 3L && r.getAs[Long]("n_copies_b") == 3L))
    // and the rep pairs are exactly the single-corpus near-dup pairs
    val single = Dedup.nearDupPipeline(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val got = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got == single)
  }

  test("ANN-LSH multi-probe recall@3 vs brute force, with measured candidate rate") {
    val truth = Similarity.q50AnnBruteForce.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.q51AnnLsh.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.map { case (q, t) => (lsh.getOrElse(q, Set.empty) & t).size }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    // candidate rate: candidates examined / (|Q| * |corpus|) — the
    // work saved vs brute force, reported alongside recall
    val emb = Tables.embeddings(spark, sf)
    val nCorpus = emb.count()
    val candRate = Similarity.lshCandidates(emb, $"vec_id" < 5).count().toDouble /
      (truth.size.toDouble * nCorpus)
    info(f"multi-probe LSH recall@3 = $recall%.2f at candidate rate $candRate%.2f")
    assert(recall >= 0.8, s"multi-probe LSH recall below target: $recall")
    // approximation may MISS true neighbors but must not invent ids
    val ids = emb.select("vec_id").as[Long].collect().toSet
    assert(lsh.values.flatten.forall(ids.contains))
  }

  test("q37: exact columns match q33 and the GK estimates sit inside their rank contract") {
    val exact = MoreRelational.q33Percentiles.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = MoreRelational.q37PercentilesApprox.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)), r.getBoolean(4))).toMap
    assert(exact.keySet == approx.keySet)
    for (k <- exact.keySet) {
      assert(exact(k) == approx(k)._1,
        s"q37's declared exact columns drifted from q33 for $k")
      assert(approx(k)._2,
        s"percentile_approx fell outside its ±n/1000 rank contract for $k")
    }
  }

  test("exact dedup keeps one representative per distinct text") {
    val docs = Tables.documents(spark, sf)
    val distinctTexts = docs.select("text").distinct().count()
    assert(Dedup.q45DedupExact.fn(spark, sf).count() == distinctTexts)
  }

  test("langid emits exactly one prediction per doc, from the profile set") {
    val out = TextAnalysis.q43LangId.fn(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    val langs = out.select("lang_pred").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "fr", "es", "de", "zh")))
  }

  test("multimodal features: deterministic, fixed dim, L1-normalized") {
    val a = Multimodal.q54Multimodal.fn(spark, sf).collect()
    val b = Multimodal.q54Multimodal.fn(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "decode must be deterministic")
    assert(a.forall(_.getAs[Long]("feature_dim") == 16L))
    assert(a.forall(r => math.abs(r.getAs[Double]("feature_l1") - 1.0) < 0.01))
  }

  test("frame dedup: repeated 64-byte blocks across assets are counted; unique frames are not") {
    import Multimodal.Asset
    val block = "x" * 64
    val assets = Seq(
      Asset(1L, (block + block + "tail-one").getBytes("UTF-8"), "text/plain"),
      Asset(2L, (block + "unique-middle-content").getBytes("UTF-8"), "text/plain"),
      Asset(3L, "entirely fresh".getBytes("UTF-8"), "text/plain")).toDS()
    val fr = Multimodal.frameHashes(assets).toDF()
    val counts = fr.groupBy("frame_sha").agg(count(lit(1)).as("n"))
    // doc 1: frames [block, block, tail] — the two block copies AND
    // doc 2's block all share content → 2 dup frames of 3.
    assert(fr.as[(Long, Int, String)].collect().count(_._1 == 1L) == 3)
    val byDoc = fr.join(counts, "frame_sha")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nf"), sum(when(col("n") > 1, 1L).otherwise(0L)).as("nd"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byDoc(1L) == ((3L, 2L)), s"doc1: ${byDoc(1L)}")
    assert(byDoc(2L) == ((2L, 1L)), s"doc2: ${byDoc(2L)}")
    assert(byDoc(3L) == ((1L, 0L)), s"doc3: ${byDoc(3L)}")
  }

  test("count-min sketch: within-bound flag holds and the exact column recounts independently") {
    val out = Pipeline.q63TokenCms.fn(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"CMS estimate for '${r.getString(0)}' violated exact <= est <= exact + epsN")
    }
    // independent recount of the exact column (the oracle-checked part)
    val recount = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(recount(r.getString(0)) == r.getAs[Long]("n_exact"),
        s"exact count drifted for '${r.getString(0)}'")
    }
  }

  test("embedding near-dup (q52): LSH + probe + exact verify equals brute-force pairs at cos >= 0.3") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.select($"vec_id".as("vec_a"), $"embedding".as("ea"))
      .crossJoin(emb.select($"vec_id".as("vec_b"), $"embedding".as("eb")))
      .filter($"vec_a" < $"vec_b")
      .withColumn("cos", VectorFunctions.cosine_similarity($"ea", $"eb"))
      .filter($"cos" >= 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.q52EmbedNearDup.fn(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert((pairs -- lsh).isEmpty, s"probed family missed pairs: ${(pairs -- lsh).take(5)}")
    assert((lsh -- pairs).isEmpty, s"verify passed sub-threshold pairs: ${(lsh -- pairs).take(5)}")
  }

  test("embedding near-dup adaptive plan: dense corpus picks direct verify, clustered corpus uses LSH — identical pairs") {
    // the REAL corpus at τ=0.3: per-plane p ≈ 0.60, so the probed family
    // reaches ~all pairs — the estimate must say so (dense branch)
    val emb = Tables.embeddings(spark, sf)
    val denseRate = Similarity.estimatedCandidateRate(emb, "embedding",
      tables = 16, planesPerTable = 6, probeBits = 2)
    assert(denseRate > 0.9, s"real corpus should estimate a dense pair graph, got $denseRate")

    // a clustered corpus shaped like a REAL near-dup problem — 250
    // pseudo-random directions × 4 tightly-jittered members, so true
    // pairs are ~0.3% of all pairs — with a family that CAN prune
    // (12 planes ⇒ 4096 buckets, 1 probe bit): estimate stays under
    // budget, the sparse branch runs, and its exact-verified pairs must
    // equal brute force — banding changes the plan, never the answer
    val n = 1000
    val clustered = spark.range(n.toLong).selectExpr(
      "id AS vec_id",
      // cluster direction from hash(cluster, dim) ∈ [-1, 1); member
      // jitter from hash(id, dim) ∈ [0, 0.04) keeps same-cluster cosine
      // ≈ 0.998 while cross-cluster directions stay near-orthogonal
      """transform(sequence(0, 63), d ->
        |  CAST((pmod(hash(CAST(id / 4 AS INT) * 7 + 1, d), 2000) - 1000) / 1000.0
        |       + pmod(hash(id, d), 100) / 2500.0 AS FLOAT)) AS embedding""".stripMargin)
    val sparseRate = Similarity.estimatedCandidateRate(clustered, "embedding",
      tables = 8, planesPerTable = 12, probeBits = 1)
    assert(sparseRate < 0.25, s"clustered corpus should stay under budget, got $sparseRate")
    val viaLsh = Similarity.embedNearDupPairs(clustered, 0.9,
        tables = 8, planesPerTable = 12, probeBits = 1)
      .as[(Long, Long)].collect().toSet
    val brute = clustered.select($"vec_id".as("vec_a"), $"embedding".as("ea"))
      .crossJoin(clustered.select($"vec_id".as("vec_b"), $"embedding".as("eb")))
      .filter($"vec_a" < $"vec_b")
      .withColumn("cos", VectorFunctions.cosine_similarity($"ea", $"eb"))
      .filter($"cos" >= 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "clustered corpus must actually contain near-dup pairs")
    assert((brute -- viaLsh).isEmpty, s"LSH branch missed pairs: ${(brute -- viaLsh).take(5)}")
    assert((viaLsh -- brute).isEmpty, s"verify passed sub-threshold pairs: ${(viaLsh -- brute).take(5)}")
  }

  test("token packing: bins are consecutive and non-decreasing within a stratum") {
    val rows = Pipeline.q60TokenPacking.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("doc_id"), r.getAs[Long]("bin_id")))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val bins = rs.sortBy(_._2).map(_._3).toList
      assert(bins.head == 0L, s"$lang: first bin must be 0")
      bins.zip(bins.tail).foreach { case (a, b) =>
        assert(b >= a, s"$lang: bin regressed $a -> $b")
      }
    }
  }

  test("deterministic split: fractions near 80/10/10 and stable across runs") {
    val a = Pipeline.q59DatasetSplit.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    val total = a.values.sum.toDouble
    assert(a("train") / total > 0.7 && a("train") / total < 0.9, s"train fraction: $a")
    val b = Pipeline.q59DatasetSplit.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(a == b, "split must be deterministic")
  }

  test("schema parity: encoder-derived == explicit StructType (SURVEY §1.3)") {
    import org.apache.spark.sql.types._
    val fromEncoder = org.apache.spark.sql.Encoders.product[OperatorsSpec.Traffic].schema
    val explicit = StructType(Seq(
      StructField("measurement_time", LongType, nullable = false),
      StructField("number_of_vehicles", IntegerType, nullable = false)))
    assert(fromEncoder == explicit)
  }

  test("approx_count_distinct within 5% of exact (the 100 TB distinct path)") {
    val li = Tables.lineitem(spark, sf)
    val (approx, exact) = li.agg(
      approx_count_distinct("l_partkey").as("a"),
      countDistinct("l_partkey").as("e")).as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }
  test("IVF ANN: recall@3 vs brute force is measured and bounded") {
    val truth = Similarity.q50AnnBruteForce.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.q55AnnIvf.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.map { case (q, t) => (ivf.getOrElse(q, Set.empty) & t).size }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    info(s"IVF recall@3 = $recall")
    assert(recall >= 0.5, s"IVF recall collapsed: $recall")
    // IVF results are always true similarities (exact re-rank inside cells)
    val bogus = ivf.values.flatten.toSet -- Tables.embeddings(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    assert(bogus.isEmpty)
  }

  test("k-means step (q111): assignment is the argmin over independently-recomputed centroids") {
    val embs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val k = 8
    val dim = embs.values.head.length
    // driver-side recompute with a DIFFERENT accumulation order than
    // the engine's partial aggregation (sorted by vec_id here)
    val centroids = (0 until k).map { c =>
      val members = embs.toSeq.filter(_._1 % k == c).sortBy(_._1).map(_._2)
      val sums = new Array[Double](dim)
      members.foreach(v => (0 until dim).foreach(i => sums(i) += v(i)))
      c -> sums.map(_ / members.size)
    }
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    val expected = embs.map { case (id, v) =>
      id -> centroids.minBy { case (c, ce) =>
        (BigDecimal(l2(v, ce)).setScale(6, BigDecimal.RoundingMode.HALF_UP), c)
      }._1.toLong
    }
    val got = Similarity.q111KmeansStep.fn(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got.size == expected.size)
    val diffs = expected.collect { case (id, c) if got(id) != c => (id, c, got(id)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).toSeq}")
  }

  test("cluster-balanced sample (q112): <=16 per cluster, exactly the smallest ids, subset of the assignment") {
    val assign = Similarity.q111KmeansStep.fn(spark, sf)
      .as[(Long, Long)].collect().groupBy(_._2).view
      .mapValues(_.map(_._1).sorted.take(16).toSeq).toMap
    val got = Similarity.q112ClusterBalancedSample.fn(spark, sf)
      .select($"cluster", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got.keySet == assign.keySet.filter(assign(_).nonEmpty))
    got.foreach { case (c, ids) =>
      assert(ids.size <= 16, s"cluster $c over cap: ${ids.size}")
      assert(ids == assign(c), s"cluster $c picks differ: $ids vs ${assign(c)}")
    }
  }

  test("k-means iterate (q115): matches a driver-side 3-iteration Lloyd recompute; inertia non-increasing") {
    val embs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val k = 8
    val dim = embs.values.head.length
    def centroids(assign: Map[Long, Int]): Map[Int, Array[Double]] =
      assign.groupBy(_._2).view.mapValues { m =>
        val members = m.keys.toSeq.sorted.map(embs)
        val sums = new Array[Double](dim)
        members.foreach(v => (0 until dim).foreach(i => sums(i) += v(i)))
        sums.map(_ / members.size)
      }.toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    def assign(cent: Map[Int, Array[Double]]): Map[Long, Int] =
      embs.map { case (id, v) =>
        id -> cent.toSeq.minBy { case (c, ce) =>
          (BigDecimal(l2(v, ce)).setScale(6, BigDecimal.RoundingMode.HALF_UP), c)
        }._1
      }
    var a: Map[Long, Int] = embs.keys.map(id => id -> (id % k).toInt).toMap
    val inertias = (1 to 3).map { _ =>
      val c = centroids(a)
      a = assign(c)
      a.map { case (id, cl) => math.pow(l2(embs(id), c(cl)), 2) }.sum
    }
    // Lloyd: each (centroid update, reassignment) pair cannot increase
    // the objective (up to the 6-dp argmin rounding)
    inertias.sliding(2).foreach { case Seq(x, y) =>
      assert(y <= x + 1e-6, s"inertia increased: $inertias")
    }
    val got = Similarity.q115KmeansIterate.fn(spark, sf)
      .as[(Long, Long)].collect().toMap
    val diffs = a.collect { case (id, c) if got(id) != c.toLong => (id, c, got(id)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).toSeq}")
  }

  test("unigram NLL (q116): matches a driver-side model recompute; model probabilities sum to 1") {
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = texts.map { case (id, t) => id -> t.toLowerCase.split("\\s+").toSeq }
    val counts = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum.toDouble
    assert(math.abs(counts.values.map(_ / total).sum - 1.0) < 1e-9)
    val expected = toks.map { case (id, ts) =>
      val nll = ts.map(t => -math.log(counts(t) / total)).sum / ts.size
      (id, ts.size.toLong,
        BigDecimal(nll).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val gotRows = TextAnalysis.q116UnigramNll.fn(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(gotRows == expected,
      s"missing ${(expected -- gotRows).take(3)}, extra ${(gotRows -- expected).take(3)}")
  }

  test("BPE pair step (q164): vocab-weighted census equals the per-occurrence recompute") {
    val words = Tables.documents(spark, sf)
      .select($"text").as[String].collect()
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    // brute force over every token OCCURRENCE — the query's distinct-word
    // + weight formulation must be exactly this sum
    val counts = words.filter(_.length >= 2)
      .flatMap(_.sliding(2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = TextAnalysis.q164BpePairStep.fn(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got == expected, s"got ${got.take(5)} expected ${expected.take(5)}")
  }

  /** Reference greedy BPE on the driver: word census → iterated
    * (pair census → argmax → single greedy left-to-right merge pass per
    * word). The engine's double-space `replace` encoding must produce
    * exactly these merges and segmentations. */
  private def refBpe(words: Seq[String], iters: Int)
      : (Seq[(Int, String, Long)], Map[String, Int]) = {
    val census = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[Vector[String], Long] =
      census.map { case (w, c) => w.toVector.map(_.toString) -> c }
    def mergeOne(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.result()
    }
    val merges = (1 to iters).map { step =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach(p =>
          pairs(p) = pairs.getOrElse(p, 0L) + c)
      }
      val ((l, r), n) = pairs.toSeq
        .sortBy { case ((a, b), c) => (-c, s"$a $b") }.head
      vocab = vocab.groupBy { case (syms, _) => mergeOne(syms, l, r) }
        .view.mapValues(_.values.sum).toMap
      (step, s"$l $r", n)
    }
    (merges, vocab.map { case (syms, _) => syms.mkString -> syms.length })
  }

  test("BPE trainer (q167): merge list equals a driver-side true greedy BPE") {
    val words = Tables.documents(spark, sf)
      .select($"text").as[String].collect()
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty).toSeq
    val (expected, _) = refBpe(words, 3)
    val got = TextAnalysis.q167BpeTrainMerges.fn(spark, sf)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("BPE fertility (q168): per-doc piece counts equal the reference segmentation") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val allWords = docs.flatMap(_._2.toLowerCase.split("\\s+")).filter(_.nonEmpty).toSeq
    val (_, pieceCount) = refBpe(allWords, 3)
    val expected = docs.map { case (id, t) =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val np = ws.map(w => pieceCount(w).toLong).sum
      val fert = BigDecimal(np.toDouble / ws.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, ws.length.toLong, np, fert)
    }.toSet
    val got = TextAnalysis.q168BpeFertility.fn(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"missing ${(expected -- got).take(3)}, extra ${(got -- expected).take(3)}")
  }

  test("DSIR select (q165): importance weights match a driver-side two-model recompute") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    val toks = docs.map { case (id, lang, t) =>
      (id, lang, t.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)) }
    val cr = toks.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = toks.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = cr.size.toLong
    val nr = cr.values.sum.toDouble + v
    val nt = ct.values.sum.toDouble + v
    val lw = cr.map { case (w, c) =>
      w -> (math.log((ct.getOrElse(w, 0L) + 1.0) / nt) - math.log((c + 1.0) / nr)) }
    val expected = toks.map { case (id, _, ts) =>
      val s = BigDecimal(ts.map(lw).sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, ts.size.toLong, s, s > 0)
    }.toSet
    val got = Pipeline.q165DsirSelect.fn(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(got == expected,
      s"missing ${(expected -- got).take(3)}, extra ${(got -- expected).take(3)}")
  }

  test("snapshot diff (q113): statuses match a text-equality recompute, unchanged rows absent") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val old = docs.filter(_._1 % 7 != 3)
    val nw = docs.filter(_._1 % 7 != 5)
      .map { case (id, t) => id -> (if (id % 11 == 0) t.reverse else t) }
    val expected = ((old.keySet ++ nw.keySet).flatMap { id =>
      (old.get(id), nw.get(id)) match {
        case (None, Some(_))              => Some(id -> "added")
        case (Some(_), None)              => Some(id -> "removed")
        case (Some(a), Some(b)) if a != b => Some(id -> "changed")
        case _                            => None
      }
    }).toMap
    val got = Pipeline.q113SnapshotDiff.fn(spark, sf)
      .as[(Long, String)].collect().toMap
    assert(got == expected,
      s"diff sets differ: got ${got.size} expected ${expected.size}; " +
        s"sample ${(expected.toSet -- got.toSet).take(3)} / ${(got.toSet -- expected.toSet).take(3)}")
  }

  test("token budget mix (q114): per-lang budget is respected and the kept set is the greedy prefix") {
    val toks = Tables.documents(spark, sf)
      .select($"lang", $"doc_id",
        size(split(lower($"text"), "\\s+")).cast("long").as("n"))
      .as[(String, Long, Long)].collect()
    def budget(lang: String): Long = if (lang == "en") 4000L else 1500L
    val expected = toks.groupBy(_._1).flatMap { case (lang, rows) =>
      var cum = 0L
      rows.sortBy(_._2).toSeq.flatMap { case (_, id, n) =>
        cum += n
        if (cum <= budget(lang)) Some((lang, id, n, cum)) else None
      }
      // NOTE: greedy prefix stops contributing rows once the budget is
      // crossed, but the cumsum keeps advancing — a later small doc can
      // NOT re-enter (contract: contiguous prefix in doc_id order)
    }.toSet
    val got = Pipeline.q114TokenBudgetMix.fn(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected,
      s"sets differ; missing ${(expected -- got).take(3)}, extra ${(got -- expected).take(3)}")
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum <= budget(lang), s"$lang over budget")
    }
  }
}

object OperatorsSpec {
  case class Traffic(measurement_time: Long, number_of_vehicles: Int)
}
