package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** Semantics the DuckDB oracle can't see for the q134-q141 analytics
  * pack: fill provenance, anomaly mechanics, attribution tie-breaks,
  * sampling bias, and the blocking invariant of the fuzzy join. */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sf0001

  test("gapfill: spine is dense per type, filled rows repeat the last observed value") {
    val rows = Analytics.q134GapfillResample.fn(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val hours = byType.values.map(_.map(_.getAs[Long]("hour_ms")).sorted.toSeq)
    // every type shares the identical dense hourly spine
    assert(hours.toSet.size == 1)
    val spine = hours.head
    assert(spine.zip(spine.tail).forall { case (a, b) => b - a == 3600000L })
    // forward fill: a filled row's value equals the nearest earlier unfilled row's
    byType.values.foreach { trs =>
      val ordered = trs.sortBy(_.getAs[Long]("hour_ms"))
      var lastReal: Option[Double] = None
      ordered.foreach { r =>
        val v = Option(r.getAs[java.lang.Double]("sum_value")).map(_.toDouble)
        if (r.getAs[Boolean]("filled")) assert(v == lastReal, s"bad fill at $r")
        else { assert(v.isDefined); lastReal = v }
      }
    }
  }

  test("rolling z-score: a manufactured spike is anomalous, flat series never is") {
    def mk(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, new java.sql.Timestamp(1704067200000L + i * 86400000L), 1L, "t", v, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def run(df: org.apache.spark.sql.DataFrame) = {
      df.createOrReplaceTempView("__zin")
      // replay the q135 body over a temp table via the same expression
      val daily = df.groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(sum("value").as("total"))
        .withColumn("avg7", expr(
          """avg(total) OVER (PARTITION BY event_type ORDER BY d
            | RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)""".stripMargin))
        .withColumn("sd7", expr(
          """stddev_samp(total) OVER (PARTITION BY event_type ORDER BY d
            | RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)""".stripMargin))
      daily.select(col("d"),
          coalesce(abs((col("total") - col("avg7")) / nullif(col("sd7"), lit(0))) > 2,
            lit(false)).as("anomaly"))
        .orderBy("d").collect().map(_.getAs[Boolean]("anomaly"))
    }
    val flat = run(mk(Seq.fill(10)(5.0)))
    assert(flat.forall(_ == false))
    val spike = run(mk(Seq(5.0, 5.1, 4.9, 5.0, 5.05, 4.95, 5.0, 100.0)))
    assert(spike.last, "spike day must flag")
    assert(spike.init.forall(_ == false))
  }

  test("active users: wau7 equals the union of the trailing 7 days' user sets (naive recheck)") {
    val pairs = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getAs[java.sql.Timestamp]("d").getTime, r.getAs[Long]("user_id")))
    val got = Analytics.q136ActiveUsers.fn(spark, sf).collect()
    got.foreach { r =>
      val day = r.getAs[Long]("day_ms")
      val want = pairs.filter(p => p._1 <= day && p._1 >= day - 6L * 86400000L)
        .map(_._2).toSet.size
      assert(r.getAs[Long]("wau7") == want, s"day $day")
      val dau = pairs.filter(_._1 == day).map(_._2).toSet.size
      assert(r.getAs[Long]("dau") == dau)
    }
  }

  test("attribution: click beats view on ties, stale touches fall to none, self-attribution impossible") {
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val day = 86400L
    val ev = Seq(
      // user 1: view then click at the SAME ts before purchase -> click wins
      (1L, ts(10), 1L, "view", 0.0, ""), (2L, ts(10), 1L, "click", 0.0, ""),
      (3L, ts(20), 1L, "purchase", 7.0, ""),
      // user 2: click 2 days before purchase -> stale -> none
      (4L, ts(0), 2L, "click", 0.0, ""), (5L, ts(2 * day + 100), 2L, "purchase", 3.0, ""),
      // user 3: purchase with no touches at all -> none
      (6L, ts(5), 3L, "purchase", 1.0, ""),
      // user 4: view after the purchase must not attribute backwards
      (7L, ts(50), 4L, "purchase", 2.0, ""), (8L, ts(60), 4L, "view", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics.q137Attribution.fn(spark, dir).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Double]("attributed_value"))).toMap
    assert(out("click") == ((1L, 7.0)))
    assert(out("none") == ((3L, 6.0)))
    assert(!out.contains("view"))
  }

  test("regression: a perfect line recovers slope/intercept/r2 exactly") {
    val df = (1 to 100).map(i => (s"X", i.toDouble, 2.0 * i + 1.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val got = df.groupBy("l_returnflag").agg(
      round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
      round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("intercept"),
      round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2")).head()
    assert(got.getAs[Double]("slope") == 2.0)
    assert(got.getAs[Double]("intercept") == 1.0)
    assert(got.getAs[Double]("r2") == 1.0)
  }

  test("tf-idf: a corpus-universal token never outranks a same-tf rare token") {
    val rows = Analytics.q139TfidfKeywords.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // ranks are exactly 1..3 per doc
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      assert(g.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to g.length).toSeq)
    }
    // scores non-increasing within a doc
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      val s = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("score"))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sorted-neighborhood fuzzy join: pairs share a block, sit within W in sort order, dist is exact") {
    val docs = Tables.documents(spark, sf).select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / 50.0).cast("long").as("bucket"),
      substring(col("text"), 1, 40).as("prefix")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[Long]("bucket"), r.getAs[String]("prefix"))).toMap
    // independent rank replay: sort each block by (prefix, doc_id)
    val rank = docs.toSeq.groupBy { case (_, (l, bkt, _)) => (l, bkt) }
      .flatMap { case (_, members) =>
        members.sortBy { case (id, (_, _, p)) => (p, id) }
          .zipWithIndex.map { case ((id, _), i) => id -> i }
      }
    val got = Analytics.q140FuzzySortedNeighborhood.fn(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a < b)
      assert(docs(a)._1 == docs(b)._1 && docs(a)._2 == docs(b)._2, "must share a block")
      assert(math.abs(rank(a) - rank(b)) <= 5, s"pair ($a,$b) outside the W=5 neighborhood")
      if (docs(a)._3 == docs(b)._3) assert(r.getAs[Long]("dist") == 0L)
    }
  }

  test("market basket: support and lift recompute from the raw pairs (naive recheck)") {
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getAs[Long]("o"), r.getAs[Long]("p")))
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size
    val partCount = op.groupBy(_._2).view.mapValues(_.length).toMap
    val got = Analytics.q142MarketBasket.fn(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      val support = byOrder.valuesIterator.count(s => s(a) && s(b))
      assert(r.getAs[Long]("support") == support, s"pair ($a,$b)")
      val lift = support.toDouble * nOrders / (partCount(a).toDouble * partCount(b))
      assert(math.abs(r.getAs[Double]("lift") - lift) < 1e-3)
    }
  }

  test("session conversion: buckets partition all sessions; a purchase converts its whole session") {
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    // user 1: one 3-event session WITH purchase, then (after >30min) a
    // 1-event session without; user 2: a single 6-event session, no purchase
    val ev = (Seq((1L, 0L, "view"), (2L, 60L, "click"), (3L, 120L, "purchase"),
      (4L, 4000L, "view")).map { case (id, t, ty) => (id, ts(t), 1L, ty, 1.0, "") } ++
      (10 to 15).map(i => (i.toLong, ts(i * 10L), 2L, "view", 1.0, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("conv").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics.q143SessionConversion.fn(spark, dir).collect()
      .map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_converted"))).toMap
    assert(out("medium") == ((1L, 1L)))  // the 3-event purchase session
    assert(out("short") == ((1L, 0L)))   // the 1-event tail session
    assert(out("long") == ((1L, 0L)))    // user 2's 6-event session
  }

  test("inter-event gaps: median recomputes from the raw per-user timeline (naive recheck)") {
    // unix_micros keeps the parquet microsecond component — Timestamp
    // .getTime * 1000 would truncate to ms and make the ground truth
    // coarser than the µs-exact query it checks (ADVICE r11)
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("us"), r.getAs[Long]("event_id")))
    def gaps(typ: String): Seq[Double] =
      evs.filter(_._2 == typ).groupBy(_._1).values.flatMap { tl =>
        val sorted = tl.sortBy(e => (e._3, e._4)).map(_._3 / 1000.0 / 1000.0)
        sorted.zip(sorted.tail).map { case (a, b) => b - a }
      }.toSeq
    def quantile(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted; val pos = q * (s.length - 1)
      val lo = s(pos.toInt); val hi = s(math.min(pos.toInt + 1, s.length - 1))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val got = Analytics.q144IntereventGaps.fn(spark, sf).collect()
    got.foreach { r =>
      val g = gaps(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_gaps") == g.length)
      // µs-exact recheck → only the query's own 2 dp rounding remains
      assert(math.abs(r.getAs[Double]("p50_gap_s") - quantile(g, 0.5)) < 0.0051)
      assert(math.abs(r.getAs[Double]("p95_gap_s") - quantile(g, 0.95)) < 0.0051)
    }
  }

  test("token entropy: uniform doc hits ln(k), constant doc hits 0") {
    val docs = Seq(
      (1L, "a b c d", "en", "t", 7L),      // 4 distinct, uniform -> ln(4)
      (2L, "x x x x x", "en", "t", 9L))    // constant -> 0
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("ent").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Analytics.q145TokenEntropy.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(math.abs(out(1L) - math.log(4.0)) < 1e-3)
    assert(out(2L) == 0.0)
  }

  test("bigram NLL: hand-computed two-doc corpus") {
    val docs = Seq(
      (1L, "a b a b", "en", "t", 7L),
      (2L, "a b c", "en", "t", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("bg").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // corpus: unigrams a:3 b:3 c:1 (V=3); bigrams ab:3 (2 from doc1 +
    // 1 from doc2), ba:1, bc:1
    // doc1 bigrams: ab, ba, ab -> nll = -(2*ln((3+1)/(3+3)) + ln((1+1)/(3+3)))/3
    val expected1 = -(2 * math.log(4.0 / 6) + math.log(2.0 / 6)) / 3
    // doc2 bigrams: ab, bc -> -(ln(4/6) + ln(2/6))/2
    val expected2 = -(math.log(4.0 / 6) + math.log(2.0 / 6)) / 2
    val out = Analytics.q146BigramNll.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("bigram_nll"))).toMap
    assert(out(1L)._1 == 3 && math.abs(out(1L)._2 - expected1) < 1e-3)
    assert(out(2L)._1 == 2 && math.abs(out(2L)._2 - expected2) < 1e-3)
  }

  test("rollup IVM: serve equals a direct full rollup, and the extend commit touches only delta keys") {
    import graft.streaming.UpsertStore
    val got = Analytics.q147RollupIvm.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_ms")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    val want = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_millis(date_trunc('day', ts))").as("day_ms"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_ms")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sv"))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, sv)) =>
      assert(want(k)._1 == n, s"count at $k")
      assert(math.abs(want(k)._2 - sv) < 0.02, s"sum at $k")
    }
  }

  test("weighted sample: deterministic across runs and biased toward heavy docs") {
    val r1 = Analytics.q141WeightedSample.fn(spark, sf).collect().map(_.getAs[Long]("doc_id"))
    val r2 = Analytics.q141WeightedSample.fn(spark, sf).collect().map(_.getAs[Long]("doc_id"))
    assert(r1.toSeq == r2.toSeq)
    // ES property: mean weight of the sample exceeds the corpus mean
    val all = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    val sampleMean = r1.map(all).sum.toDouble / r1.length
    val corpusMean = all.values.sum.toDouble / all.size
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
  }
}
