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
