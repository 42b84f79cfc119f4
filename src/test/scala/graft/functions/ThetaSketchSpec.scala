package graft.functions

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.{ThetaMaintainer, UpsertStore}

/** Theta / KMV sketches ([[ThetaBuf]] and the q171/q172 surface).
  *
  * The load-bearing property is CANONICALITY: a sketch's end state is
  * always (V = the k smallest distinct item hashes seen, θ = the
  * (k+1)-th smallest or 1.0) — the invariant V = seen ∩ [0,θ) survives
  * update and merge, so ANY merge tree over ANY partitioning produces
  * the byte-identical sketch. That is what lets the q171/q172 bound
  * flags hash-stably pass the driver's compare, and it is pinned here
  * as byte equality, not approximate agreement. Set-op estimates are
  * checked against exact answers within 5× the KMV standard error
  * (the flag the declared queries ship). */
class ThetaSketchSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import ThetaSketchSpec._

  private def sketchOf(items: Seq[Long], k: Int, parts: Int): Array[Byte] =
    items.toDF("v").repartition(parts)
      .agg(ThetaFunctions.theta_sketch_bytes(col("v"), k).as("sk"))
      .select("sk").as[Array[Byte]].collect()(0)

  private def estOf(sk: Array[Byte]): Double = ThetaBuf.deserialize(sk).estimate

  test("exact mode: under k distinct values the sketch IS the set (θ = 1, estimate exact)") {
    val items = (1L to 100L) ++ (1L to 100L) // duplicates must not count
    for (parts <- Seq(1, 3, 7)) {
      val sk = sketchOf(items, k = 128, parts)
      val b = ThetaBuf.deserialize(sk)
      assert(b.theta == 1.0, s"θ left exact mode: ${b.theta}")
      assert(b.estimate == 100.0, s"exact-mode estimate wrong: ${b.estimate}")
    }
  }

  test("estimation mode: byte-identical across partitionings; error within 5/√(k−1)") {
    val k = 64
    val items = (1L to 5000L)
    val sks = Seq(1, 3, 7, 16).map(p => sketchOf(items, k, p))
    assert(sks.forall(_.sameElements(sks.head)),
      "sketch bytes differ across partitionings — merge is not canonical")
    val est = estOf(sks.head)
    val bound = 5.0 / math.sqrt(k - 1.0) * 5000
    assert(math.abs(est - 5000) <= bound,
      s"estimate $est off exact 5000 by more than $bound")
  }

  test("theta_union_merge: folding shard sketches equals the one-shot sketch, byte for byte") {
    val k = 64
    val items = (1L to 4000L)
    val oneShot = sketchOf(items, k, 1)
    for (shards <- Seq(2, 5, 11)) {
      val folded = items.zipWithIndex.map { case (v, i) => (i % shards, v) }
        .toDF("shard", "v")
        .groupBy("shard")
        .agg(ThetaFunctions.theta_sketch_bytes(col("v"), k).as("sk"))
        .agg(ThetaFunctions.theta_union_merge(col("sk"), k).as("sk"))
        .select("sk").as[Array[Byte]].collect()(0)
      assert(folded.sameElements(oneShot),
        s"$shards-shard fold diverged from the one-shot sketch")
    }
  }

  test("set ops: intersect / a-not-b / union estimates within the 5σ union-scaled bound") {
    val k = 128
    val a = (1L to 4000L)
    val b = (2001L to 6000L) // |∩|=2000, |a\b|=2000, |∪|=6000
    val ska = sketchOf(a, k, 3)
    val skb = sketchOf(b, k, 5)
    val bound = 5.0 / math.sqrt(k - 1.0) * 6000
    val i = ThetaBuf.setOpEstimate(ska, skb, "intersect")
    val d = ThetaBuf.setOpEstimate(ska, skb, "anotb")
    val u = ThetaBuf.setOpEstimate(ska, skb, "union")
    assert(math.abs(i - 2000) <= bound, s"intersect est $i vs 2000 (±$bound)")
    assert(math.abs(d - 2000) <= bound, s"anotb est $d vs 2000 (±$bound)")
    assert(math.abs(u - 6000) <= bound, s"union est $u vs 6000 (±$bound)")
    // disjoint sets: intersection estimate must be exactly 0
    val skc = sketchOf((100000L to 104000L), k, 2)
    assert(ThetaBuf.setOpEstimate(ska, skc, "intersect") == 0.0,
      "disjoint intersection must estimate 0")
  }

  private def mkEvents(dayUsers: Seq[(Int, Seq[Long])]): Seq[Ev] =
    dayUsers.flatMap { case (day, users) =>
      users.map(u => Ev(java.sql.Timestamp.valueOf(f"2026-03-${day}%02d 10:00:00"), u))
    }

  private val events = mkEvents(Seq(
    1 -> (1L to 40L),
    2 -> (21L to 60L),   // 20 retained, 20 new
    3 -> (41L to 50L),   // 10 retained, 0 new
    4 -> (1L to 5L)))    // 0 retained, 5 new

  private def served(m: ThetaMaintainer): Seq[(Long, Long, Long, Boolean, Boolean)] =
    m.serve(events.toDF()).as[(Long, Long, Long, Boolean, Boolean)].collect().toSeq

  test("theta maintainer: streamed sketches serve the one-shot contract; exact counts right") {
    val dir = java.nio.file.Files.createTempDirectory("graft-th-m").toString
    val m = new ThetaMaintainer(spark, s"$dir/c", k = 64)
    m.bootstrap(events.filter(_.ts.toString < "2026-03-02").toDF())
    m.ingestBatch(events.filter(e =>
      e.ts.toString >= "2026-03-02" && e.ts.toString < "2026-03-03").toDF(), Some(0L))
    m.ingestBatch(events.filter(_.ts.toString >= "2026-03-03").toDF(), Some(1L))
    val got = served(m)
    val ref = new ThetaMaintainer(spark, s"$dir/ref", k = 64)
    ref.bootstrap(events.toDF())
    assert(got == served(ref), "streamed serve diverged from one-shot bootstrap")
    // exact-mode sketches here (≤ 40 users/day < k): counts are exact
    assert(got.map(r => (r._2, r._3)) == Seq((20L, 20L), (10L, 0L), (0L, 5L)),
      s"exact retained/new counts wrong: $got")
    assert(got.forall(r => r._4 && r._5), s"bound flags violated: $got")
  }

  test("theta maintainer: the θ-union fold is idempotent — replay is a no-op even with the ledger bypassed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-th-i").toString
    val m = new ThetaMaintainer(spark, s"$dir/c", k = 16) // estimation mode on 40-user days
    m.bootstrap(events.filter(_.ts.toString < "2026-03-03").toDF())
    val batch = events.filter(_.ts.toString >= "2026-03-03").toDF()
    m.ingestBatch(batch) // no txnId: ledger skip unavailable
    def snapshot(): Map[Long, Seq[Byte]] =
      UpsertStore.read(spark, s"$dir/c").get
        .select(expr("unix_millis(day)"), col("sk"))
        .as[(Long, Array[Byte])].collect().toMap.view.mapValues(_.toSeq).toMap
    val before = snapshot()
    m.ingestBatch(batch) // replay, again without the ledger
    assert(snapshot() == before,
      "replayed batch changed sketch bytes — θ-union not idempotent")
    // and WITH the ledger, the version pointer also stays put
    m.ingestBatch(batch, Some(7L))
    val v = UpsertStore.latestVersion(spark, s"$dir/c")
    m.ingestBatch(batch, Some(7L))
    assert(UpsertStore.latestVersion(spark, s"$dir/c") == v,
      "ledgered replay advanced the store")
  }

  test("theta aggregates work through SQL TEXT, not just the Column API (ADVICE r14)") {
    // the registry wraps a bare AggregateFunction for SQL; pin that
    // wrapping with an actual SQL-text GROUP BY over both aggregates
    graft.GraftFunctions.register(spark)
    (1L to 100L).map(v => (v % 2, v)).toDF("g", "v")
      .createOrReplaceTempView("theta_sql_t")
    val est = spark.sql(
      """SELECT g, theta_estimate(theta_sketch_bytes(v, 64)) AS e
        |FROM theta_sql_t GROUP BY g ORDER BY g""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    // 50 distinct values per group, k=64 ⇒ exact mode
    assert(est == Seq((0L, 50.0), (1L, 50.0)),
      s"SQL-path theta_sketch_bytes/theta_estimate wrong: $est")
    // theta_union_merge through SQL: shard sketches re-merged in SQL
    // must estimate the full distinct count exactly (100 distinct
    // values across both groups stays under k=128 ⇒ exact mode)
    val merged = spark.sql(
      """SELECT theta_estimate(theta_union_merge(sk, 128)) AS e
        |FROM (SELECT g, theta_sketch_bytes(v, 128) AS sk
        |      FROM theta_sql_t GROUP BY g)""".stripMargin)
      .as[Double].collect()(0)
    assert(merged == 100.0, s"SQL-path theta_union_merge wrong: $merged")
  }

  test("theta maintainer foreachBatch wiring + checkpoint restart: serve equals one-shot") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-th-fb").toString
    val m = new ThetaMaintainer(spark, s"$dir/c", k = 64)
    m.bootstrap(events.filter(_.ts.toString < "2026-03-02").toDF())
    val input = MemoryStream[Ev]
    val q = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(events.filter(e =>
      e.ts.toString >= "2026-03-02" && e.ts.toString < "2026-03-03"): _*)
    q.processAllAvailable()
    q.stop()
    val q2 = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(events.filter(_.ts.toString >= "2026-03-03"): _*)
    q2.processAllAvailable()
    q2.stop()
    val ref = new ThetaMaintainer(spark, s"$dir/ref", k = 64)
    ref.bootstrap(events.toDF())
    assert(served(m) == served(ref),
      "post-restart theta serve must equal the from-scratch bootstrap")
  }
}

object ThetaSketchSpec {
  case class Ev(ts: java.sql.Timestamp, user_id: Long)
}
