package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** q147's streaming twin ([[RollupMaintainer]]): the additive rollup
  * merge is NOT idempotent, so the txn-ledgered upsert is the
  * load-bearing part — streamed state must equal the one-shot rollup,
  * replays must not double-add, and a checkpoint restart must resume
  * without losing or doubling a batch. */
class RollupMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import RollupMaintainSpec._

  private def ts(day: Int, sec: Int) =
    new Timestamp(1704067200000L + day * 86400000L + sec * 1000L)

  private def rollupOf(rows: Seq[Ev]): Map[(String, Long), (Long, Double)] =
    rows.groupBy(e => (e.event_type, e.ts.getTime / 86400000L * 86400000L))
      .map { case (k, es) =>
        k -> (es.size.toLong, math.round(es.map(_.value).sum * 100) / 100.0)
      }

  private def served(m: RollupMaintainer): Map[(String, Long), (Long, Double)] =
    m.serve().collect().map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap

  test("rollup maintainer: streamed batches equal the one-shot rollup; replay is add-safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup-m").toString
    val m = new RollupMaintainer(spark, s"$dir/r")
    val hist = Seq(Ev("click", ts(0, 10), 1.5), Ev("click", ts(0, 20), 2.0),
      Ev("view", ts(1, 5), 3.25))
    val b1 = Seq(Ev("click", ts(0, 30), 4.0), Ev("purchase", ts(2, 1), 10.0))
    m.bootstrap(hist.toDF())
    m.ingestBatch(b1.toDF(), txnId = Some(0L))
    // REPLAY with the same txn: the additive merge must be skipped
    // outright (values would double otherwise — no convergence to rely
    // on) and the store version must not advance
    val v = UpsertStore.latestVersion(spark, s"$dir/r")
    m.ingestBatch(b1.toDF(), txnId = Some(0L))
    assert(UpsertStore.latestVersion(spark, s"$dir/r") == v)
    assert(served(m) == rollupOf(hist ++ b1),
      s"streamed rollup diverged: ${served(m)} vs ${rollupOf(hist ++ b1)}")
  }

  test("rollup maintainer: untouched keys keep their stored row through a delta commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup-d").toString
    val m = new RollupMaintainer(spark, s"$dir/r")
    m.bootstrap(Seq(Ev("click", ts(0, 1), 1.0), Ev("view", ts(5, 1), 7.0)).toDF())
    // the delta touches only ("click", day 0); ("view", day 5) must
    // ride through untouched — delta-keyed traffic, not a rewrite
    m.ingestBatch(Seq(Ev("click", ts(0, 2), 2.0)).toDF(), txnId = Some(0L))
    val out = served(m)
    assert(out(("click", 1704067200000L)) == ((2L, 3.0)))
    assert(out(("view", 1704067200000L + 5 * 86400000L)) == ((1L, 7.0)))
  }

  test("rollup maintainer foreachBatch wiring + checkpoint restart: nothing lost, nothing doubled") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup-fb").toString
    val m = new RollupMaintainer(spark, s"$dir/r")
    val hist = Seq(Ev("click", ts(0, 10), 1.0))
    m.bootstrap(hist.toDF())
    val input = MemoryStream[Ev]
    val q = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    val b1 = Seq(Ev("click", ts(0, 20), 2.0), Ev("view", ts(1, 1), 5.0))
    input.addData(b1: _*)
    q.processAllAvailable()
    // mid-stream serve is current to the committed batch
    assert(served(m) == rollupOf(hist ++ b1))
    // simulated crash/deploy: stop, restart on the SAME checkpoint
    q.stop()
    val q2 = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    val b2 = Seq(Ev("purchase", ts(0, 40), 9.5), Ev("click", ts(1, 2), 0.5))
    input.addData(b2: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(served(m) == rollupOf(hist ++ b1 ++ b2),
      "post-restart rollup must equal the from-scratch aggregate over history + every batch")
  }
}

object RollupMaintainSpec {
  case class Ev(event_type: String, ts: Timestamp, value: Double)
}
