package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.operators.Analytics

/** Streaming last-touch attribution: watermark-ordered processing must
  * reproduce the batch window's decisions (q137) event for event, and a
  * click arriving a batch AFTER its purchase must still attribute it —
  * the out-of-order case the buffer exists for. */
class AttributionSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import Attribution.{AttribEvent, AttributedPurchase}

  private def ev(id: Long, uid: Long, tMs: Long, typ: String, v: Double = 0.0) =
    AttribEvent(id, uid, new Timestamp(tMs), typ, v)

  test("late click arriving after its purchase still attributes (cross-batch buffer)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AttribEvent]
    val out = Attribution.attribute(
      input.toDS().withWatermark("ts", "30 seconds"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("graft_attrib_late")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(ev(10, 1, 50000, "purchase", 5.0))
      q.processAllAvailable()
      assert(spark.table("graft_attrib_late").count() == 0,
        "purchase must hold until the watermark settles its order")
      // the click lands in a LATER batch with an EARLIER event time
      input.addData(ev(11, 1, 30000, "click"), ev(90, 2, 100000, "view"))
      q.processAllAvailable()
      input.addData(ev(91, 2, 200000, "view")) // push watermark past 50s
      q.processAllAvailable()
      input.addData(ev(92, 2, 300000, "view")) // trigger the timeout pass
      q.processAllAvailable()
      val rows = spark.table("graft_attrib_late").as[AttributedPurchase].collect()
      assert(rows.map(r => (r.purchase_event_id, r.channel)).toSet ==
        Set((10L, "click")), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("channel decision: click beats view on ties, lookback expires touches") {
    import Attribution.channelOf
    val day = 86400000L
    assert(channelOf(Some(100), Some(100), 200, day) == "click")
    assert(channelOf(Some(100), Some(150), 200, day) == "view")
    assert(channelOf(Some(100), None, 100 + day + 1, day) == "none")
    assert(channelOf(None, None, 0, day) == "none")
  }

  test("streaming ≡ batch q137 on the sf0.001 events fed out of order") {
    implicit val sqlCtx = spark.sqlContext
    val sf = SharedSpark.sf0001
    val events = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "event_type", "value")
      .as[AttribEvent].collect()
    val maxMs = events.map(_.ts.getTime).max

    val input = MemoryStream[AttribEvent]
    // watermark delay > the whole span: nothing is ever "too late", so
    // arrival order can be arbitrary and equivalence must be EXACT
    val out = Attribution.attribute(
      input.toDS().withWatermark("ts", "40 days"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("graft_attrib_eq")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // deterministic scramble: hash order, 4 chunks
      val scrambled = events.sortBy(e => (e.event_id * 2654435761L) % 4294967296L)
      scrambled.grouped((scrambled.length / 4).max(1)).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      // two sentinel batches: first advances max event time, second lets
      // the new watermark fire the timeout flush
      input.addData(ev(-1, -1, maxMs + 90L * day, "sentinel"))
      q.processAllAvailable()
      input.addData(ev(-2, -1, maxMs + 91L * day, "sentinel"))
      q.processAllAvailable()

      val got = spark.table("graft_attrib_eq")
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
             round(sum("value"), 2).as("attributed_value"))
        .collect()
        .map(r => r.getAs[String]("channel") ->
          (r.getAs[Long]("n_purchases"), r.getAs[Double]("attributed_value"))).toMap
      val want = Analytics.q137Attribution.fn(spark, sf).collect()
        .map(r => r.getAs[String]("channel") ->
          (r.getAs[Long]("n_purchases"), r.getAs[Double]("attributed_value"))).toMap
      assert(got == want, s"streaming $got vs batch $want")
    } finally q.stop()
  }

  private val day = 86400000L
}
