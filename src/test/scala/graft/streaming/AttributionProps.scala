package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Randomized equivalence for streaming attribution: arbitrary event
  * soups, arbitrary batch slicing, always ≡ the in-memory sequential
  * replay (the q137 semantics). Fixed seed — failures reproduce. */
class AttributionProps extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import Attribution.{AttribEvent, AttributedPurchase}

  private val lookbackMs = 3600_000L // 1 h, so expiry paths actually fire

  /** Sequential ground truth: process in (ts, event_id) order. */
  private def replay(events: Seq[AttribEvent]): Map[Long, String] = {
    val byUser = events.groupBy(_.user_id)
    byUser.values.flatMap { evs =>
      var lc = Option.empty[Long]; var lv = Option.empty[Long]
      evs.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
        e.event_type match {
          case "click" => lc = Some(e.ts.getTime); None
          case "view"  => lv = Some(e.ts.getTime); None
          case "purchase" =>
            Some(e.event_id -> Attribution.channelOf(lc, lv, e.ts.getTime, lookbackMs))
          case _ => None
        }
      }
    }.toMap
  }

  test("random event soups, random batch slicing: streaming ≡ sequential replay (200 purchases x 3 trials)") {
    val rnd = new scala.util.Random(4242)
    val types = Array("click", "view", "purchase", "error")
    for (trial <- 1 to 3) {
      val n = 400
      val events = (1 to n).map { i =>
        AttribEvent(i.toLong, rnd.nextInt(8).toLong,
          new Timestamp(rnd.nextInt(36_000) * 1000L), // 10 h span ≫ lookback
          types(rnd.nextInt(types.length)), rnd.nextDouble())
      }
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[AttribEvent]
      val out = Attribution.attribute(
        input.toDS().withWatermark("ts", "11 hours"), lookbackMs)
      val name = s"graft_attrib_prop_$trial"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(0)).start()
      try {
        // random arrival order, random batch sizes
        val arrival = rnd.shuffle(events)
        var rest = arrival
        while (rest.nonEmpty) {
          val k = 1 + rnd.nextInt(120)
          input.addData(rest.take(k)); q.processAllAvailable()
          rest = rest.drop(k)
        }
        val endMs = events.map(_.ts.getTime).max
        input.addData(AttribEvent(-1, -1, new Timestamp(endMs + 100L * 3600_000L), "x", 0))
        q.processAllAvailable()
        input.addData(AttribEvent(-2, -1, new Timestamp(endMs + 101L * 3600_000L), "x", 0))
        q.processAllAvailable()
        val got = spark.table(name).as[AttributedPurchase].collect()
          .map(r => r.purchase_event_id -> r.channel).toMap
        val want = replay(events)
        assert(got == want,
          s"trial $trial: diffs=${(want.toSet diff got.toSet).take(5)} | ${(got.toSet diff want.toSet).take(5)}")
      } finally q.stop()
    }
  }
}
