package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Streaming operators beyond the traffic pipeline: event dedup within
  * the watermark (exactly-once ingest for an at-least-once bus) and
  * stream-stream time-bounded joins — both bounded-state by watermark,
  * which is what keeps them viable at 100 TB/day.
  */
class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import StreamingOpsSpec.Ev

  test("streaming dropDuplicatesWithinWatermark: replayed event ids collapse") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val deduped = input.toDS()
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    def ev(id: Long, t: Long) = Ev(id, new Timestamp(t), id.toDouble)
    input.addData(ev(1, 1000), ev(2, 2000), ev(1, 2500)) // id 1 duplicated
    q.processAllAvailable()
    input.addData(ev(2, 3000), ev(3, 4000)) // id 2 duplicated across batches
    q.processAllAvailable()
    val ids = spark.table("graft_dedup_stream").select("id").as[Long].collect().sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }

  test("stream-stream join: clicks enriched by impressions within 1 minute") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val imp = impressions.toDS().withWatermark("ts", "10 seconds")
      .select($"id".as("imp_ad_id"), $"ts".as("imp_ts"))
    val clk = clicks.toDS().withWatermark("ts", "10 seconds")
      .select($"id".as("ad_id"), $"ts".as("click_ts"), $"v".as("click_value"))
    val joined = imp.join(clk,
      expr("""imp_ad_id = ad_id AND click_ts >= imp_ts AND
              click_ts <= imp_ts + INTERVAL 1 MINUTE""".stripMargin))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_ss_join")
      .trigger(Trigger.ProcessingTime(0)).start()
    impressions.addData(Ev(100, new Timestamp(10_000), 0))
    clicks.addData(Ev(100, new Timestamp(30_000), 1.5))   // within window → match
    clicks.addData(Ev(100, new Timestamp(200_000), 9.9))  // 190s later → no match
    q.processAllAvailable()
    val out = spark.table("graft_ss_join")
    val n = out.count()
    val v = out.select("click_value").as[Double].collect().toSeq
    q.stop()
    assert(n == 1, s"expected exactly the in-window click, got $n rows")
    assert(v == Seq(1.5))
  }
  test("streaming exact dedup: replayed document content collapses to first arrival") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOpsSpec.Doc]
    val deduped = StreamingDedup.exactDedupStream(
      input.toDF(), watermark = "10 seconds")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_doc_dedup")
      .trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, t: Long, text: String) =
      StreamingOpsSpec.Doc(id, new Timestamp(t), text)
    input.addData(doc(1, 1000, "alpha beta"), doc(2, 2000, "gamma"))
    q.processAllAvailable()
    // replayed content (different doc_id, same text) within watermark
    input.addData(doc(3, 2500, "alpha beta"), doc(4, 3000, "delta"))
    q.processAllAvailable()
    val kept = spark.table("graft_doc_dedup")
      .select("doc_id").as[Long].collect().sorted
    q.stop()
    assert(kept.toSeq == Seq(1L, 2L, 4L), s"got ${kept.toSeq}")
  }
}

object StreamingOpsSpec {
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  case class Ev(id: Long, ts: Timestamp, v: Double)
}
