package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("flatMapGroupsWithState sessionization: gap closes sessions via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.UserEvent]
    val gapMs = 60_000L // 1 minute

    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs)

    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("graft_sessions")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    def ev(userId: Long, t: Long, v: Double) =
      Sessionize.UserEvent(userId, new Timestamp(t), "click", v)

    // session 1: two events 10s apart; then 5 min silence; session 2
    input.addData(ev(1, 10_000, 1.0), ev(1, 20_000, 2.0))
    q.processAllAvailable()
    input.addData(ev(1, 320_000, 5.0)) // watermark jumps past 20s+gap → closes session 1
    q.processAllAvailable()
    input.addData(ev(1, 900_000, 7.0)) // closes session 2
    q.processAllAvailable()

    val out = spark.table("graft_sessions")
      .as[Sessionize.UserSession].collect().sortBy(_.session_start_ms)
    q.stop()

    assert(out.length >= 1, "at least the first session must have closed")
    val s1 = out.head
    assert(s1.user_id == 1L)
    assert(s1.session_start_ms == 10_000L && s1.session_end_ms == 20_000L)
    assert(s1.n_events == 2 && s1.sum_value == 3.0)
    if (out.length > 1) {
      assert(out(1).session_start_ms == 320_000L && out(1).n_events == 1)
    }
  }

  test("two late events within gap of each other merge into ONE pre-session session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.UserEvent]
    val gapMs = 60_000L

    // generous watermark delay so the late events are still admitted
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "2 hours"), gapMs)

    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("graft_sessions_late")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    def ev(t: Long, v: Double) =
      Sessionize.UserEvent(2L, new Timestamp(t), "click", v)

    // establish a session far in the future of the late events
    input.addData(ev(1_000_000, 1.0))
    q.processAllAvailable()
    // two LATE events, both > gap before the stored session start, but
    // within gap of each other: must merge into one closed session
    input.addData(ev(100_000, 2.0), ev(130_000, 3.0))
    q.processAllAvailable()

    val out = spark.table("graft_sessions_late")
      .as[Sessionize.UserSession].collect().sortBy(_.session_start_ms)
    q.stop()

    assert(out.length == 1,
      s"expected ONE merged pre-session session, got: ${out.toSeq}")
    assert(out.head.session_start_ms == 100_000L && out.head.session_end_ms == 130_000L)
    assert(out.head.n_events == 2 && out.head.sum_value == 5.0)
  }
}
