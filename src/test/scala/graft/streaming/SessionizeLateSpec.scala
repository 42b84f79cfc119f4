package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Probe: a group whose only arriving events are LATE (other users'
  * fresh events already pushed the global watermark past this user's
  * lastMs + gap). The query must not crash and must close the overdue
  * session. */
class SessionizeLateSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("a watermark-overdue session closes cleanly instead of crashing the query") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.UserEvent]
    val gapMs = 30_000L

    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "10 seconds"), gapMs)

    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("graft_sessions_overdue")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    def ev(userId: Long, t: Long) =
      Sessionize.UserEvent(userId, new Timestamp(t), "click", 1.0)

    // user 9's session starts fresh; user 1 then pushes the global
    // watermark FAR past user 9's (lastMs + gap) close time
    input.addData(ev(9, 50_000))
    q.processAllAvailable()
    input.addData(ev(1, 10_000_000))
    q.processAllAvailable()
    // one more batch so any pending event-time timeout fires
    input.addData(ev(1, 10_100_000))
    q.processAllAvailable()
    val failure = q.exception
    q.stop()
    assert(failure.isEmpty, s"query died: ${failure.map(_.getMessage)}")

    val out = spark.table("graft_sessions_overdue")
      .as[Sessionize.UserSession].collect()
    assert(out.exists(s => s.user_id == 9L && s.session_start_ms == 50_000L),
      s"user 9's overdue session never closed: ${out.toSeq}")
  }
}
