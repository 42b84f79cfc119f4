package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: user sessionization via
  * `flatMapGroupsWithState` (SURVEY §2.7 "stateful ops"). Emits a
  * session row when a user is inactive past the gap (event-time
  * timeout), so state is bounded by active users, not history —
  * the property that keeps this running at 100 TB/day ingest.
  */
object Sessionize {

  case class UserEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  case class SessionState(startMs: Long, lastMs: Long, nEvents: Int, sumValue: Double)

  case class UserSession(
      user_id: Long, session_start_ms: Long, session_end_ms: Long,
      n_events: Int, sum_value: Double)

  /** Streaming sessionization. Requires a watermark on `ts` upstream;
    * a session closes when the watermark passes lastEvent + gap. */
  def sessions(events: Dataset[UserEvent], gapMs: Long): Dataset[UserSession] = {
    implicit val outEnc = Encoders.product[UserSession]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[UserEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSession(userId, s.startMs, s.lastMs, s.nEvents, s.sumValue))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // within gap of the session span (either side): merge,
                // extending the span in both directions — a late
                // in-watermark event may precede the recorded start
                case Some(s) if t >= s.startMs - gapMs && t <= s.lastMs + gapMs =>
                  cur = Some(SessionState(
                    math.min(s.startMs, t), math.max(s.lastMs, t),
                    s.nEvents + 1, s.sumValue + e.value))
                // after the gap: close current, start new
                case Some(s) if t > s.lastMs + gapMs =>
                  closed ::= UserSession(userId, s.startMs, s.lastMs, s.nEvents, s.sumValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                // a gap or more BEFORE the session: an earlier,
                // already-complete session — emit it directly
                case Some(_) =>
                  closed ::= UserSession(userId, t, t, 1, e.value)
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          }
        })
  }
}
