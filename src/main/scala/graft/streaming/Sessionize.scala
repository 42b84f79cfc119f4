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
            // Gap-merge the stored session and this batch's events as
            // INTERVALS, sorted by start: consecutive intervals within
            // gap of each other coalesce, so several late events that
            // precede the stored session by more than gap still merge
            // with EACH OTHER into one session instead of fragmenting
            // into singletons. Everything but the latest interval is
            // separated by > gap from its successor and is emitted
            // closed; the latest becomes the new state.
            val intervals =
              (state.getOption.toList ++
                it.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)))
                .sortBy(s => (s.startMs, s.lastMs))
            if (intervals.isEmpty) Iterator.empty
            else {
              val merged = intervals.foldLeft(List.empty[SessionState]) { (acc, s) =>
                acc match {
                  case head :: tail if s.startMs <= head.lastMs + gapMs =>
                    SessionState(head.startMs, math.max(head.lastMs, s.lastMs),
                      head.nEvents + s.nEvents, head.sumValue + s.sumValue) :: tail
                  case _ => s :: acc
                }
              }.reverse
              val last = merged.last
              state.update(last)
              state.setTimeoutTimestamp(last.lastMs + gapMs)
              merged.init.iterator.map(s =>
                UserSession(userId, s.startMs, s.lastMs, s.nEvents, s.sumValue))
            }
          }
        })
  }
}
