package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the stateful twin of the batch
  * q137 ([[graft.operators.Analytics.q137Attribution]]): each purchase
  * credits the user's most recent preceding click/view within the
  * lookback window (click wins ties), emitted as an append stream.
  *
  * Out-of-order safety: events buffer in state until the watermark
  * passes their timestamp, then process in (ts, event_id) order — the
  * exact order the batch window uses — so a click that arrives a batch
  * late still attributes the purchase behind it, as long as it beats
  * the watermark (the same late-data contract as every other stateful
  * op here).
  *
  * State is bounded twice over: the buffer holds only events newer
  * than the watermark (watermark-bounded, like sessionization), and
  * the carried last-touch pair dies `lookback` after its timestamp —
  * a user idle past the lookback costs ZERO state, the property that
  * keeps per-user attribution viable at 100 TB/day event volume.
  */
object Attribution {

  case class AttribEvent(
      event_id: Long, user_id: Long, ts: Timestamp, event_type: String, value: Double)

  case class AttributedPurchase(
      user_id: Long, purchase_event_id: Long, purchase_ts_ms: Long,
      channel: String, value: Double)

  /** buffer: events not yet past the watermark (event-time order is
    * settled only behind it); lastClickMs/lastViewMs: the processed
    * prefix's last touches. */
  case class AttribState(
      buffer: Seq[(Long, Long, String, Double)], // (tsMs, event_id, type, value)
      lastClickMs: Option[Long],
      lastViewMs: Option[Long])

  def channelOf(lc: Option[Long], lv: Option[Long], tsMs: Long, lookbackMs: Long): String =
    if (lc.exists(c => c >= tsMs - lookbackMs && lv.forall(c >= _))) "click"
    else if (lv.exists(_ >= tsMs - lookbackMs)) "view"
    else "none"

  /** Attribute purchases in `events` (requires an upstream watermark on
    * `ts`). Emits one row per purchase once the watermark passes it. */
  def attribute(events: Dataset[AttribEvent],
                lookbackMs: Long = 86400000L): Dataset[AttributedPurchase] = {
    implicit val outEnc = Encoders.product[AttributedPurchase]
    implicit val stateEnc = Encoders.product[AttribState]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[AttribEvent], state: GroupState[AttribState]) => {
          val st = state.getOption.getOrElse(AttribState(Nil, None, None))
          val wm = state.getCurrentWatermarkMs()
          val all = (st.buffer ++ it.map(e =>
              (e.ts.getTime, e.event_id, e.event_type, e.value)))
            .sortBy(t => (t._1, t._2))
          val (ready, hold) = all.partition(_._1 <= wm)

          var lc = st.lastClickMs
          var lv = st.lastViewMs
          val out = ready.flatMap { case (tsMs, eid, typ, v) =>
            typ match {
              case "click" => lc = Some(tsMs); None
              case "view"  => lv = Some(tsMs); None
              case "purchase" =>
                Some(AttributedPurchase(userId, eid, tsMs,
                  channelOf(lc, lv, tsMs, lookbackMs), v))
              case _ => None
            }
          }

          // Garbage-collect: a last touch older than lookback can never
          // attribute a future (post-watermark) purchase.
          val lcAlive = lc.filter(_ >= wm - lookbackMs)
          val lvAlive = lv.filter(_ >= wm - lookbackMs)
          if (hold.isEmpty && lcAlive.isEmpty && lvAlive.isEmpty) {
            state.remove()
          } else {
            state.update(AttribState(hold, lcAlive, lvAlive))
            // wake when the earliest held event settles, or when the
            // carried touches expire — whichever keeps state minimal
            val next = (hold.map(_._1) ++
              (lcAlive.toSeq ++ lvAlive.toSeq).map(_ + lookbackMs)).min
            state.setTimeoutTimestamp(math.max(next, wm + 1))
          }
          out.iterator
        })
  }
}
