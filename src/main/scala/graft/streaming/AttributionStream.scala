package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One arriving event, carrying both the watermark column (`ts`) and
  * its exact-µs integer form (`ts_us` — the arithmetic the channel
  * rule runs on, same integer-cents/integer-µs discipline as the batch
  * operator). */
case class AttrEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                     event_id: Long, event_type: String, cents: Long)

/** Per-user state: the most recent view/click. 16 bytes + a short
  * string per ACTIVE user. */
case class TouchState(t_us: Long, t_type: String)

/** One attributed conversion, emitted as the purchase arrives. */
case class Attribution(user_id: Long, event_id: Long, ts_us: Long,
                       channel: String, value_cents: Long)

/** STREAMING last-touch attribution: the stateful form of
  * `events_attribution` (operators/Quality.scala) — each purchase is
  * credited AT ARRIVAL to its user's most recent view/click within the
  * preceding 7 days, else 'direct'.
  *
  * State design: one (ts, type) record per user —
  * `flatMapGroupsWithState` in Append mode with EVENT-TIME TIMEOUT
  * eviction at touch_ts + 7 days. The eviction horizon EQUALS the
  * attribution window, so dropping timed-out state is
  * semantics-preserving, not approximate: a touch the watermark has
  * carried 7 days past can never be credited again (any later purchase
  * falls outside the window and resolves 'direct' with or without the
  * state). That bounds state to users with a touch inside the trailing
  * 7 days — at 100 TB/years-of-log scale the state footprint tracks
  * the ACTIVE window population, not the all-time user count. Within a
  * micro-batch the group's events replay in (ts, event_id) order, the
  * batch operator's exact deterministic order.
  */
object AttributionStream {

  val SevenDaysUs: Long = 7L * 86400L * 1000000L

  /** `src`: a streaming frame with the events schema. `delay`: the
    * out-of-orderness the watermark tolerates before state eviction
    * may fire (late-data dial; eviction correctness does not depend
    * on it, see class doc). */
  def attribute(src: DataFrame, delay: String = "1 hour"): Dataset[Attribution] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.select($"user_id", $"ts", unix_micros($"ts").as("ts_us"),
        $"event_id", $"event_type",
        round($"value" * 100).cast("long").as("cents"))
      .withWatermark("ts", delay)
      .as[AttrEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step _)
  }

  private def step(user: Long, events: Iterator[AttrEvent],
      state: GroupState[TouchState]): Iterator[Attribution] = {
    if (state.hasTimedOut) {
      // watermark passed touch_ts + 7d: no future purchase can credit
      // this touch — drop it (see class doc for why this is exact)
      state.remove()
      Iterator.empty
    } else {
      var touch = state.getOption
      val out = Seq.newBuilder[Attribution]
      events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (e.event_type == "purchase") {
          val ch = touch match {
            case Some(TouchState(tUs, tType)) if e.ts_us - tUs <= SevenDaysUs => tType
            case _ => "direct"
          }
          out += Attribution(user, e.event_id, e.ts_us, ch, e.cents)
        }
        if (e.event_type == "view" || e.event_type == "click")
          touch = Some(TouchState(e.ts_us, e.event_type))
      }
      touch match {
        case Some(t) =>
          state.update(t)
          state.setTimeoutTimestamp(t.t_us / 1000L + SevenDaysUs / 1000L)
        case None => ()
      }
      out.result().iterator
    }
  }
}
