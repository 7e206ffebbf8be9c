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

/** One touch a future purchase may still credit. `t_id` is the
  * event_id tiebreaker — the batch rule orders by (ts, event_id), so
  * the buffer must too. */
case class TouchRec(t_us: Long, t_id: Long, t_type: String)

/** Per-user state: every touch that can still be credited by a
  * purchase the watermark admits, ascending by (t_us, t_id). See
  * [[AttributionStream.prune]] for why this stays small. */
case class TouchState(touches: List[TouchRec])

/** One attributed conversion, emitted as the purchase arrives. */
case class Attribution(user_id: Long, event_id: Long, ts_us: Long,
                       channel: String, value_cents: Long)

/** STREAMING last-touch attribution: the stateful form of
  * `events_attribution` (operators/Quality.scala) — each purchase is
  * credited AT ARRIVAL to its user's most recent view/click at or
  * before it (by the batch rule's (ts, event_id) order) within the
  * preceding 7 days, else 'direct'.
  *
  * State design: a per-user BUFFER of candidate touches —
  * `flatMapGroupsWithState` in Append mode with EVENT-TIME TIMEOUT
  * eviction. A single "latest touch" cell is NOT enough under the
  * out-of-orderness the watermark exists to tolerate: a late touch
  * must not overwrite a newer one (a later purchase would then credit
  * the stale touch), and a late purchase must credit the latest touch
  * BEFORE ITSELF, which a newer touch may have already displaced. The
  * buffer keeps exactly the touches a still-admissible purchase could
  * credit, so the streamed assignment equals the batch rule for every
  * arrival order the watermark admits.
  *
  * The buffer stays bounded by [[prune]]: any purchase not yet dropped
  * as late has ts ≥ watermark, so (a) a touch older than wm − 7d is
  * outside every admissible purchase's window, and (b) of the touches
  * at or before wm only the LATEST can win an admissible purchase's
  * max — state is one touch plus the touches inside the watermark
  * delay, tracking the ACTIVE window population, not the all-time
  * user count. Eviction at max-touch + 7d is semantics-preserving for
  * the same reason (the reference's offset table grows forever;
  * MongoDBOplogSource.java:133-134 — here state dies with its window).
  */
object AttributionStream {

  val SevenDaysUs: Long = 7L * 86400L * 1000000L

  /** `src`: a streaming frame with the events schema. `delay`: the
    * out-of-orderness the watermark tolerates — arrivals within it
    * are credited exactly per the batch rule regardless of order
    * (class doc); eviction correctness does not depend on it. */
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

  /** Drop touches no purchase with ts ≥ `wmUs` can credit: everything
    * older than wm − 7d, and all but the latest of the touches at or
    * before wm (every admissible purchase sees all of those, so only
    * the max by (t_us, t_id) can be its last-touch). `touches` is
    * ascending (t_us, t_id); the result stays ascending. */
  private[streaming] def prune(touches: List[TouchRec], wmUs: Long): List[TouchRec] = {
    val (atOrBefore, after) = touches.span(_.t_us <= wmUs)
    val keep = atOrBefore.lastOption.toList ::: after
    keep.filter(_.t_us + SevenDaysUs >= wmUs)
  }

  private def step(user: Long, events: Iterator[AttrEvent],
      state: GroupState[TouchState]): Iterator[Attribution] = {
    if (state.hasTimedOut) {
      // watermark passed latest-touch + 7d: no admissible purchase can
      // credit anything buffered — drop it all (see class doc)
      state.remove()
      Iterator.empty
    } else {
      var touches = state.getOption.map(_.touches).getOrElse(Nil)
      val out = Seq.newBuilder[Attribution]
      // within the batch, replay in the batch rule's exact order; the
      // buffer supplies the cross-batch order the iterator cannot
      events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (e.event_type == "purchase") {
          val ch = touches
            .filter(t => (t.t_us < e.ts_us || (t.t_us == e.ts_us && t.t_id < e.event_id))
              && e.ts_us - t.t_us <= SevenDaysUs)
            .lastOption.map(_.t_type).getOrElse("direct")
          out += Attribution(user, e.event_id, e.ts_us, ch, e.cents)
        }
        if (e.event_type == "view" || e.event_type == "click") {
          val t = TouchRec(e.ts_us, e.event_id, e.event_type)
          val (lt, geq) = touches.span(x =>
            x.t_us < t.t_us || (x.t_us == t.t_us && x.t_id < t.t_id))
          touches = lt ::: t :: geq
        }
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      touches = prune(touches, wmUs)
      touches match {
        case Nil => if (state.exists) state.remove()
        case ts =>
          state.update(TouchState(ts))
          state.setTimeoutTimestamp(ts.last.t_us / 1000L + SevenDaysUs / 1000L)
      }
      out.result().iterator
    }
  }
}
