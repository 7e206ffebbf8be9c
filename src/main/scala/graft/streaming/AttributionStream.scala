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

/** One purchase awaiting watermark-finalized emission. */
case class PendRec(p_us: Long, p_id: Long, cents: Long)

/** Per-user state: the touches a still-admissible purchase could
  * credit (ascending (t_us, t_id); see [[AttributionStream.prune]]
  * for the bound) plus — in at-watermark emission — the purchases the
  * watermark has not yet finalized. */
case class TouchState(touches: List[TouchRec], pending: List[PendRec])

/** One attributed conversion. */
case class Attribution(user_id: Long, event_id: Long, ts_us: Long,
                       channel: String, value_cents: Long)

/** One multi-touch credit row: `credit_micro` of the purchase's value
  * assigned to `channel` (a touch type, or 'direct' for windowless
  * purchases) — the streaming form of one
  * `events_attribution_position` input row before its channel
  * aggregation. */
case class PositionCredit(user_id: Long, event_id: Long, ts_us: Long,
                          channel: String, credit_micro: Long, value_cents: Long)

/** STREAMING attribution: the stateful forms of `events_attribution`
  * and `events_attribution_position` (operators/Quality.scala).
  *
  * State design: a per-user BUFFER of candidate touches —
  * `flatMapGroupsWithState` in Append mode with EVENT-TIME TIMEOUT
  * eviction. A single "latest touch" cell is NOT enough under the
  * out-of-orderness the watermark exists to tolerate: a late touch
  * must not overwrite a newer one (a later purchase would then credit
  * the stale touch), and a late purchase must credit the latest touch
  * BEFORE ITSELF, which a newer touch may have already displaced.
  *
  * TWO EMISSION MODES, one latency/finality trade:
  *
  *  - emit-at-arrival (default): each purchase is credited the moment
  *    it arrives, from the touches that HAVE arrived. Exact vs the
  *    batch rule whenever no touch arrives later than a purchase it
  *    should credit (late purchases are exact unconditionally — the
  *    buffer holds what they need); a touch arriving after such a
  *    purchase is the one disorder this mode cannot repair, because
  *    the emission is already out.
  *  - at-watermark (`emitAtWatermark = true`): purchases buffer in
  *    state and emit once the watermark passes their event time — at
  *    which point every touch the batch rule would consult has either
  *    arrived or been dropped as late, so the streamed assignment
  *    equals the batch rule over the admitted event log for EVERY
  *    arrival order. Latency = the watermark delay; the purchase
  *    buffer holds at most the trailing delay window's purchases.
  *
  * The touch buffer stays bounded by [[prune]]: any purchase not yet
  * dropped as late has ts ≥ watermark, so (a) a touch older than
  * wm − 7d is outside every admissible purchase's window, and (b) for
  * LAST-touch crediting, of the touches at or before wm only the
  * LATEST can win — state is one touch plus the touches inside the
  * watermark delay, tracking the ACTIVE window population, not the
  * all-time user count (the reference's offset table grows forever;
  * MongoDBOplogSource.java:133-134 — here state dies with its
  * window). The position model keeps the full 7-day tail (no
  * collapse — the U-shape needs first and middle touches), still
  * activity-bounded.
  */
object AttributionStream {

  val SevenDaysUs: Long = 7L * 86400L * 1000000L

  /** `src`: a streaming frame with the events schema. `delay`: the
    * out-of-orderness the watermark tolerates. `emitAtWatermark`:
    * false = credit at arrival (lowest latency, exact unless a touch
    * arrives after a purchase it should credit); true = credit when
    * the watermark finalizes the purchase (exact vs the admitted
    * batch rule for every arrival order). */
  def attribute(src: DataFrame, delay: String = "1 hour",
      emitAtWatermark: Boolean = false): Dataset[Attribution] = {
    val spark = src.sparkSession
    import spark.implicits._
    val in = events(src, delay)
    if (emitAtWatermark)
      in.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          stepAtWatermark _)
    else
      in.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          stepAtArrival _)
  }

  /** STREAMING U-SHAPED MULTI-TOUCH attribution: one credit row per
    * (purchase, touch) — 40/20/40 first/middle/last, collapsing at
    * n ≤ 2, 'direct' when windowless — emitted when the watermark
    * finalizes the purchase (multi-touch is inherently at-watermark:
    * the credit SPLIT depends on the complete window, so emitting at
    * arrival would mis-split, not just mis-order). Aggregating the
    * emitted rows by channel reproduces `events_attribution_position`
    * exactly (spec-pinned). */
  def attributePosition(src: DataFrame,
      delay: String = "1 hour"): Dataset[PositionCredit] = {
    val spark = src.sparkSession
    import spark.implicits._
    events(src, delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stepPosition _)
  }

  /** STREAMING TIME-DECAY multi-touch attribution: one credit row per
    * (purchase, touch) with weight 2^(6−age_days) and credit =
    * (10⁶·w) div Σw — `events_attribution_timedecay`'s rule at
    * watermark finalization (like the U-shape, the split depends on
    * the complete window). Shares [[attributePosition]]'s full-window
    * prune and state walk; only the credit callback differs. */
  def attributeTimeDecay(src: DataFrame,
      delay: String = "1 hour"): Dataset[PositionCredit] = {
    val spark = src.sparkSession
    import spark.implicits._
    events(src, delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stepTimeDecay _)
  }

  private def events(src: DataFrame, delay: String): Dataset[AttrEvent] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.select($"user_id", $"ts", unix_micros($"ts").as("ts_us"),
        $"event_id", $"event_type",
        round($"value" * 100).cast("long").as("cents"))
      .withWatermark("ts", delay)
      .as[AttrEvent]
  }

  /** Drop touches no purchase with ts ≥ `wmUs` can credit LAST-touch:
    * everything older than wm − 7d, and all but the latest of the
    * touches STRICTLY before wm (every admissible purchase sees all of
    * those, so only the max by (t_us, t_id) can be its last-touch).
    * Touches AT the watermark survive uncollapsed — defense-in-depth
    * for a purchase at p_us == wmUs with an intermediate event_id,
    * whose window tie-breaks on t_id among boundary touches. (On this
    * Spark build such a purchase cannot actually arrive after wm
    * reaches it: EventTimeTimeout's late filter drops rows with event
    * time ≤ watermark — measured, spec-pinned — but the strict span is
    * the safe side of that version-dependent predicate.)
    * `touches` is ascending (t_us, t_id); the result stays ascending. */
  private[streaming] def prune(touches: List[TouchRec], wmUs: Long): List[TouchRec] = {
    val (before, atOrAfter) = touches.span(_.t_us < wmUs)
    val keep = before.lastOption.toList ::: atOrAfter
    keep.filter(_.t_us + SevenDaysUs >= wmUs)
  }

  /** The position model's prune: the 7-day horizon only — no
    * latest-collapse, because first/middle touches carry credit. */
  private[streaming] def pruneWindow(touches: List[TouchRec],
      wmUs: Long): List[TouchRec] =
    touches.filter(_.t_us + SevenDaysUs >= wmUs)

  private def insertTouch(touches: List[TouchRec], e: AttrEvent): List[TouchRec] = {
    val t = TouchRec(e.ts_us, e.event_id, e.event_type)
    val (lt, geq) = touches.span(x =>
      x.t_us < t.t_us || (x.t_us == t.t_us && x.t_id < t.t_id))
    lt ::: t :: geq
  }

  /** The window the batch rule consults for a purchase at (pUs, pId):
    * touches strictly before it in (ts, event_id) order, within 7
    * days. Ascending order preserved. */
  private def windowOf(touches: List[TouchRec], pUs: Long,
      pId: Long): List[TouchRec] =
    touches.filter(t => (t.t_us < pUs || (t.t_us == pUs && t.t_id < pId))
      && pUs - t.t_us <= SevenDaysUs)

  private def isTouch(e: AttrEvent): Boolean =
    e.event_type == "view" || e.event_type == "click"

  /** The U-shaped credit vector for a window of n ≥ 1 touches (index
    * order = (ts, event_id) ascending): 100% / 50-50 /
    * 40%-first, 40%-last, 20% split across middles (truncating —
    * the batch CASE verbatim). */
  private[streaming] def positionSplit(n: Int): IndexedSeq[Long] =
    if (n == 1) IndexedSeq(1000000L)
    else if (n == 2) IndexedSeq(500000L, 500000L)
    else (0 until n).map(i =>
      if (i == 0 || i == n - 1) 400000L else 200000L / (n - 2))

  /** The time-decay credit vector for touch ages (whole days, 0..6,
    * clamped): weight 2^(6−min(age,6)), credit = (10⁶·w) div Σw — the
    * batch expression verbatim. The clamp matters: the touch window is
    * INCLUSIVE (p_us − t_us ≤ 7d), so a boundary-aligned touch has
    * whole-day age 7 and an unclamped shift would be `1L << -1` =
    * Long.MIN_VALUE under Java's shift masking. */
  private[streaming] def timeDecaySplit(agesDays: Seq[Long]): Seq[Long] = {
    val weights = agesDays.map(a => 1L << (6 - math.min(a, 6L).toInt))
    val sw = weights.sum
    weights.map(w => 1000000L * w / sw)
  }

  // ---------------- emit-at-arrival (last-touch) ----------------

  private def stepAtArrival(user: Long, events: Iterator[AttrEvent],
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
          val ch = windowOf(touches, e.ts_us, e.event_id)
            .lastOption.map(_.t_type).getOrElse("direct")
          out += Attribution(user, e.event_id, e.ts_us, ch, e.cents)
        }
        if (isTouch(e)) touches = insertTouch(touches, e)
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      touches = prune(touches, wmUs)
      touches match {
        case Nil => if (state.exists) state.remove()
        case ts =>
          state.update(TouchState(ts, Nil))
          state.setTimeoutTimestamp(ts.last.t_us / 1000L + SevenDaysUs / 1000L)
      }
      out.result().iterator
    }
  }

  // ---------------- at-watermark machinery ----------------

  /** Shared at-watermark walk: absorb the batch, emit every pending
    * purchase the watermark has finalized via `credit`, prune touches
    * via `pruneFn`, persist, and schedule the next wake-up (the
    * earlier of next-ripe-purchase and touch-eviction). */
  private def stepWatermarked[T](user: Long, events: Iterator[AttrEvent],
      state: GroupState[TouchState],
      pruneFn: (List[TouchRec], Long) => List[TouchRec],
      credit: (Long, List[TouchRec], PendRec) => Seq[T]): Iterator[T] = {
    val prior = state.getOption.getOrElse(TouchState(Nil, Nil))
    var touches = prior.touches
    var pending = prior.pending
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      if (e.event_type == "purchase")
        pending = PendRec(e.ts_us, e.event_id, e.cents) :: pending
      if (isTouch(e)) touches = insertTouch(touches, e)
    }
    val wmMs = state.getCurrentWatermarkMs()
    val wmUs = wmMs * 1000L
    // STRICT ripen: a purchase at exactly the watermark is finalized
    // only once the watermark moves past it. Defense-in-depth: on THIS
    // Spark build, flatMapGroupsWithState under EventTimeTimeout drops
    // input rows with event time <= watermark (measured empirically —
    // AttributionWatermarkSpec pins it), so a same-microsecond touch
    // can in fact never arrive after the watermark reaches the
    // purchase; the strict comparison guards that version-dependent
    // late-filter predicate (a `<`-filtering build would deliver such
    // a touch) at the cost of one watermark advance of latency.
    val (ripe, hold) = pending.partition(_.p_us < wmUs)
    val out = ripe.sortBy(p => (p.p_us, p.p_id))
      .flatMap(p => credit(user, touches, p))
    touches = pruneFn(touches, wmUs)
    pending = hold
    if (touches.isEmpty && pending.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(TouchState(touches, pending))
      val evictMs = touches.lastOption
        .map(_.t_us / 1000L + SevenDaysUs / 1000L)
      val ripenMs = pending.map(_.p_us / 1000L).minOption
      // never schedule at-or-before the current watermark (held
      // boundary purchases truncate to exactly wmMs): wm+1 fires at
      // the very next watermark advance, which is when they ripen
      state.setTimeoutTimestamp(
        math.max((evictMs.toList ++ ripenMs.toList).min, wmMs + 1L))
    }
    out.iterator
  }

  private def stepAtWatermark(user: Long, events: Iterator[AttrEvent],
      state: GroupState[TouchState]): Iterator[Attribution] =
    stepWatermarked[Attribution](user, events, state, prune,
      (u, touches, p) => {
        val ch = windowOf(touches, p.p_us, p.p_id)
          .lastOption.map(_.t_type).getOrElse("direct")
        Seq(Attribution(u, p.p_id, p.p_us, ch, p.cents))
      })

  private def stepPosition(user: Long, events: Iterator[AttrEvent],
      state: GroupState[TouchState]): Iterator[PositionCredit] =
    stepWatermarked[PositionCredit](user, events, state, pruneWindow,
      (u, touches, p) => {
        val w = windowOf(touches, p.p_us, p.p_id)
        val n = w.length
        if (n == 0)
          Seq(PositionCredit(u, p.p_id, p.p_us, "direct", 1000000L, p.cents))
        else {
          val credits = positionSplit(n)
          w.zipWithIndex.map { case (t, i) =>
            PositionCredit(u, p.p_id, p.p_us, t.t_type, credits(i), p.cents)
          }
        }
      })

  private def stepTimeDecay(user: Long, events: Iterator[AttrEvent],
      state: GroupState[TouchState]): Iterator[PositionCredit] =
    stepWatermarked[PositionCredit](user, events, state, pruneWindow,
      (u, touches, p) => {
        val w = windowOf(touches, p.p_us, p.p_id)
        if (w.isEmpty)
          Seq(PositionCredit(u, p.p_id, p.p_us, "direct", 1000000L, p.cents))
        else {
          val credits = timeDecaySplit(w.map(t => (p.p_us - t.t_us) / 86400000000L))
          w.zip(credits).map { case (t, c) =>
            PositionCredit(u, p.p_id, p.p_us, t.t_type, c, p.cents)
          }
        }
      })
}
