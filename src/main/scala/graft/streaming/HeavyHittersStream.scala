package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One arriving event, reduced to the hot-key inputs. */
case class HhEvent(event_type: String, user_id: Long)

/** One maintained counter: `n` is the space-saving estimate (true
  * count ≤ n ≤ true count + err), `err` the overestimate bound
  * inherited from the evicted minimum at insertion time. */
case class HhCounter(user_id: Long, n: Long, err: Long)

/** Per-event-type state: monotone emission version, exact stream
  * length, and at most CAPACITY counters. */
case class HhState(version: Long, total: Long, counters: List[HhCounter])

/** One emitted hot-key row (Update mode: consumers keep the highest
  * `version` per event_type). */
case class HhReport(event_type: String, version: Long, user_id: Long,
                    n: Long, err: Long, n_type: Long)

/** STREAMING HEAVY HITTERS: the hot-key monitor of
  * `events_heavy_hitters` (operators/Pipeline.scala) kept current as
  * events arrive, with BOUNDED state — the Metwally et al.
  * SPACE-SAVING sketch per event type: at most `capacity` counters;
  * an unseen key arriving at a full sketch evicts the minimum counter
  * and inherits its count as the overestimate bound (`err`). The
  * sketch guarantee is one-sided exactly the way a monitor wants it:
  * any key whose TRUE frequency is ≥ total/capacity is guaranteed
  * present, and reported `n` never undercounts — no hot key is ever
  * missed; `err` quantifies the possible overcount per key. Each
  * micro-batch emits the keys at or above the support threshold
  * (n·phiInv ≥ total) with a monotone `version`, Update-mode style.
  *
  * Exactness seam (spec-pinned): with capacity ≥ distinct keys no
  * eviction ever fires, err = 0, and the emitted list equals the
  * exact batch rule at the same support — the sketch IS the exact
  * counter map until memory pressure exists.
  *
  * Scale shape: ONE keyed exchange on event_type into the stateful
  * operator; state per type is `capacity` fixed-width counters
  * REGARDLESS of user cardinality — the whole point at 10⁹ users. The
  * fold is O(1) per already-tracked arrival; each unseen-key arrival
  * at a FULL sketch pays an O(capacity) min scan (the textbook
  * min-heap form makes that O(log capacity) — at the default
  * capacity 64 the flat scan is cheaper than the heap's constant
  * factors, and the dial to revisit if capacity grows to 10⁵+).
  * Event types are few; if one type's arrival rate dwarfs the rest,
  * pre-aggregating the batch map-side (groupBy count before the
  * stateful op) cuts the shuffle to distinct-keys-per-batch rows. */
object HeavyHittersStream {

  def hitters(src: DataFrame, capacity: Int = 64,
      phiInv: Long = 32L): Dataset[HhReport] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.select($"event_type", $"user_id").as[HhEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (et: String, evs: Iterator[HhEvent], state: GroupState[HhState]) =>
          val prior = state.getOption.getOrElse(HhState(0L, 0L, Nil))
          val next = fold(prior, evs.map(_.user_id), capacity)
          state.update(next)
          next.counters
            .filter(c => c.n * phiInv >= next.total)
            .sortBy(c => (-c.n, c.user_id))
            .map(c => HhReport(et, next.version, c.user_id, c.n, c.err, next.total))
            .iterator
      }
  }

  /** One space-saving pass: exact-increment known keys, insert new
    * keys while below capacity, otherwise evict the minimum counter —
    * deterministic tie-break on (n, user_id) — and inherit its count.
    * Counters come back sorted by user_id (stable state encoding). */
  private[streaming] def fold(st: HhState, ids: Iterator[Long],
      capacity: Int): HhState = {
    val m = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    st.counters.foreach(c => m(c.user_id) = (c.n, c.err))
    var total = st.total
    ids.foreach { id =>
      total += 1L
      m.get(id) match {
        case Some((n, err)) => m(id) = (n + 1L, err)
        case None if m.size < capacity => m(id) = (1L, 0L)
        case None =>
          val (evictId, (minN, _)) =
            m.minBy { case (k, (n, _)) => (n, k) }
          m.remove(evictId)
          m(id) = (minN + 1L, minN)
      }
    }
    HhState(st.version + 1L, total,
      m.toList.map { case (k, (n, e)) => HhCounter(k, n, e) }.sortBy(_.user_id))
  }
}
