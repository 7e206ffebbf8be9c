package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.OplogEntry

/** The reference's one stateful operator, re-expressed on Spark's keyed
  * state: replica-quorum deduplication
  * (`reference:src/main/java/org/flinkmon/source/MongoDBOplogSource.java:116-128`).
  *
  * Semantics: each oplog op (key `h`) arrives once per replica-set
  * member; the op is *durable* once observed on ≥ `depth` members, and
  * must be emitted exactly once, at that moment.
  *
  * Two deliberate fixes over the reference (SURVEY.md §2.2, §7.4):
  *  - the reference keeps its counter map forever → keys from a dead
  *    replica (never reaching quorum) LEAK. Here state carries an
  *    event-time timeout: when the watermark passes an op's time the
  *    state is reaped.
  *  - the reference's counter is in-memory only → replayed ops after a
  *    crash re-emit (at-least-once). Here state lives in the state
  *    store, checkpointed with the offsets → exactly-once emission.
  *
  * REPLICA-SET RECONFIGURATION (round-11): the reference captures the
  * member count once at discovery (`MongoOplogTailMapper.java:64`) — if
  * a member then LEAVES, every op stuck one copy short of the old
  * quorum deadlocks forever. Here depth is swapped at restart (the same
  * moment a real deployment must restart anyway: the oplog connector
  * plans one InputPartition per member, so a membership change re-plans
  * the source), and the state machine RE-CHECKS quorum against the
  * current depth at timeout time:
  *  - depth DROP (N → N−1): a key buffered at `seen = N−1` under the
  *    old depth holds its first-arrived copy in state; on the first
  *    post-restart watermark advance its event-time timeout fires and
  *    the re-check `seen ≥ depth` now passes → the op emits (exactly
  *    once, from the retained copy). No stuck keys, no lost ops.
  *  - depth INCREASE (N → N+1): already-emitted ops STAY emitted (the
  *    `emitted` flag persists in the checkpointed state — quorum is a
  *    durability gate, not a retraction mechanism); not-yet-quorate
  *    keys simply need the deeper quorum before firing.
  *
  * Scale: state is partitioned by `h` across executors (HDFSBackedStateStore /
  * RocksDB at cluster scale); per-key state is 12 bytes once emitted,
  * plus the retained first copy (one op) only while a key is BELOW
  * quorum — and the watermark bounds total state to the ops within the
  * lateness horizon either way.
  */
object QuorumDedup {

  /** per-key state: how many replicas reported, whether already
    * emitted, and — while NOT yet emitted — the first-arrived copy, so
    * a timeout-time quorum re-check (depth lowered at restart) has a
    * payload to emit. Dropped to None at emission: quorate keys cost
    * 12 bytes again. */
  final case class QuorumState(seen: Int, emitted: Boolean,
      pending: Option[OplogEntry] = None)

  /** pure per-event transition — unit-testable without a stream.
    * Returns (newState, emitNow). */
  private[streaming] def step(st: QuorumState, depth: Int): (QuorumState, Boolean) = {
    val seen = st.seen + 1
    val fire = !st.emitted && seen >= depth
    (st.copy(seen = seen, emitted = st.emitted || fire), fire)
  }

  /** pure timeout-time decision (the reconfiguration re-check): the
    * retained first copy to emit, if the CURRENT depth — possibly
    * lower than the one the copies arrived under — is now satisfied
    * and nothing fired before. QuorumPropertySpec composes this with
    * [[step]] to prove exactly-once across random depth swaps. */
  private[streaming] def timeoutFire(st: QuorumState, depth: Int): Option[OplogEntry] =
    if (!st.emitted && st.seen >= depth) st.pending else None

  private def quorumFn(depth: Int)(
      h: Long,
      events: Iterator[OplogEntry],
      state: GroupState[QuorumState]): Iterator[OplogEntry] = {
    if (state.hasTimedOut) {            // watermark passed: reap (leak fix)
      // reconfiguration recovery: with an unchanged depth a timed-out
      // key is always sub-quorum (a quorate key fired on arrival), but
      // after a restart that LOWERED depth the re-check passes for keys
      // the old deeper quorum left stuck — emit their retained first
      // copy now, exactly once, then reap. Emission happens at the
      // first watermark advance past the op's event time, so recovery
      // latency is bounded by the lateness horizon.
      val st = state.getOption.getOrElse(QuorumState(0, emitted = false))
      val out = timeoutFire(st, depth).iterator
      state.remove()
      out
    } else {
      var st = state.getOption.getOrElse(QuorumState(0, emitted = false))
      val out = scala.collection.mutable.ArrayBuffer.empty[OplogEntry]
      var firstTs: Option[java.sql.Timestamp] = None
      events.foreach { e =>
        if (firstTs.isEmpty) firstTs = Some(e.ts)
        if (!st.emitted && st.pending.isEmpty) st = st.copy(pending = Some(e))
        val (next, fire) = step(st, depth)
        st = next
        if (fire) out += e
      }
      if (st.emitted && st.pending.nonEmpty) st = st.copy(pending = None)
      state.update(st)
      // keep state until the watermark passes the op's event time, so
      // late replica copies of an already-emitted op are absorbed (not
      // re-counted into a fresh key) and never-quorate keys get reaped.
      // Clamped above the current watermark: a straggler copy arriving
      // with event time at/below the watermark would otherwise make
      // setTimeoutTimestamp throw ("timeout cannot be earlier than
      // watermark") and kill the whole query.
      firstTs.foreach(ts => state.setTimeoutTimestamp(
        math.max(ts.getTime + 1, state.getCurrentWatermarkMs() + 1)))
      out.iterator
    }
  }

  /** Streaming form: requires a watermark on `ts` upstream. */
  def apply(ds: Dataset[OplogEntry], depth: Int)(implicit spark: SparkSession): Dataset[OplogEntry] = {
    import spark.implicits._
    ds.groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(quorumFn(depth))
  }

  /** Batch form over a bounded Dataset (same emission rule: the first
    * record of each key reaching quorum) — used by tests and the
    * bounded analog query. */
  def batch(ds: Dataset[OplogEntry], depth: Int)(implicit spark: SparkSession): Dataset[OplogEntry] = {
    import spark.implicits._
    ds.groupByKey(_.h)
      .flatMapGroups { (_, it) =>
        val buf = it.toSeq.sortBy(e => (e.ts.getTime, e.tsInc, e.sourceHost))
        if (buf.size >= depth) Iterator.single(buf.head) else Iterator.empty
      }
  }
}
