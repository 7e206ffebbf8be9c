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
  * Scale: state is partitioned by `h` across executors (HDFSBackedStateStore /
  * RocksDB at cluster scale); per-key state is 12 bytes, and the
  * watermark bounds total state to the ops within the lateness horizon.
  */
object QuorumDedup {

  /** per-key state: how many replicas reported, whether already emitted. */
  final case class QuorumState(seen: Int, emitted: Boolean)

  /** pure per-event transition — unit-testable without a stream.
    * Returns (newState, emitNow). */
  private[streaming] def step(st: QuorumState, depth: Int): (QuorumState, Boolean) = {
    val seen = st.seen + 1
    val fire = !st.emitted && seen >= depth
    (QuorumState(seen, st.emitted || fire), fire)
  }

  private def quorumFn(depth: Int)(
      h: Long,
      events: Iterator[OplogEntry],
      state: GroupState[QuorumState]): Iterator[OplogEntry] = {
    if (state.hasTimedOut) {            // watermark passed: reap (leak fix)
      state.remove()
      Iterator.empty
    } else {
      var st = state.getOption.getOrElse(QuorumState(0, emitted = false))
      val out = scala.collection.mutable.ArrayBuffer.empty[OplogEntry]
      var firstTs: Option[java.sql.Timestamp] = None
      events.foreach { e =>
        if (firstTs.isEmpty) firstTs = Some(e.ts)
        val (next, fire) = step(st, depth)
        st = next
        if (fire) out += e
      }
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
