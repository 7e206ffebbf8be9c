package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One parsed change entering the union-schema fold (the streaming form
  * of `cdc_schema_evolution`'s parse — build it with
  * [[graft.operators.CdcApply.evolutionChanges]]). `ts` keeps the
  * watermark tag; the fold clock is (ts_us, event_id). */
case class EvoChange(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                     ts_us: Long, op: String,
                     k: Option[Long], tag: Option[String], meta_src: Option[String])

/** Per-user state: one LWW REGISTER PER FIELD (value + the clock of the
  * change that set it) plus the overall last-op register and two
  * counters. Because every register merges by max-clock and the
  * counters are sums, the fold is a join-semilattice merge —
  * ORDER-INDEPENDENT across changes, so the streamed state equals the
  * batch fold under ANY cross-batch arrival order (the property
  * SchemaEvolutionStreamSpec pins on the real fixture). */
case class EvoState(n_changes: Long, n_with_tag: Long,
                    last_op: String, last_ts: Long, last_id: Long,
                    k: Option[Long], k_ts: Long, k_id: Long,
                    tag: Option[String], tag_ts: Long, tag_id: Long,
                    meta_src: Option[String], m_ts: Long, m_id: Long,
                    version: Long)

/** One emitted state row (Append-mode state-change log, the
  * [[OplogApply.currentState]] convention: the latest `version` per
  * user IS the current state; rows with `last_op = "d"` are tombstones
  * — filter them for the live view, exactly like the batch query's
  * `last_op <> 'd'`). */
case class EvoRow(user_id: Long, version: Long, n_changes: Long, n_with_tag: Long,
                  last_op: String, last_ts_us: Long,
                  k: Option[Long], tag: Option[String], meta_src: Option[String])

/** STREAMING SCHEMA-EVOLUTION APPLY — the online twin of
  * `cdc_schema_evolution` (operators/CdcApply.scala): fold a change
  * stream whose payload schema drifts mid-stream into current state
  * with the union schema, each field independently keeping the newest
  * change that CARRIED it (MongoDB partial-update semantics), absent
  * fields an explicit null backfill.
  *
  * Tombstone discipline = [[OplogApply.currentState]]: a user whose
  * newest op is a delete keeps a tombstoned state row (blocking stale
  * resurrection by older out-of-order changes) until the watermark
  * passes its clock, then is reaped — deleted-user state is bounded by
  * the lateness horizon while live users ARE the materialized table.
  *
  * Scale: one folded row per live user in the state store, partitioned
  * by user across executors; per-field clocks add 16 bytes per field —
  * the price of exact out-of-order convergence with no reorder buffer
  * at all. */
object SchemaEvolutionStream {

  private val Empty = EvoState(0L, 0L, "", Long.MinValue, Long.MinValue,
    None, Long.MinValue, Long.MinValue, None, Long.MinValue, Long.MinValue,
    None, Long.MinValue, Long.MinValue, 0L)

  /** pure per-change merge — unit-testable, order-independent. */
  private[streaming] def fold(st: EvoState, c: EvoChange): EvoState = {
    def newer(ts: Long, id: Long) =
      c.ts_us > ts || (c.ts_us == ts && c.event_id > id)
    var s = st.copy(n_changes = st.n_changes + 1,
      n_with_tag = st.n_with_tag + (if (c.tag.nonEmpty) 1L else 0L))
    if (newer(s.last_ts, s.last_id))
      s = s.copy(last_op = c.op, last_ts = c.ts_us, last_id = c.event_id)
    if (c.k.nonEmpty && newer(s.k_ts, s.k_id))
      s = s.copy(k = c.k, k_ts = c.ts_us, k_id = c.event_id)
    if (c.tag.nonEmpty && newer(s.tag_ts, s.tag_id))
      s = s.copy(tag = c.tag, tag_ts = c.ts_us, tag_id = c.event_id)
    if (c.meta_src.nonEmpty && newer(s.m_ts, s.m_id))
      s = s.copy(meta_src = c.meta_src, m_ts = c.ts_us, m_id = c.event_id)
    s
  }

  /** Streaming form: requires a watermark on `ts` upstream (re-declared
    * by callers chaining after another stateful operator, the
    * [[OplogApply.currentState]] note). Append output so the operator
    * chains after the quorum dedup in one query. */
  def apply(changes: Dataset[EvoChange]): Dataset[EvoRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState[EvoState, EvoRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[EvoChange], state: GroupState[EvoState]) =>
          if (state.hasTimedOut) {      // watermark passed a tombstone: reap
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(Empty)
            it.foreach(c => s = fold(s, c))
            s = s.copy(version = s.version + 1L)
            state.update(s)
            if (s.last_op == "d")
              state.setTimeoutTimestamp(
                math.max(s.last_ts / 1000L + 1, state.getCurrentWatermarkMs() + 1))
            Iterator.single(EvoRow(user, s.version, s.n_changes, s.n_with_tag,
              s.last_op, s.last_ts, s.k, s.tag, s.meta_src))
          }
      }
  }
}
