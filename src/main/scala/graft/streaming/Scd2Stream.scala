package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

/** Streaming SCD2 assembly — the incremental form of
  * [[graft.operators.CdcBatch.scd2]]: as change events stream in, each
  * superseded version is emitted as a CLOSED validity interval
  * [valid_from, valid_to) the moment its successor arrives; the current
  * (open) version per subject lives in operator state and is never
  * re-emitted, so the output is append-only and exactly the closed
  * subset of the batch SCD2 table (Scd2StreamSpec proves set equality
  * on the fixture).
  *
  * Ordering contract: per-subject arrival must be event-time-ordered
  * ACROSS micro-batches (within a batch the group fold sorts), which is
  * the CDC source's own guarantee — the oplog is ts-ordered per shard
  * and file admission preserves order. A cross-batch regression would
  * mis-splice intervals; the batch form (one global sort) is the
  * backfill/repair path, same division of labor as apply-state vs
  * [[graft.operators.CdcApply]].
  *
  * State is ONE open version per subject (the minimum any SCD2
  * assembler can hold); NoTimeout because an open version is live
  * state, not garbage — subjects that stop changing keep exactly one
  * row, the same bound as the materialized dimension itself. */
object Scd2Stream {

  final case class EventIn(event_id: Long, user_id: Long, event_type: String, ts_us: Long)
  final case class Scd2Closed(
      user_id: Long, event_id: Long, event_type: String,
      valid_from_us: Long, valid_to_us: Long)
  final case class OpenVersion(event_id: Long, event_type: String, ts_us: Long)

  def closedIntervals(ds: Dataset[EventIn])(implicit s: SparkSession): Dataset[Scd2Closed] = {
    import s.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenVersion, Scd2Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventIn], state: GroupState[OpenVersion]) =>
          val sorted = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var cur = state.getOption
          val out = Array.newBuilder[Scd2Closed]
          sorted.foreach { e =>
            cur.foreach { p =>
              out += Scd2Closed(uid, p.event_id, p.event_type, p.ts_us, e.ts_us)
            }
            cur = Some(OpenVersion(e.event_id, e.event_type, e.ts_us))
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
