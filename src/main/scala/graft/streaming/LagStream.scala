package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.OplogEntry

/** One emitted replica-lag row (Update-mode style: consumers keep the
  * highest `version` per host). `lag_us` is the member's distance
  * behind the set's newest op; the quorum FRONTIER is the laggiest
  * member — the one actually holding a depth-majority quorum back
  * (`cdc_lag`'s rule, live). */
case class LagReport(host: String, version: Long, n_ops: Long,
                     last_ts_us: Long, lag_us: Long,
                     is_quorum_frontier: Boolean)

/** STREAMING REPLICA-LAG MONITOR — the live form of `cdc_lag`
  * (operators/CdcBatch.scala), watching the reference's blind spot as
  * ops ARRIVE: the reference tails N member cursors
  * (`MongoOplogTailMapper.java:75-78`) with zero observability into
  * which cursor is behind, which is exactly the signal its quorum gate
  * (and ours) stalls on. Per micro-batch, each member's op count and
  * newest op time update and every member's lag re-evaluates against
  * the set's newest — a member going quiet shows its lag GROWING and
  * inherits the frontier flag while the ingest is still running.
  *
  * Scale shape: arriving ops pre-reduce PER PARTITION to ≤ |members|
  * tiny rows (count + max — both semilattice merges, so arrival order
  * and partitioning never change the result); one monitor group holds
  * |members| (count, maxTs) pairs — replica-set-sized state by
  * construction, the same honest single-group design as
  * [[IvfBalanceStream]]. Chainable beside the quorum dedup on the
  * same source. */
object LagStream {

  /** whole-monitor state: per-member op count + newest op time (µs). */
  case class LagState(members: Map[String, (Long, Long)], version: Long)

  /** pure state merge — count-sum + max-ts per member. A commutative
    * monoid fold, so partitioning, batch boundaries, and arrival order
    * can never change the report (LagPropertySpec proves it). */
  private[streaming] def merge(members: Map[String, (Long, Long)],
      incs: Iterable[(String, Long, Long)]): Map[String, (Long, Long)] =
    incs.foldLeft(members) { case (m, (h, n, mx)) =>
      val (pn, pmx) = m.getOrElse(h, (0L, Long.MinValue))
      m.updated(h, (pn + n, math.max(pmx, mx)))
    }

  def monitor(ops: Dataset[OplogEntry]): Dataset[LagReport] = {
    val spark = ops.sparkSession
    import spark.implicits._
    ops
      .mapPartitions { it =>
        val m = scala.collection.mutable.Map.empty[String, (Long, Long)]
        it.foreach { e =>
          val us = OplogEntry.timestampMicros(e.ts)
          val (n, mx) = m.getOrElse(e.sourceHost, (0L, Long.MinValue))
          m(e.sourceHost) = (n + 1L, math.max(mx, us))
        }
        m.iterator.map { case (h, (n, mx)) => (h, n, mx) }
      }
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Int, incs: Iterator[(String, Long, Long)],
            state: GroupState[LagState]) =>
          val prior = state.getOption.getOrElse(LagState(Map.empty, 0L))
          val members = merge(prior.members, incs.toSeq)
          val next = LagState(members, prior.version + 1L)
          state.update(next)
          val newest = members.values.map(_._2).max
          val frontier = members.values.map(_._2).min
          members.toSeq.sortBy(_._1).iterator.map { case (h, (n, mx)) =>
            LagReport(h, next.version, n, mx, newest - mx, mx == frontier)
          }
      }
  }
}
