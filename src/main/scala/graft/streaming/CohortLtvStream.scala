package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** one emitted LTV-curve point (Update-mode style: consumers keep the
  * highest `version` per (cohort_day, age) — every micro-batch that
  * touches a cohort re-emits its whole curve with the running
  * cumulative refreshed, so the latest version IS the curve). */
case class CohortLtvRow(cohort_day: Long, age: Long, version: Long,
                        n_users: Long, n_events: Long, rev_cents: Long,
                        cum_rev_cents: Long, ltv_micro_cents: Long)

/** STREAMING COHORT-LTV — `events_cohort_ltv` (operators/Quality.scala
  * `eventsCohortLtv`) kept live as revenue events arrive: cohort
  * assignment comes from a BROADCAST first-signup table (computed once
  * in batch from the snapshot, the [[TokenBudgetStream]] static-side
  * pattern), and each cohort's per-age (events, revenue) tallies
  * accumulate in keyed state, the cumulative curve re-derived at every
  * emission — so a growth dashboard reads today's LTV curves without
  * re-scanning the event log.
  *
  * Order-independence: state is a per-age MAP of commutative sums, and
  * the cumulative is recomputed from the map at emission — so the
  * final curve equals the batch operator's under ANY arrival order or
  * batch split (the spec drives a shuffled split), and a restart
  * resumes mid-curve from the checkpointed tallies.
  *
  * Scale shape: the cohort table is one row per user — at true scale
  * that outgrows a broadcast and becomes a pre-bucketed join on
  * user_id (the `dedup_labels` bucketed-table discipline); everything
  * downstream is keyed by cohort_day, whose state is bounded by the
  * DAY SPAN (ages per cohort), not by users or events — the same
  * collapse the batch operator documents. One keyed exchange, no other
  * shuffle. */
object CohortLtvStream {

  /** per-cohort state: age → (n_events, rev_cents), plus the cohort
    * size and an emission version. */
  case class LtvState(nUsers: Long, ages: Map[Long, (Long, Long)], version: Long)

  /** The static side: (user_id, cohort_day, n_users) from the
    * snapshot — the batch operator's own cohort derivation with the
    * cohort size joined on, one broadcastable frame. */
  def cohortTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.load(spark, dir, "events")
      .select($"user_id", expr("unix_micros(ts) div 86400000000L").as("d"),
        $"event_type")
    val cohort = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"d").as("cohort_day"))
    val sizes = cohort.groupBy($"cohort_day").agg(count(lit(1)).as("n_users"))
    cohort.join(broadcast(sizes), "cohort_day")
      .select($"user_id", $"cohort_day", $"n_users")
  }

  /** `events`: a streaming (or batch) `events`-shaped frame
    * (user_id, ts, value — event_type rides along unfiltered, exactly
    * as the batch op counts every post-signup event). */
  def track(events: DataFrame, cohort: DataFrame): Dataset[CohortLtvRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000L").as("d"),
        round(col("value") * 100).cast("long").as("c"))
      .join(broadcast(cohort), "user_id")
      .select(col("cohort_day"), (col("d") - col("cohort_day")).as("age"),
        col("c"), col("n_users"))
      .filter(col("age") >= 0L)
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        trackCohort _)
  }

  private def trackCohort(cohortDay: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      state: GroupState[LtvState]): Iterator[CohortLtvRow] = {
    val prior = state.getOption.getOrElse(LtvState(0L, Map.empty, 0L))
    var nUsers = prior.nUsers
    val ages = scala.collection.mutable.Map.from(prior.ages)
    rows.foreach { case (_, age, c, nu) =>
      nUsers = nu
      val (ne, rev) = ages.getOrElse(age, (0L, 0L))
      ages(age) = (ne + 1L, rev + c)
    }
    val next = LtvState(nUsers, ages.toMap, prior.version + 1L)
    state.update(next)
    // re-derive the whole cumulative curve from the tallies: emission
    // is a pure function of state, hence arrival-order-independent
    var cum = 0L
    ages.toSeq.sortBy(_._1).map { case (age, (ne, rev)) =>
      cum += rev
      CohortLtvRow(cohortDay, age, next.version, nUsers, ne, rev, cum,
        cum * 1000000L / nUsers)
    }.iterator
  }
}
