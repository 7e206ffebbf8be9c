package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One arriving event, reduced to the three RFM inputs. */
case class RfmEvent(user_id: Long, ts_us: Long, cents: Long)

/** The maintained per-user behavioral profile — the running form of
  * `events_rfm`'s metric block (binning happens at read time against
  * the population, not per event). */
case class RfmProfile(user_id: Long, last_us: Long, frequency: Long,
                      monetary_cents: Long)

/** STREAMING RFM profile maintenance: the per-user
  * (recency, frequency, monetary) state of `events_rfm`
  * (Pipeline.scala `eventsRfm`) kept CURRENT as events arrive —
  * `flatMapGroupsWithState` in Update mode, state = one 3-field record
  * per user, emitting the refreshed profile whenever a user has
  * traffic in a micro-batch. The batch operator's NTILE binning stays
  * a read-time concern (terciles are population-relative; binning
  * per-arrival would freeze stale cuts) — the stream maintains the
  * exact integer metrics the binning consumes, and the spec pins the
  * maintained state bit-equal to the batch aggregation of the same
  * events.
  *
  * Scale shape: one keyed exchange into the stateful operator; state
  * is 24 bytes per ACTIVE user. Dormant users are the state-size
  * dial: at production scale a processing-time timeout evicts
  * profiles idle past the retention horizon (they reload from the
  * batch store on next sight — the lambda-architecture handoff). */
object RfmStream {

  def profiles(src: DataFrame): Dataset[RfmProfile] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.select($"user_id", unix_micros($"ts").as("ts_us"),
        round($"value" * 100).cast("long").as("cents"))
      .as[RfmEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateProfile _)
  }

  private def updateProfile(user: Long, events: Iterator[RfmEvent],
      state: GroupState[RfmProfile]): Iterator[RfmProfile] = {
    var p = state.getOption.getOrElse(RfmProfile(user, Long.MinValue, 0L, 0L))
    events.foreach { e =>
      p = RfmProfile(user, math.max(p.last_us, e.ts_us),
        p.frequency + 1L, p.monetary_cents + e.cents)
    }
    state.update(p)
    Iterator.single(p)
  }
}
