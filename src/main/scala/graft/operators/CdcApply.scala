package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** CDC apply/materialize: fold an insert/update/delete change stream
  * into CURRENT STATE — the natural consumer of the quorum-deduped
  * oplog and the first thing a real user does with a CDC engine. The
  * reference ships the changes to Elasticsearch and stops
  * (`reference:src/main/java/org/flinkmon/sink/ElasticsearchEmbeddedNodeSink.java:54-66`);
  * this operator completes the story: last-writer-wins per key under
  * the total order (ts, seq), a key whose final op is a delete is
  * absent from the state.
  *
  * Scale shape: the batch form is one shuffle on the key with a
  * window-rank (or argmax) — no driver-side state; the streaming form
  * keeps ONE small record per live key in the state store, partitioned
  * by key across executors, exactly like [[graft.streaming.QuorumDedup]].
  */
object CdcApply {

  /** op classification over the events fixture: signups open a doc,
    * errors tombstone it, everything else updates it. */
  private def opCol = when(col("event_type") === "signup", "i")
    .when(col("event_type") === "error", "d")
    .otherwise("u")

  /** Batch form: materialize current state from the full change log.
    * Last-writer-wins by (ts, event_id) per user; deleted keys absent. */
  val applyState: Q = Q(
    "cdc_apply_state",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.load(s, dir, "events")
        .withColumn("op", opCol)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1 && $"op" =!= "d")
        .select($"user_id", $"event_id".as("last_event_id"), $"op".as("last_op"),
          unix_micros($"ts").as("ts_us"), $"value".as("last_value"))
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, event_id AS last_event_id, op AS last_op,
             ts_us, value AS last_value
      FROM (
        SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
               CASE WHEN event_type = 'signup' THEN 'i'
                    WHEN event_type = 'error' THEN 'd'
                    ELSE 'u' END AS op,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events
      )
      WHERE rn = 1 AND op <> 'd'
      ORDER BY user_id
    """)
  )

  /** Point-in-time recovery ("time travel"): materialize the state the
    * table had AS OF a pinned instant T by replaying only changes with
    * ts ≤ T — the inverse of the reference's resume-offset tailing
    * (O4 replays FROM an offset forward; this replays UP TO one). T is
    * pinned content-addressed at min+60% of the log's time span in
    * exact integer microseconds, so both engines derive the identical
    * cut with no float interpolation.
    *
    * Scale shape: the cutoff is ONE map-side-combined scalar aggregate
    * broadcast back over the log; the `ts_us <= asof_us` filter prunes
    * BEFORE the key shuffle (at a real 100 TB log the predicate lands
    * on the scan of a time-partitioned log and skips whole partitions),
    * and the LWW fold is the same single key-shuffle window as
    * `cdc_apply_state`. */
  val timeTravel: Q = Q(
    "cdc_time_travel",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events").withColumn("ts_us", unix_micros($"ts"))
      val cut = ev.agg(min($"ts_us").as("mn"), max($"ts_us").as("mx"))
        .selectExpr("mn + ((mx - mn) * 3) div 5 AS asof_us")
      val w = Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)
      ev.crossJoin(broadcast(cut))
        .filter($"ts_us" <= $"asof_us")
        .withColumn("op", opCol)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1 && $"op" =!= "d")
        .select($"user_id", $"event_id".as("last_event_id"), $"op".as("last_op"),
          $"ts_us", $"value".as("last_value"), $"asof_us")
        .orderBy($"user_id")
    },
    Some("""
      WITH cut AS (
        SELECT MIN(epoch_us(ts)) + ((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) * 3) // 5 AS asof_us
        FROM events
      )
      SELECT user_id, event_id AS last_event_id, op AS last_op,
             ts_us, value AS last_value, asof_us
      FROM (
        SELECT user_id, event_id, value, epoch_us(ts) AS ts_us, asof_us,
               CASE WHEN event_type = 'signup' THEN 'i'
                    WHEN event_type = 'error' THEN 'd'
                    ELSE 'u' END AS op,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events, cut
        WHERE epoch_us(ts) <= asof_us
      )
      WHERE rn = 1 AND op <> 'd'
      ORDER BY user_id
    """)
  )

  def queries: Seq[Q] = Seq(applyState, timeTravel)

  /** one live-state record per key. */
  final case class KeyState(
      user_id: Long, last_event_id: Long, last_op: String,
      ts_us: Long, last_value: Double)

  /** one change record (public: Spark encoders need reflective access).
    * `ts` stays a Timestamp so the caller's watermark tag survives the
    * typed projection into the stateful operator (EventTimeTimeout
    * requires a watermarked event-time column on its input). */
  final case class Change(
      user_id: Long, event_id: Long, op: String, ts: java.sql.Timestamp, value: Double)

  /** pure LWW transition — unit-testable without a stream. A delete
    * becomes a TOMBSTONE state (op "d") rather than clearing the slot:
    * the tombstone keeps its clock, so an out-of-order OLDER change
    * arriving after the delete cannot resurrect the key. */
  private[operators] def lww(cur: Option[KeyState], c: Change): Option[KeyState] = {
    val tsUs = graft.model.OplogEntry.timestampMicros(c.ts)
    val newer = cur.forall(s =>
      tsUs > s.ts_us || (tsUs == s.ts_us && c.event_id > s.last_event_id))
    if (!newer) cur
    else Some(KeyState(c.user_id, c.event_id, c.op, tsUs,
      if (c.op == "d") 0.0 else c.value))
  }

  /** Streaming form: continuously-maintained current state in the
    * state store (Update output: one row per key per change batch).
    * Tombstoned keys emit their op "d" state — filter for the live
    * view; the tombstone stays in state to block stale resurrection
    * and is REAPED once the watermark passes its clock (live keys
    * never time out — they are the materialized state). Requires a
    * watermark on `ts` upstream. */
  def applyStateStream(events: DataFrame)(implicit spark: SparkSession): Dataset[KeyState] = {
    import spark.implicits._
    events
      .withColumn("op", opCol)
      .select($"user_id", $"event_id", $"op", $"ts", $"value")
      .as[Change]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyState, KeyState](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Change], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {      // watermark passed a tombstone: reap
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption
            it.foreach(c => cur = lww(cur, c))
            val s = cur.get            // at least one change seen for the key
            state.update(s)
            if (s.last_op == "d") {
              state.setTimeoutTimestamp(
                math.max(s.ts_us / 1000L + 1, state.getCurrentWatermarkMs() + 1))
            }
            Iterator.single(s)
          }
      }
  }
}
