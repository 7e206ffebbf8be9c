package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One arriving document, reduced to its stratum. */
case class DriftDoc(source: String, lang: String)

/** Per-stratum state: exact running arrival count + emission version. */
case class DriftCount(c2: Long, version: Long)

/** One emitted drift row (Update-mode style: consumers keep the
  * highest `version` per stratum). `drift_ppm` is None for strata
  * absent from the baseline ('new'). */
case class DriftReport(source: String, lang: String, version: Long,
                       c1: Long, c2: Long, drift_ppm: Option[Long], status: String)

/** STREAMING VOLUME-DRIFT MONITOR: `dq_volume_drift`
  * (operators/Quality.scala) kept current as the v2 snapshot ARRIVES —
  * per-(source, lang) running counts against a broadcast v1 baseline,
  * re-evaluating the ±10% ppm rule at every micro-batch, so a crawler
  * auth failure or a dropped partition fires MID-INGEST instead of at
  * the end-of-refresh batch audit.
  *
  * The baseline is collected once at stream construction: strata are
  * (sources × languages)-bounded — dimension-table-sized by nature —
  * which is exactly why the batch operator's join side broadcasts too.
  * State per stratum is 16 bytes.
  *
  * The 'gone' status (baseline stratum with NO arrivals) is
  * structurally invisible to [[monitor]]'s traffic-driven emission — a
  * stratum with no traffic never invokes its group. [[monitorWithDeadline]]
  * closes that gap (round-10 verdict item 5): every baseline stratum
  * is REGISTERED in state at the first micro-batch via
  * `flatMapGroupsWithState`'s initial-state seed (Spark invokes the
  * function once for each seeded key even with no data — verified on
  * this build) and armed with an event-time timeout at the expected
  * refresh horizon, so a silently-dead source fires 'gone' MID-INGEST,
  * driven by the OTHER strata's traffic advancing the watermark — no
  * end-of-refresh audit needed to notice. */
object VolumeDriftStream {

  def monitor(src: DataFrame, baseline: DataFrame): Dataset[DriftReport] = {
    val spark = src.sparkSession
    import spark.implicits._
    val base: Map[(String, String), Long] = baseline
      .select($"source", $"lang", $"c1".cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    src.select($"source", $"lang").as[DriftDoc]
      .groupByKey(d => (d.source, d.lang))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (String, String), docs: Iterator[DriftDoc],
            state: GroupState[DriftCount]) =>
          val prior = state.getOption.getOrElse(DriftCount(0L, 0L))
          val next = DriftCount(prior.c2 + docs.size.toLong, prior.version + 1L)
          state.update(next)
          val c1 = base.get(key)
          // the batch rule verbatim (dq_volume_drift): ppm vs baseline,
          // 'new' when the baseline has no such stratum
          val (drift, status) = c1 match {
            case None => (None, "new")
            case Some(b) =>
              val ppm = (next.c2 - b) * 1000000L / b
              (Some(ppm), if (math.abs(ppm) > 100000L) "drift" else "ok")
          }
          Iterator.single(DriftReport(key._1, key._2, next.version,
            c1.getOrElse(0L), next.c2, drift, status))
      }
  }

  /** One arriving document with its event time, for the deadline form. */
  case class DriftDocT(source: String, lang: String, ts: java.sql.Timestamp)

  /** [[monitor]] plus MID-INGEST 'gone' detection. `src` must carry
    * (source, lang, ts) with a watermark already applied on `ts`.
    *
    * Mechanics: the baseline strata seed the state store at stream
    * start (initial-state registration — zero-count, version 0, no
    * emission); every registration or arrival arms an event-time
    * timeout at `max(watermark, startMs, batch's max event time) +
    * horizonMs` (the batch max matters: a stratum whose fresh arrivals
    * OUTRUN the watermark must not fire on its own progress). When the
    * watermark — advanced by the other strata's traffic — passes a
    * stratum's deadline with no new arrivals, it emits one `status =
    * 'gone'` report (version bumped, counts and drift_ppm as of the
    * silence) and DISARMS until traffic resumes: one report per
    * silence, a recovery emits the next ordinary report at a higher
    * version. Only baseline strata carry deadlines ('new' strata are
    * the audit's business, as in the batch gate).
    *
    * Scale: state stays one 16-byte row per stratum (strata are
    * dimension-sized); the seed is a broadcast-scale local Dataset. */
  def monitorWithDeadline(src: DataFrame, baseline: DataFrame,
      startMs: Long, horizonMs: Long): Dataset[DriftReport] = {
    val spark = src.sparkSession
    import spark.implicits._
    val base: Map[(String, String), Long] = baseline
      .select($"source", $"lang", $"c1".cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val init = base.keys.toSeq.toDS()
      .groupByKey(identity)
      .mapValues(_ => DriftCount(0L, 0L))
    src.select($"source", $"lang", $"ts").as[DriftDocT]
      .groupByKey(d => (d.source, d.lang))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout, init) {
        (key: (String, String), docs: Iterator[DriftDocT],
            state: GroupState[DriftCount]) =>
          val c1 = base.get(key)
          if (state.hasTimedOut) {
            val st = state.getOption.getOrElse(DriftCount(0L, 0L))
            val next = DriftCount(st.c2, st.version + 1L)
            state.update(next)      // keep counts; re-arm only on traffic
            Iterator.single(DriftReport(key._1, key._2, next.version,
              c1.getOrElse(0L), next.c2,
              c1.map(b => (next.c2 - b) * 1000000L / b), "gone"))
          } else {
            var n = 0L
            var maxTsMs = Long.MinValue
            docs.foreach { d => n += 1; maxTsMs = math.max(maxTsMs, d.ts.getTime) }
            val st = state.getOption.getOrElse(DriftCount(0L, 0L))
            val next = DriftCount(st.c2 + n, st.version + (if (n > 0) 1L else 0L))
            state.update(next)
            if (c1.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(math.max(state.getCurrentWatermarkMs(), startMs),
                  maxTsMs) + horizonMs)
            if (n == 0) Iterator.empty   // registration: arm silently
            else {
              val (drift, status) = c1 match {
                case None => (None, "new")
                case Some(b) =>
                  val ppm = (next.c2 - b) * 1000000L / b
                  (Some(ppm), if (math.abs(ppm) > 100000L) "drift" else "ok")
              }
              Iterator.single(DriftReport(key._1, key._2, next.version,
                c1.getOrElse(0L), next.c2, drift, status))
            }
          }
      }
  }
}
