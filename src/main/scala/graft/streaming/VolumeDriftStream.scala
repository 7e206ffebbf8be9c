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
  * structurally invisible to traffic-driven emission — a stratum with
  * no traffic never invokes its group — and stays a read-time/batch
  * check, the same division of labor as DqStream's key-uniqueness
  * note: the monitor fires on what arrives, the audit sweeps what
  * didn't. */
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
}
