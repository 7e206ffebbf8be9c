package graft.tools

/** FLOOR MAINTENANCE (round-17 verdict ask 5): `bench_floor.json` — the
  * co-tenancy sentinel's per-query clean floors plus the four streaming
  * meters' clean rates — was hand-maintained "from the cleanest
  * detail", and a stale or too-tight floor either MUTES the sentinel
  * (2× a raised floor flags nothing) or spams in-process re-runs. This
  * tool recomputes the file from the recorded round details and is run
  * as part of the round-end record.
  *
  * Inputs are ARCHIVED BENCH DETAIL files (`bench_details/
  * BENCH_DETAIL_r<N>.json` by convention — each round's `Bench` run
  * writes `BENCH_DETAIL.json`, and the round-end protocol copies it
  * into the archive; the driver's `BENCH_r*.json` stdout artifacts
  * carry an EMPTY inline query map at this catalog size, so details
  * are the only complete record). Only PROVABLY CLEAN details count:
  * `ok == true`, `host_noise == []`, `host_noise_suspected == false`
  * — a detail predating the sentinel cannot prove cleanliness and is
  * excluded.
  *
  * Protocol:
  *  - the newest `--last N` (default 5) clean details form the window
  *    (ordered by the `r<N>` in the filename);
  *  - batch query floors = MIN warm seconds over the window (failure
  *    sentinels ≥ 9000 s excluded); the key set is the NEWEST clean
  *    detail's, so removed queries drop out;
  *  - meter floors = MAX clean rate over the window (the compare is
  *    inverted downstream: Bench flags a best-of-N below floor/2 —
  *    and a run's batch control bracketing does NOT vouch for its
  *    meters, so per-run meter dips inside an otherwise-clean window
  *    are expected and absorbed by the max);
  *  - merges REFUSE silent weakening against the existing file: a
  *    batch floor only moves DOWN (new clean evidence of a faster
  *    min) unless `--allow-raise`, a meter floor only moves UP unless
  *    `--allow-lower` — so losing a clean detail from the window can
  *    never quietly mute the sentinel;
  *  - output is canonical (sorted keys, fixed decimals), so a re-run
  *    over unchanged inputs is BYTE-STABLE.
  *
  * Usage: `runMain graft.tools.FloorTool [--out bench_floor.json]
  * [--last N] [--allow-raise] [--allow-lower] [detail files...]` */
object FloorTool {

  /** floor key → (detail object, rate field) for the four meters. */
  private val MeterSources = Seq(
    "streaming_rows_per_sec" -> ("streaming", "rows_per_sec"),
    "streaming_connector_rows_per_sec" -> ("streaming_connector", "rows_per_sec"),
    "serve_queries_per_sec" -> ("streaming_serve", "queries_per_sec"),
    "neardup_docs_per_sec" -> ("streaming_neardup", "docs_per_sec"))
  private val MeterKeys = MeterSources.map(_._1)
  private val ControlFirstKey = "control_first"
  private val FailSentinelSec = 9000.0

  final case class CleanRun(order: Long, queries: Map[String, Double],
      meters: Map[String, Double])

  def main(args: Array[String]): Unit = {
    var out = "bench_floor.json"
    var lastN = 5
    var allowRaise = false
    var allowLower = false
    val files = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--out" => out = args(i + 1); i += 1
        case "--last" => lastN = args(i + 1).toInt; i += 1
        case "--allow-raise" => allowRaise = true
        case "--allow-lower" => allowLower = true
        case f => files += f
      }
      i += 1
    }
    val inputs = {
      val fs = files.result()
      if (fs.nonEmpty) fs
      else {
        val d = new java.io.File("bench_details")
        if (!d.isDirectory) Seq.empty
        // suffixed archives (e.g. _r19_opt — an optimization pass
        // recorded WITHIN a round) are part of the window; parseClean
        // orders them by the r<N> they carry, tying with the round's
        // base archive so the min-merge sees both
        else d.listFiles.map(_.getName)
          .filter(_.matches("BENCH_DETAIL_r\\d+\\w*\\.json"))
          .map(n => s"bench_details/$n").toSeq
      }
    }
    val clean = inputs.flatMap(p => parseClean(p))
      .sortBy(_.order).takeRight(lastN)
    require(clean.nonEmpty,
      s"no provably-clean detail among ${inputs.size} inputs " +
        "(need ok, host_noise==[], !host_noise_suspected)")
    println(s"[floors] clean window: ${clean.map(_.order).mkString("r", ", r", "")}")

    val existing = readExisting(out)
    // batch floors: min over the window; key set = newest clean run's
    val newestQs = clean.last.queries.keySet
    val batchNew: Map[String, Double] = newestQs.iterator.map { q =>
      q -> clean.flatMap(_.queries.get(q)).filter(_ < FailSentinelSec).min
    }.toMap
    val meterNew: Map[String, Double] = MeterKeys.flatMap { m =>
      val vs = clean.flatMap(_.meters.get(m)).filter(_ > 0.0)
      if (vs.isEmpty) None else Some(m -> vs.max)
    }.toMap

    val merged = scala.collection.mutable.SortedMap.empty[String, Double]
    batchNew.foreach { case (q, v) =>
      existing.get(q) match {
        case Some(old) if v > old && !allowRaise =>
          println(f"[floors] REFUSED raise (batch): $q $old%.3f -> $v%.3f " +
            "(pass --allow-raise if the query legitimately got slower)")
          merged(q) = old
        case Some(old) if v > old => // allowRaise set: take the new evidence
          println(f"[floors] RAISED (batch, --allow-raise): $q $old%.3f -> $v%.3f")
          merged(q) = v
        case Some(old) if v < old =>
          println(f"[floors] lowered (batch): $q $old%.3f -> $v%.3f")
          merged(q) = v
        case Some(old) => merged(q) = old
        case None =>
          println(f"[floors] new (batch): $q $v%.3f")
          merged(q) = v
      }
    }
    existing.keySet.diff(newestQs ++ MeterKeys + ControlFirstKey).foreach { q =>
      println(s"[floors] dropped (not in newest clean run): $q")
    }
    // the control probe's own floor (min over clean runs' control.first
    // — its distribution sits above the query's in-pass warm floor, see
    // Bench's ctlFloor note); refuse-raise like any seconds floor
    val controlNew: Option[Double] = {
      val vs = clean.flatMap(_.meters.get(ControlFirstKey)).filter(_ > 0.0)
      if (vs.isEmpty) None else Some(vs.min)
    }
    controlNew match {
      case Some(v) => existing.get(ControlFirstKey) match {
        case Some(old) if v > old && !allowRaise =>
          println(f"[floors] REFUSED raise (control): $ControlFirstKey $old%.3f -> $v%.3f")
          merged(ControlFirstKey) = old
        case Some(old) if v > old =>
          println(f"[floors] RAISED (control, --allow-raise): $ControlFirstKey $old%.3f -> $v%.3f")
          merged(ControlFirstKey) = v
        case Some(old) => merged(ControlFirstKey) = math.min(v, old)
        case None =>
          println(f"[floors] new (control): $ControlFirstKey $v%.3f")
          merged(ControlFirstKey) = v
      }
      case None =>
        existing.get(ControlFirstKey).foreach(merged(ControlFirstKey) = _)
    }
    MeterKeys.foreach { m =>
      (meterNew.get(m), existing.get(m)) match {
        case (Some(v), Some(old)) if v < old && !allowLower =>
          println(f"[floors] REFUSED lower (meter): $m $old%.1f -> $v%.1f " +
            "(pass --allow-lower if the meter legitimately got slower)")
          merged(m) = old
        case (Some(v), Some(old)) if v < old => // allowLower set
          println(f"[floors] LOWERED (meter, --allow-lower): $m $old%.1f -> $v%.1f")
          merged(m) = v
        case (Some(v), Some(old)) =>
          if (v > old) println(f"[floors] raised (meter): $m $old%.1f -> $v%.1f")
          merged(m) = math.max(v, old)
        case (Some(v), None) =>
          println(f"[floors] new (meter): $m $v%.1f")
          merged(m) = v
        case (None, Some(old)) => merged(m) = old
        case (None, None) =>
      }
    }

    val body = merged.iterator.map { case (k, v) =>
      val fv = if (MeterKeys.contains(k)) f"$v%.1f" else f"$v%.3f"
      s"""  "$k": $fv"""
    }.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      body.getBytes("UTF-8"))
    println(s"[floors] wrote ${merged.size} floors to $out")
    ()
  }

  /** parse one archived detail; None unless it proves itself clean. */
  private[tools] def parseClean(path: String): Option[CleanRun] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val order = "r(\\d+)".r.findFirstMatchIn(
      new java.io.File(path).getName).map(_.group(1).toLong)
    val txt = scala.util.Try(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
    txt.toOption.flatMap { t =>
      scala.util.Try(JsonMethods.parse(t)).toOption.flatMap { j =>
        def num(v: JValue): Option[Double] = v match {
          case JDouble(d) => Some(d)
          case JInt(n) => Some(n.toDouble)
          case JLong(n) => Some(n.toDouble)
          case JDecimal(d) => Some(d.toDouble)
          case _ => None
        }
        val ok = (j \ "ok") == JBool(true)
        val noiseFree = ((j \ "host_noise") match {
          case JArray(xs) => xs.isEmpty
          case _ => false
        }) && (j \ "host_noise_suspected") == JBool(false)
        if (!(ok && noiseFree) || order.isEmpty) None
        else {
          val qs = (j \ "queries") match {
            case JObject(fields) =>
              fields.flatMap { case (k, v) => num(v).map(k -> _) }.toMap
            case _ => Map.empty[String, Double]
          }
          val ms = MeterSources.flatMap { case (key, (obj, field)) =>
            num(j \ obj \ field).map(key -> _)
          }.toMap ++ num(j \ "control" \ "first").map(ControlFirstKey -> _)
          Some(CleanRun(order.get, qs, ms))
        }
      }
    }
  }

  private def readExisting(path: String): Map[String, Double] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.]*)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }
}
