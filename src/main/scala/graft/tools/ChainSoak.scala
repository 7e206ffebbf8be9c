package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{ManagedIndex, MmrServeStream, PipelineE2E, VectorServeStream}

/** THE SOAK — the all-dials production topology held at a fixed open-
  * loop rate for a LONG window (round-17 ask 2): every burst
  * measurement so far priced the chain over ~20 waves (~1 minute of
  * injection); this probe asks the "would it survive 100×" question
  * over TIME instead of volume. Topology = the full update-aware
  * stack, every LWW dial on at once — the PipelineE2EChainServeSpec
  * full-LWW shape PLUS the managed serving side:
  *
  *   sharded ingest → apply → curation → UPDATE-AWARE near-dup gate
  *   (registerExpiringLww → applyLww: LWW retirement + the TTL'd
  *   registry as the one ager) → UPDATE-AWARE budget (admitLww's
  *   refund-or-restore ledger) writing the cell-keyed admitted
  *   manifest → FFD pack, with [[ManagedIndex]] compacting the
  *   manifest into pointed versions and a
  *   [[MmrServeStream.serveIndexedPointer]] query answering from them
  *   the whole run.
  *
  * Protocol ([[PipelineE2EProbe]] rate-mode discipline, stretched):
  * waves pre-rendered to disk, injected by a dedicated thread on a
  * fixed cadence (pure file moves — the probe never competes with the
  * chain for cores); a poller snapshots the packed layout, samples
  * per-stage STATE-STORE rows (the bounded-state claim observed over
  * time, not asserted), and drops a query file every ~25 waves so the
  * pointer serve works throughout. Post-hoc per-wave LAG exactly as
  * the rate probe computes it; the per-stage busy/growth report over
  * the full window closes the run.
  *
  * MID-SOAK UPDATE (round-17 ask 7's soak half): at the halfway wave
  * an UPDATE of the previous wave's documents is injected (revised
  * text — a near-copy of its own previous version, so it must ride
  * the gate's claim retirement — and a NEW synthetic embedding, op
  * clock +1 s). The poller then measures two freshness numbers:
  * `admit_lag_sec` (update landed → first re-admitted higher-`ver`
  * manifest row) and `serve_lag_sec` (update landed → the POINTED
  * version carries the new vector — the segment-model freshness SLA,
  * one delta cycle after re-admission). The op-clock offset is
  * deliberately +1 s: a large offset would drag every stage's
  * watermark forward and lame-duck the following waves — the update
  * rides INSIDE the chain's lateness horizon, as deployed.
  *
  * Usage: `runMain graft.tools.ChainSoak [periodSec] [waves] [rep]
  * [chainParts] [gateParts] [noupdate] [rocksapply]` (default
  * `2 210 16 8 8` — λ = 4k docs/s over ~7 minutes ≈ 20× the
  * knee-burst span; sf dir from SPARK_GRAFT_SF_DIR, default sf0.001).
  * `rocksapply` moves the apply LWW ledger — the chain's one
  * corpus-linear store — to RocksDB, the dial the first soak named:
  * the measured bracket is λ 2.7k FLAT (lag 20–50 s) with it, vs a
  * mid-run hump to 242 s without (in-heap snapshot cost rising with
  * register count); λ 4k runs as bounded catch-up either way
  * (SCALING.md "all-dials topology soaked"). */
object ChainSoak {

  def main(args: Array[String]): Unit = {
    val nums = args.filter(_.forall(_.isDigit))
    val period = nums.lift(0).map(_.toInt).getOrElse(2)
    val waves = nums.lift(1).map(_.toInt).getOrElse(210)
    val rep = nums.lift(2).map(_.toInt).getOrElse(16)
    val parts = nums.lift(3).map(_.toInt).getOrElse(8)
    val gateParts = nums.lift(4).map(_.toInt).getOrElse(8)
    val noUpdate = args.contains("noupdate")
    val rocksApply = args.contains("rocksapply")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-soak")
      .toFile.getAbsolutePath
    val serveRoot = java.nio.file.Files.createTempDirectory("graft-soaksrv")
      .toFile.getAbsolutePath
    try soak(spark, sfDir, root, serveRoot, period, waves, rep, parts,
      gateParts, noUpdate, rocksApply)
    finally {
      spark.stop()
      Seq(root, serveRoot).foreach(d =>
        new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
    }
  }

  // synthetic 64-d embeddings, deterministic in doc_id; v2 uses a
  // DIFFERENT formula so the serve-freshness probe can tell versions
  // apart without carrying state
  private def withVec(d: DataFrame, formula: String): DataFrame =
    d.withColumn("embedding",
      expr(s"transform(sequence(1, 64), i -> cast(($formula) * i as double))"))
  private val V1Formula = "doc_id % 97 + 1"
  private val V2Formula = "doc_id % 89 + 2"

  private def soak(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      root: String, serveRoot: String, period: Int, waves: Int, rep: Int,
      parts: Int, gateParts: Int, noUpdate: Boolean,
      rocksApply: Boolean): Unit = {
    import spark.implicits._
    val base = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val template = PipelineE2EProbe.replicate(base, rep).localCheckpoint()
    val stride = template.agg(max(col("doc_id"))).head().getLong(0) + 1L
    def waveDocs(w: Int): DataFrame = withVec(
      template.select(
        (col("doc_id") + lit(w.toLong * stride)).as("doc_id"),
        col("source"), col("lang"),
        array_join(transform(split(col("text"), " "),
          t => concat(lit(s"w${w}_"), t)), " ").as("text")),
      V1Formula)
    // lateness horizon: the mid-soak update arrives ~1-2 waves of
    // event time behind the head — 3 waves + slack keeps it (and
    // ordinary cross-shard skew) inside every stage's watermark
    val horizon = s"${3L * stride + 60L} seconds"
    val gated = template.filter(size(graft.functions.TextFns.tokens(col("text")))
      >= graft.streaming.CurationStream.QualityMinTokens)
    val hcBase = graft.operators.Pipeline.budgetBaseFrom(
      gated.select(col("doc_id"), col("lang"), col("text"))).localCheckpoint()
    val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(hcBase, 2000L * rep)
    val priorProgress =
      spark.conf.getOption("spark.sql.streaming.numRecentProgressUpdates")
    val progressRetention = 10000
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      progressRetention.toString)
    try {
      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(),
        cap = Int.MaxValue / 2,
        // the INGEST watermark must also cover the mid-soak update's
        // op-clock skew: its ops carry wave U-1 timestamps and arrive
        // after wave U+ has advanced the quorum watermark — at the
        // default 10 s horizon the quorum stage would silently drop
        // the whole update wave (observed in the smoke run)
        watermark = horizon,
        applyLateness = horizon, curationDelay = horizon,
        nearDup = true, nearDupLww = true,
        nearDupTtlMs = Some(2L * stride * 1000L),
        // `rocksapply` moves the chain's ONE corpus-linear ledger (the
        // apply LWW registers) off-heap — the documented dial for the
        // soak-observed growth term (in-heap snapshot cost rises with
        // register count over a long window)
        applyProvider = if (rocksApply) Some("rocksdb") else None,
        budgetLww = true, serveIndexedAdmit = true,
        serveFromChain = Some(s"$sfDir/embeddings.parquet"),
        chainShufflePartitions = Some(parts),
        gateShufflePartitions = Some(gateParts))
      val cb = VectorServeStream.codebookFrom(spark, s"$sfDir/embeddings.parquet")
      val idx = ManagedIndex.start(spark, s"$root/admitted",
        s"$serveRoot/versions", s"$serveRoot/POINTER", cb, pollMs = 3000L)
      val inDir = java.nio.file.Paths.get(serveRoot, "in")
      java.nio.file.Files.createDirectories(inDir)
      val serve = MmrServeStream.serveIndexedPointer(
        graft.Tables.loadStream(spark, inDir.toString, "embeddings",
          s"$sfDir/embeddings.parquet"),
        s"$serveRoot/POINTER", s"$serveRoot/ckpt-ptr", serveRoot, nprobe = 2)
      try {
        // pre-render EVERY wave (injection must be pure file moves)
        val t0r = System.nanoTime()
        val rendered = (1 to waves).map { w =>
          w -> PipelineE2E.renderOplogWave(spark, waveDocs(w),
            PipelineE2E.defaultTopology, s"w$w",
            shardKey = Some(PipelineE2E.shardByLang(2)))
        }.toMap
        val updAt = waves / 2
        val updLo = (updAt - 1).toLong * stride
        val updHi = updAt.toLong * stride
        val updWave =
          if (noUpdate) None
          else Some(PipelineE2E.renderOplogWave(spark,
            withVec(waveDocs(updAt - 1)
                .select(col("doc_id"), col("source"), col("lang"),
                  concat(col("text"), lit(s" wu_revised_soak wu_edition_soak"))
                    .as("text")),
              V2Formula),
            PipelineE2E.defaultTopology, "wu",
            shardKey = Some(PipelineE2E.shardByLang(2)), tsOffsetSec = 1L))
        val docsPerWave = template.count()
        println(f"""{"probe":"chain_soak_setup","waves":$waves,"period_sec":$period,"docs_per_wave":$docsPerWave,"offered_docs_per_sec":${docsPerWave.toDouble / period}%.0f,"render_sec":${(System.nanoTime() - t0r) / 1e9}%.1f}""")
        // one 8-vector query file, re-dropped periodically
        val qStage = java.nio.file.Files.createTempDirectory("graft-soak-q")
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .filter(col("vec_id") < 8).coalesce(1)
          .write.mode("overwrite").parquet(qStage.toString)
        val qPart = qStage.toFile.listFiles
          .find(_.getName.endsWith(".parquet")).get.toPath

        // WARM-UP, excluded from the clocked window: the first triggers
        // of nine queries pay classload/codegen/state-store init at
        // once, and a cold chain accumulates a ~30-wave backlog that
        // takes the whole run to drain (first soak attempt) — inject
        // one wave, drain end to end, then start the cadence clock
        PipelineE2E.writeOplogWave(spark, waveDocs(0), root,
          PipelineE2E.defaultTopology, "warmup",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        def packedPerWave(): Map[Long, Long] =
          scala.util.Try {
            spark.read.json(s"$root/layout/ffd")
              .select((col("data.doc_id") / stride).cast("long").as("w"))
              .groupBy("w").count()
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          }.getOrElse(Map.empty)
        val t0 = System.nanoTime()
        def now() = (System.nanoTime() - t0) / 1e9
        val injected = new java.util.concurrent.ConcurrentHashMap[Int, Double]()
        val updInjectedAt = new java.util.concurrent.atomic.AtomicReference[Option[Double]](None)
        val injector = new Thread(() => {
          (1 to waves).foreach { w =>
            val target = (w - 1).toDouble * period
            while (now() < target) Thread.sleep(10)
            PipelineE2E.injectStagedWave(rendered(w), root,
              PipelineE2E.defaultTopology, s"w$w")
            injected.put(w, now())
            if (w == updAt) updWave.foreach { u =>
              PipelineE2E.injectStagedWave(u, root,
                PipelineE2E.defaultTopology, "wu")
              updInjectedAt.set(Some(now()))
            }
            ()
          }
        }, "soak-injector")
        injector.setDaemon(true)
        injector.start()

        val nShards = PipelineE2E.defaultTopology.size
        val stageLabels = (0 until nShards).map(i => s"ingest$i") ++
          Seq("apply", "curate", "neardupreg", "neardup", "budget", "pack",
            "serveint")
        def stateSample(): String = chain.queries.zip(stageLabels).map {
          case (q, l) =>
            val rows = Option(q.lastProgress).toSeq
              .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
            s""""$l":$rows"""
        }.mkString(",")

        val snaps = Seq.newBuilder[(Double, Map[Long, Long])]
        var polls = 0
        var lastQDrop = -1
        var updProbeId: Option[Long] = None
        var admitLag: Option[Double] = None
        var serveLag: Option[Double] = None
        // v2 detection is BY VER FLOOR, not by multi-version presence:
        // under catch-up the registry's in-batch LWW collapse (and the
        // apply stage's) may forward ONLY the newest version — the
        // correct update-aware behavior — so the updated doc's v1 never
        // publishes and "two distinct vers" never appears downstream.
        // The update's op clock is +1 s, so its ver stamp is
        // >= (doc_id + 86401)*1e9 (ver = tsUs*1000 + tsInc).
        def atV2(df: DataFrame): DataFrame = df
          .filter(col("doc_id") >= updLo && col("doc_id") < updHi)
          .filter(col("ver") >= (col("doc_id") + lit(86401L)) * lit(1000000000L))
        def probeUpdate(): Unit = updInjectedAt.get().foreach { tU =>
          if (admitLag.isEmpty) {
            // first admitted manifest row at the update's version
            // (doc_id pushdown prunes the scan)
            val hit = scala.util.Try {
              atV2(spark.read.schema("doc_id LONG, ver LONG")
                  .parquet(s"$root/admitted"))
                .select(min(col("doc_id"))).head().getLong(0)
            }.toOption
            hit.foreach { d =>
              updProbeId = Some(d)
              admitLag = Some(now() - tU)
              println(f"""{"probe":"chain_soak_update","event":"readmitted","doc_id":$d,"admit_lag_sec":${admitLag.get}%.1f}""")
            }
          } else if (serveLag.isEmpty) updProbeId.foreach { d =>
            val expect = (0 until 64).map(i => (d % 89 + 2).toDouble * (i + 1))
            val fresh = scala.util.Try {
              val ptr = new String(java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get(s"$serveRoot/POINTER")), "UTF-8").trim
              MmrServeStream.readVersionRaw(spark, ptr)
                .filter(col("doc_id") === d)
                .select(col("embedding")).as[Array[Double]].collect()
                .exists(e => e.toSeq == expect)
            }.getOrElse(false)
            if (fresh) {
              serveLag = Some(now() - updInjectedAt.get().get)
              println(f"""{"probe":"chain_soak_update","event":"pointed","doc_id":$d,"serve_lag_sec":${serveLag.get}%.1f}""")
            }
          }
        }
        while (injector.isAlive || {
            val s = snaps.result(); s.length < 8 ||
              s.takeRight(8).map(_._2).distinct.size > 1
          }) {
          snaps += ((now(), packedPerWave()))
          polls += 1
          if (polls % 10 == 0)
            println(f"""{"probe":"chain_soak_state","t_sec":${now()}%.0f,${stateSample()}}""")
          val wNow = (now() / period).toInt
          if (wNow / 25 > lastQDrop) {
            lastQDrop = wNow / 25
            java.nio.file.Files.copy(qPart,
              inDir.resolve(s"q$lastQDrop.parquet"))
            ()
          }
          probeUpdate()
          Thread.sleep(3000)
        }
        injector.join()
        chain.drain()
        serve.processAllAvailable()
        snaps += ((now(), packedPerWave()))
        (1 to 40).takeWhile { _ =>
          if (admitLag.isEmpty || serveLag.isEmpty) { probeUpdate(); Thread.sleep(500); true }
          else false
        }
        // the update never surfaced: localize which stage dropped it
        // (rows AT the update version in the updated id range, per stage)
        if (!noUpdate && (admitLag.isEmpty || serveLag.isEmpty)) {
          def nV2(df: => DataFrame): Long =
            scala.util.Try(atV2(df).select(col("doc_id")).distinct().count())
              .getOrElse(-1L)
          val inDocs = nV2(spark.read
            .schema(PipelineE2E.docSchemaEV).parquet(PipelineE2E.docsGlob(root)))
          val inCurated = nV2(spark.read
            .schema(PipelineE2E.curatedFullSchemaE).parquet(s"$root/curated"))
          val inDedup = nV2 {
            val lineSchema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("data",
                PipelineE2E.curatedFullSchemaE)))
            spark.read.schema(lineSchema).json(s"$root/dedup/neardup/batch=*")
              .select(col("data.doc_id").as("doc_id"), col("data.ver").as("ver"))
          }
          val inAdmitted = nV2(spark.read
            .schema("doc_id LONG, ver LONG").parquet(s"$root/admitted"))
          println(s"""{"probe":"chain_soak_update","event":"missing","at_v2_docs":$inDocs,"at_v2_curated":$inCurated,"at_v2_dedup":$inDedup,"at_v2_admitted":$inAdmitted}""")
        }
        val all = snaps.result()
        val fin = all.last._2
        val lags = (1 to waves).map { w =>
          val target = fin.getOrElse(w.toLong, 0L)
          val done = all.find { case (_, m) => m.getOrElse(w.toLong, 0L) >= target }
            .map(_._1).getOrElse(Double.NaN)
          w -> (done - injected.get(w))
        }
        lags.foreach { case (w, lag) =>
          println(f"""{"probe":"chain_soak","period_sec":$period,"wave":$w,"lag_sec":$lag%.1f}""")
        }
        def meanOf(xs: Seq[Double]): Double =
          if (xs.isEmpty) Double.NaN else xs.sum / xs.length
        val clean = lags.map(_._2).filterNot(_.isNaN)
        val dec = math.max(1, clean.length / 10)
        println(f"""{"probe":"chain_soak_summary","waves":$waves,"period_sec":$period,"lag_first_decile":${meanOf(clean.take(dec))}%.1f,"lag_mid_decile":${meanOf(clean.slice(clean.length / 2 - dec / 2, clean.length / 2 + dec / 2 + 1))}%.1f,"lag_last_decile":${meanOf(clean.takeRight(dec))}%.1f,"lag_max":${clean.max}%.1f,"admit_lag_sec":${admitLag.getOrElse(-1.0)}%.1f,"serve_lag_sec":${serveLag.getOrElse(-1.0)}%.1f,"versions":${idx.versions},"served_rows":${scala.util.Try(spark.read.json(s"$serveRoot/serve/batch=*").count()).getOrElse(0L)}}""")
        // per-stage busy/growth over the FULL window (rate-probe report)
        val windowSec = all.last._1
        chain.queries.zip(stageLabels).foreach { case (q, l) =>
          val ps = q.recentProgress.toSeq
          if (ps.length >= progressRetention)
            println(s"""{"probe":"chain_soak_stage_warn","stage":"$l","warn":"progress buffer filled (${ps.length}) — window truncated"}""")
          def dur(p: org.apache.spark.sql.streaming.StreamingQueryProgress,
              k: String): Long =
            Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
          val busyMs = ps.map(dur(_, "triggerExecution")).sum
          val data = ps.filter(_.numInputRows > 0)
          val trig = data.map(dur(_, "triggerExecution"))
          def mean(xs: Seq[Long]): Long =
            if (xs.isEmpty) 0L else xs.sum / xs.length
          val third = math.max(1, trig.length / 3)
          val stateRows = Option(q.lastProgress).toSeq
            .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
          println(f"""{"probe":"chain_soak_stage","stage":"$l","busy_pct":${(100.0 * busyMs / math.max(1e-9, windowSec * 1000)).round},"batches":${ps.length},"data_batches":${data.length},"rows":${data.map(_.numInputRows).sum},"batch_ms_mean":${mean(trig)},"batch_ms_first3rd":${mean(trig.take(third))},"batch_ms_last3rd":${mean(trig.takeRight(third))},"state_rows_end":$stateRows}""")
        }
        new scala.reflect.io.Directory(qStage.toFile).deleteRecursively()
        ()
      } finally {
        serve.stop(); idx.stop(); chain.stop()
      }
    } finally priorProgress match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.numRecentProgressUpdates")
    }
  }
}
