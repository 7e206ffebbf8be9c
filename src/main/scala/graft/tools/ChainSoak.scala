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
  * SELF-ADJUDICATION SENTINEL (round 19): the bench's control-pair
  * discipline, adapted to a window that is BUSY BY DESIGN — a Spark
  * control query would inflate with the chain's own load and conflate
  * backlog with co-tenancy, so the soak instead records two
  * orthogonal signals per ~3 s poll and adjudicates per time bucket
  * in the artifact: (1) a fixed single-thread CPU KERNEL (pure JVM
  * loop, no Spark — its wall time moves only when the HOST's cores
  * are oversubscribed: the chain at the soak dials peaks ~50% busy,
  * so a 2× kernel inflation vs the run's own best bucket marks an
  * external window, not catch-up); (2) per-stage PER-ROW batch cost
  * (batch-ms / input rows — catch-up batches are LARGER and therefore
  * cheaper per row, co-tenant windows are same-size and slower, so
  * the uniform-cross-stage-2× signature the r18 adjudication applied
  * by eyeball becomes a computed flag). A bucket is `suspected` when
  * the kernel inflates ≥ 2× or ≥ 4 stages' per-row cost inflates
  * ≥ 2× vs their own best bucket — the `chain_soak_sentinel` line
  * carries the evidence either way.
  *
  * Usage: `runMain graft.tools.ChainSoak [periodSec] [waves] [rep]
  * [chainParts] [gateParts] [noupdate] [rocksapply] [fault] [rejoin]
  * [sink1] [handoff]`
  * (default
  * `2 210 16 8 8` — λ = 4k docs/s over ~7 minutes ≈ 20× the
  * knee-burst span; sf dir from SPARK_GRAFT_SF_DIR, default sf0.001).
  * `rocksapply` moves the apply LWW ledger — the chain's one
  * corpus-linear store — to RocksDB, the dial the first soak named:
  * the measured bracket is λ 2.7k FLAT (lag 20–50 s) with it, vs a
  * mid-run hump to 242 s without (in-heap snapshot cost rising with
  * register count); λ 4k runs as bounded catch-up either way
  * (SCALING.md "all-dials topology soaked").
  *
  * `fault` (round-17 ask 4) plants the reference's own known defect
  * shape mid-soak: at the halfway wave shard s0's member h3 DIES (all
  * later waves render only 2 copies of s0's ops, but the quorum still
  * expects depth 3 — the sub-quorum retention the reference leaks
  * forever, `MongoDBOplogSource.java:59`, with its depth frozen at
  * discovery, `MongoOplogTailMapper.java:64`); two waves later the
  * operator REQUORUMS by publishing depth 2 through the live
  * [[graft.streaming.QuorumDedup.DepthControl]] channel (no restart).
  * The probe then witnesses both halves of the fix: the sub-quorum
  * state HUMP (retained first copies) drains back to plateau at the
  * lateness horizon, and NOT ONE op is lost — every wave's full doc
  * count materializes in the store (the two pre-reconfig waves recover
  * via the timeout re-check, later waves fire at arrival under the new
  * depth). Implies `noupdate`; the apply/curation lateness widens to
  * 7 waves so the horizon-late recovered ops stay inside every
  * downstream watermark.
  *
  * `rejoin` (round-19 ask 3) completes the membership-change story the
  * fault mode starts: after the death + live 3→2 requorum, member h3
  * is RESTORED at the 3/4 wave (later waves render 3 copies again) and
  * two waves later the operator raises depth back to 3 through the
  * same live channel. Witnesses: `missing_waves: 0` across the whole
  * lower-then-raise timeline (ops spanning the raise fire at the depth
  * their copies arrived under; a restored member's straggler copies of
  * already-emitted keys are suppressed — the `emitted` flag persists),
  * `dup_emits: 0` over the whole published index (no retraction, no
  * double-emit), and the ingest store draining back toward the 3-copy
  * plateau. Burst twin: OplogPipelineFaultSpec's rejoin case.
  *
  * Raise-timing contract (operator-facing): a sub-quorum op re-checks
  * quorum AT TIMEOUT TIME against the depth THEN in force — so raise
  * only after the lowered-depth window's lateness horizon has drained
  * (the standard 210-wave schedule leaves ~50 waves between the lower
  * and the raise, ~16× the horizon; a compressed smoke schedule can
  * race the raise past a retained op's timeout, which then correctly
  * adjudicates at the deeper quorum and drops — the op never reached
  * quorum under any regime it completed in).
  *
  * `handoff` (round-19 ask 1) runs every raw-listed directory handoff
  * through the epoch-pointer source with consumed-epoch retention
  * (`startLive(epochHandoffs, docsRetention)`) — the soak whose
  * last-third lag slope must come out FLAT now that no consumer
  * re-lists a growing glob and the hot namespaces stay bounded. */
object ChainSoak {

  def main(args: Array[String]): Unit = {
    val nums = args.filter(_.forall(_.isDigit))
    val period = nums.lift(0).map(_.toInt).getOrElse(2)
    val waves = nums.lift(1).map(_.toInt).getOrElse(210)
    val rep = nums.lift(2).map(_.toInt).getOrElse(16)
    val parts = nums.lift(3).map(_.toInt).getOrElse(8)
    val gateParts = nums.lift(4).map(_.toInt).getOrElse(8)
    val rejoin = args.contains("rejoin")
    val fault = args.contains("fault") || rejoin
    val noUpdate = args.contains("noupdate") || fault
    val rocksApply = args.contains("rocksapply")
    // `sink1`: one file per epoch on every raw-listed handoff — the
    // dial for the extended soak's named residual (listing cost grows
    // with total file count); epoch volume is trigger-bounded at any
    // λ this box sustains, so a single writer loses nothing here
    val sink1 = args.contains("sink1")
    // `handoff`: epoch-pointer consumption + consumed-epoch retention
    // on every raw-listed directory handoff (round-19 ask 1)
    val handoff = args.contains("handoff")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-soak")
      .toFile.getAbsolutePath
    val serveRoot = java.nio.file.Files.createTempDirectory("graft-soaksrv")
      .toFile.getAbsolutePath
    try soak(spark, sfDir, root, serveRoot, period, waves, rep, parts,
      gateParts, noUpdate, rocksApply, fault, sink1, rejoin, handoff)
    finally {
      spark.stop()
      // GRAFT_SOAK_KEEP=1 keeps the run dirs for post-mortem forensics
      if (!sys.env.get("GRAFT_SOAK_KEEP").contains("1"))
        Seq(root, serveRoot).foreach(d =>
          new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
      else println(s"""{"probe":"chain_soak_keep","root":"$root","serve_root":"$serveRoot"}""")
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
      rocksApply: Boolean, fault: Boolean = false,
      sink1: Boolean = false, rejoin: Boolean = false,
      handoff: Boolean = false): Unit = {
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
    // fault mode: ops retained sub-quorum recover at the INGEST
    // horizon, i.e. ~3 waves of event time late — downstream stages
    // need extra headroom on top of the ordinary cross-shard skew so
    // the recovered waves never fall below an apply/curation watermark
    val chainLateness = if (fault) s"${7L * stride + 60L} seconds" else horizon
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
        applyLateness = chainLateness, curationDelay = chainLateness,
        depthControlRoot = if (fault) Some(s"$root/depthctl") else None,
        sinkCoalesce = if (sink1) Some(1) else None,
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
        gateShufflePartitions = Some(gateParts),
        epochHandoffs = handoff, docsRetention = handoff)
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
        // pre-render EVERY wave (injection must be pure file moves).
        // fault mode: waves past the halfway point render s0 with
        // member h3 DEAD (2 copies of each s0 op against quorum 3)
        val t0r = System.nanoTime()
        val updAt = waves / 2
        // rejoin: member h3 RESTORED at the 3/4 wave — later waves
        // render 3 copies of s0's ops again; the depth raise publishes
        // two waves later, so raise-spanning ops fire at the depth
        // their copies arrived under (no loss either side)
        val rejoinAt = updAt + (waves - updAt) / 2
        val deadTopology = Seq(
          graft.streaming.ShardTopology.parseDescriptor("s0/h1:27017,h2:27017"),
          graft.streaming.ShardTopology.parseDescriptor("s1/h4:27017,h5:27017"))
        def topoFor(w: Int) =
          if (fault && w > updAt && !(rejoin && w > rejoinAt)) deadTopology
          else PipelineE2E.defaultTopology
        val rendered = (1 to waves).map { w =>
          w -> PipelineE2E.renderOplogWave(spark, waveDocs(w),
            topoFor(w), s"w$w",
            shardKey = Some(PipelineE2E.shardByLang(2)))
        }.toMap
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
        // one 8-vector query file, re-dropped periodically. The query
        // vectors are drawn from the CHAIN'S OWN synthetic distribution
        // (V1Formula — what the soak corpus actually carries), not the
        // embeddings fixture: fixture-vintage queries probe cells the
        // synthetic corpus never populates, so every serve batch
        // retrieved NOTHING and served_rows witnessed only the
        // pointer-swap machinery, not retrieval (round-19 finding —
        // the r17/r18 soak serve legs had this blind spot)
        val qStage = java.nio.file.Files.createTempDirectory("graft-soak-q")
        withVec(spark.range(8).select(col("id").as("doc_id")), V1Formula)
          .select(col("doc_id").as("vec_id"),
            expr("transform(embedding, x -> cast(x as float))").as("embedding"))
          .coalesce(1)
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
        // INCREMENTAL layout tally (round 19): the poller used to
        // re-read the WHOLE layout tree every 3 s — its own listing
        // grew with epoch count, so the late-window "lag" carried the
        // probe's own rising read time as a confound. The layout sink
        // commits epochs serially, so the poll is a cursor: read ONLY
        // the newly-committed batch dirs, accumulate per-wave counts.
        // (A replayed layout epoch would double-tally — replays need a
        // writer crash, which aborts the run anyway; the full-read
        // form had the mirror-image replace window.)
        val packedAgg = scala.collection.mutable.Map.empty[Long, Long]
        var packedCursor = -1L
        def packedPerWave(): Map[Long, Long] = {
          val layoutRoot = s"$root/layout/ffd"
          var e = packedCursor
          while (new java.io.File(layoutRoot, s"batch=${e + 1}/_SUCCESS").isFile)
            e += 1
          if (e > packedCursor) scala.util.Try {
            val dirs = (packedCursor + 1L to e).map(i => s"$layoutRoot/batch=$i")
            spark.read
              .schema("data STRUCT<doc_id: LONG>")
              .json(dirs: _*)
              .select((col("data.doc_id") / stride).cast("long").as("w"))
              .groupBy("w").count()
              .collect().foreach { r =>
                packedAgg(r.getLong(0)) =
                  packedAgg.getOrElse(r.getLong(0), 0L) + r.getLong(1)
              }
            packedCursor = e   // only on success — a failed read retries whole
          }
          packedAgg.toMap
        }
        val t0 = System.nanoTime()
        def now() = (System.nanoTime() - t0) / 1e9
        val injected = new java.util.concurrent.ConcurrentHashMap[Int, Double]()
        val updInjectedAt = new java.util.concurrent.atomic.AtomicReference[Option[Double]](None)
        val injector = new Thread(() => {
          (1 to waves).foreach { w =>
            val target = (w - 1).toDouble * period
            while (now() < target) Thread.sleep(10)
            PipelineE2E.injectStagedWave(rendered(w), root,
              topoFor(w), s"w$w")
            injected.put(w, now())
            if (w == updAt) updWave.foreach { u =>
              PipelineE2E.injectStagedWave(u, root,
                PipelineE2E.defaultTopology, "wu")
              updInjectedAt.set(Some(now()))
            }
            // fault mode: the operator notices the death and REQUORUMS
            // two waves in (no restart) — the two sub-quorum waves
            // recover via the timeout re-check at the horizon, later
            // waves fire at arrival under depth 2
            if (fault && w == updAt + 2)
              graft.streaming.QuorumDedup.DepthControl.publish(
                s"$root/depthctl/s0", 1L, 2)
            // rejoin: the member is back (waves > rejoinAt carry its
            // copies) — the operator re-deepens the quorum live
            if (rejoin && w == rejoinAt + 2)
              graft.streaming.QuorumDedup.DepthControl.publish(
                s"$root/depthctl/s0", 2L, 3)
            ()
          }
        }, "soak-injector")
        injector.setDaemon(true)
        injector.start()

        val nShards = PipelineE2E.defaultTopology.size
        val stageLabels = (0 until nShards).map(i => s"ingest$i") ++
          Seq("apply", "curate", "neardupreg", "neardup", "budget", "pack",
            "serveint")
        def stateRowsNow(): Seq[(String, Long)] =
          chain.queries.zip(stageLabels).map { case (q, l) =>
            l -> Option(q.lastProgress).toSeq
              .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
          }
        def stateSample(): String = stateRowsNow()
          .map { case (l, rows) => s""""$l":$rows""" }.mkString(",")
        // fault mode: the s0 ingest state ledger over time — (rows,
        // bytes). ROWS can't show sub-quorum retention (every op key is
        // resident within the horizon either way, emitted or not); the
        // retained FIRST COPIES show up as store BYTES — the hump that
        // must drain back to plateau after requorum is the bytes curve
        val ingest0Ledger = Seq.newBuilder[(Double, Long, Long)]
        def ingest0Now(): (Long, Long) = chain.queries.headOption
          .flatMap(q => Option(q.lastProgress))
          .map { p =>
            val ops = p.stateOperators.toSeq
            (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
          }.getOrElse((0L, 0L))

        val snaps = Seq.newBuilder[(Double, Map[Long, Long])]
        var polls = 0
        // sentinel signal 1: a fixed single-thread CPU kernel (pure
        // JVM, no Spark) — its wall time moves only when the host's
        // cores are oversubscribed, so it separates co-tenant windows
        // from the chain's own catch-up load (see the object scaladoc)
        val wallAt0 = System.currentTimeMillis() - (now() * 1000).toLong
        val probeLedger = Seq.newBuilder[(Double, Double)]
        def cpuKernel(): Double = {
          val t = System.nanoTime()
          var h = 1469598103934665603L
          var i = 0
          while (i < 20000000) { h = (h ^ i) * 1099511628211L; i += 1 }
          if (h == 42L) print("")   // consume h: the loop must survive JIT
          (System.nanoTime() - t) / 1e6
        }
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
          probeLedger += ((now(), cpuKernel()))
          if (fault) {
            val (r0, b0) = ingest0Now()
            ingest0Ledger += ((now(), r0, b0))
          }
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
        // fault-mode witnesses (before the lag report so a crash in the
        // store read never eats the evidence): (1) NO EMISSION LOSS —
        // every wave's full doc count materialized through quorum +
        // apply (the two pre-reconfig sub-quorum waves included);
        // (2) the sub-quorum state hump on s0's ingest store drained
        // back to plateau after requorum (the reference leaks exactly
        // this state forever, MongoDBOplogSource.java:59)
        if (fault) {
          // docsAllGlobs: under handoff retention the consumed docs
          // epochs live in the cold tier — the corpus witness spans both
          val perWave = spark.read
            .schema(PipelineE2E.docSchemaEV)
            .parquet(PipelineE2E.docsAllGlobs(root): _*)
            .filter(col("doc_id") >= stride)   // wave 0 is the warmup
            .groupBy((col("doc_id") / stride).cast("long").as("w"))
            .agg(countDistinct(col("doc_id")).as("docs"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val missing = (1 to waves)
            .filter(w => perWave.getOrElse(w.toLong, 0L) < docsPerWave)
          // rejoin: the no-retraction/no-double-emit witness — every op
          // hash appears EXACTLY once across the whole published index
          // (live + archived epochs), through death, lower, and raise
          val dupEmits =
            if (!rejoin) -1L
            else {
              // explicit committed-epoch dirs (a glob that matches zero
              // paths — a fully-retained live tree — throws)
              val dirs = PipelineE2E.defaultTopology.flatMap { sh =>
                Seq(s"$root/index/${sh.shard}/oplog",
                  s"$root/index/${sh.shard}/oplog_archive")
              }.flatMap { d =>
                Option(new java.io.File(d).listFiles).getOrElse(Array.empty)
                  .filter(f => f.isDirectory && f.getName.startsWith("batch=") &&
                    new java.io.File(f, "_SUCCESS").isFile)
                  .map(_.getPath)
              }
              if (dirs.isEmpty) -2L
              else spark.read
                .schema(org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("data",
                    graft.model.OplogEntry.schema))))
                .json(dirs: _*)
                .groupBy(col("data.h")).count()
                .filter(col("count") > 1).count()
            }
          val led = ingest0Ledger.result()
          val deathT = injected.getOrDefault(updAt + 1, Double.NaN)
          val preR = led.filter(_._1 < deathT).map(_._2)
          val postR = led.filter(_._1 >= deathT).map(_._2)
          val preB = led.filter(_._1 < deathT).map(_._3)
          val postB = led.filter(_._1 >= deathT).map(_._3)
          def mx(xs: Seq[Long]): Long = if (xs.isEmpty) -1L else xs.max
          println(s"""{"probe":"chain_soak_fault","death_wave":${updAt + 1},"reconfig_wave":${updAt + 2},"rejoin_wave":${if (rejoin) rejoinAt + 1 else -1},"raise_wave":${if (rejoin) rejoinAt + 2 else -1},"dup_emits":$dupEmits,"docs_per_wave":$docsPerWave,"missing_waves":${missing.length},"missing_list":${missing.take(10).mkString("[", ",", "]")},"ingest0_rows_pre_max":${mx(preR)},"ingest0_rows_hump_max":${mx(postR)},"ingest0_rows_end":${led.lastOption.map(_._2).getOrElse(-1L)},"ingest0_bytes_pre_max":${mx(preB)},"ingest0_bytes_hump_max":${mx(postB)},"ingest0_bytes_end":${led.lastOption.map(_._3).getOrElse(-1L)}}""")
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
        // guard the max: if NOTHING packed (every per-wave lag NaN) the
        // summary must still print instead of crashing at the very end
        // of a long run (round-17 ADVICE — clean.max throws on empty)
        val lagMax = if (clean.isEmpty) Double.NaN else clean.max
        println(f"""{"probe":"chain_soak_summary","waves":$waves,"period_sec":$period,"lag_first_decile":${meanOf(clean.take(dec))}%.1f,"lag_mid_decile":${meanOf(clean.slice(clean.length / 2 - dec / 2, clean.length / 2 + dec / 2 + 1))}%.1f,"lag_last_decile":${meanOf(clean.takeRight(dec))}%.1f,"lag_max":$lagMax%.1f,"admit_lag_sec":${admitLag.getOrElse(-1.0)}%.1f,"serve_lag_sec":${serveLag.getOrElse(-1.0)}%.1f,"versions":${idx.versions},"served_rows":${scala.util.Try(spark.read.schema("data STRUCT<qid: LONG>").json(s"$serveRoot/serve/batch=*").filter(col("data.qid").isNotNull).count()).getOrElse(-1L)}}""")
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
        // SELF-ADJUDICATION (round-19 ask 2): bucket the window and
        // stamp suspect buckets IN THE ARTIFACT — the r18 extended
        // soak's contaminated first third had to be adjudicated by
        // eyeball; here the two signals (object scaladoc) compute it.
        locally {
          val nBuckets = 9
          val bucketSec = math.max(1e-9, windowSec / nBuckets)
          def bucketOf(t: Double): Int =
            math.min(nBuckets - 1, math.max(0, (t / bucketSec).toInt))
          val probeMean: Array[Double] = {
            val acc = Array.fill(nBuckets)(Seq.newBuilder[Double])
            probeLedger.result().foreach { case (t, ms) => acc(bucketOf(t)) += ms }
            acc.map { b =>
              val xs = b.result()
              if (xs.isEmpty) -1.0 else xs.sum / xs.length
            }
          }
          val probeClean = probeMean.filter(_ > 0)
          val probeFloor = if (probeClean.isEmpty) -1.0 else probeClean.min
          // per-stage PER-ROW batch cost per bucket: catch-up batches
          // are larger and cheaper per row; co-tenant windows are
          // same-size and slower — a ≥ 2× per-row inflation vs the
          // stage's own best bucket is the flag
          val MinRows = 200L
          val stageFlags = Array.fill(nBuckets)(0)
          chain.queries.zip(stageLabels).foreach { case (q, _) =>
            val per = Array.fill(nBuckets)((0.0, 0L, 0L))
            q.recentProgress.toSeq.filter(_.numInputRows > 0).foreach { p =>
              val t = (java.time.Instant.parse(p.timestamp).toEpochMilli -
                wallAt0) / 1000.0
              val b = bucketOf(t)
              val d = Option(p.durationMs.get("triggerExecution"))
                .map(_.doubleValue).getOrElse(0.0)
              per(b) = (per(b)._1 + d, per(b)._2 + p.numInputRows,
                per(b)._3 + 1L)
            }
            // per-row cost is only comparable at comparable batch
            // sizes: a small-batch bucket (warmup, drain tail) has a
            // high per-row cost from FIXED machinery amortizing over
            // fewer rows — an artifact, not noise. A bucket counts
            // only at ≥ half the stage's overall mean batch size.
            val totalRows = per.map(_._2).sum
            val totalBatches = per.map(_._3).sum
            val meanBatch =
              if (totalBatches == 0L) 0.0 else totalRows.toDouble / totalBatches
            val perRow = per.map { case (ms, rows, batches) =>
              if (rows >= MinRows && batches > 0 &&
                  rows.toDouble / batches >= 0.5 * meanBatch) ms / rows
              else -1.0
            }
            val clean = perRow.filter(_ > 0)
            if (clean.nonEmpty) {
              val floor = clean.min
              (0 until nBuckets).foreach(b =>
                if (perRow(b) > 0 && perRow(b) >= 2.0 * floor) stageFlags(b) += 1)
            }
          }
          val suspected = (0 until nBuckets).filter(b =>
            (probeFloor > 0 && probeMean(b) >= 0 && probeMean(b) >= 2.0 * probeFloor) ||
              stageFlags(b) >= 4)
          def fmt(a: Array[Double]) =
            a.map(v => f"$v%.1f").mkString("[", ",", "]")
          println(s"""{"probe":"chain_soak_sentinel","buckets":$nBuckets,"bucket_sec":${bucketSec.round},"kernel_ms":${fmt(probeMean)},"kernel_floor_ms":${f"$probeFloor%.1f"},"stage_flags":${stageFlags.mkString("[", ",", "]")},"window_suspected":${suspected.mkString("[", ",", "]")}}""")
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
