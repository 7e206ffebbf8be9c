package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.PipelineE2E

/** SCALING probe for the composed ingest→serve chain ([[PipelineE2E]]):
  * runs the WHOLE system — sharded CDC ingest → apply → curation →
  * budget admission → FFD layout → index publish → vector serve — at
  * 1× and R× the sf corpus and prints one JSON line per run with
  * per-stage seconds + rows and the end-to-end docs/s. The question it
  * answers for SCALING.md: does composing the audited stages introduce
  * any super-linear term the per-stage probes can't see? (Expected: no —
  * each handoff is a directory, each stage's cost is its own audited
  * cost.)
  *
  * Replication keeps text content DISTINCT per replica (a trailing
  * ` rN` marker) so the curation dedup stage doesn't collapse the
  * scale-up corpus back to 1×; caps and budget scale with R so every
  * stage keeps a proportional survivor stream.
  *
  * Usage: `runMain graft.tools.PipelineE2EProbe [live] [reps...]`
  * (default `1 20`), sf dir from SPARK_GRAFT_SF_DIR (default sf0.001).
  * `live` switches to the concurrent-chain FRESHNESS measurement:
  * all stages up, one burst wave, clock = wave-landed → all-packed.
  */
object PipelineE2EProbe {

  private[tools] def replicate(docs: DataFrame, k: Int): DataFrame =
    if (k == 1) docs
    else {
      val stride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      docs.select(col("doc_id"), col("source"), col("lang"), col("text"),
          explode(sequence(lit(0), lit(k - 1))).as("rep"))
        .select((col("doc_id") + col("rep") * stride).as("doc_id"),
          col("source"), col("lang"),
          when(col("rep") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" r"), col("rep"))).as("text"))
    }

  /** LIVE freshness run for one replication factor: every stage up
    * concurrently, the whole corpus dropped as ONE oplog wave, and the
    * clock measures wave-landed → everything-packed (the end-to-end
    * freshness a live deployment cares about, vs the sequential mode's
    * per-stage drain cost). */
  private def liveOnce(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, root: String, budget: Long,
      nearDup: Boolean = false): (Double, Long, Long) = {
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val horizon = s"${maxId + 60L} seconds"   // covers cross-publisher skew
    val gated = docs.filter(
      size(graft.functions.TextFns.tokens(col("text"))) >= graft.streaming.CurationStream.QualityMinTokens)
    val base = graft.operators.Pipeline.budgetBaseFrom(
      gated.select(col("doc_id"), col("lang"), col("text"))).localCheckpoint()
    val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, budget)
    val chain = PipelineE2E.startLive(spark, root,
      hist.localCheckpoint(), cuts.localCheckpoint(),
      cap = Int.MaxValue / 2,
      applyLateness = horizon, curationDelay = horizon,
      nearDup = nearDup)
    try {
      PipelineE2E.writeOplogWave(spark, docs, root, PipelineE2E.defaultTopology,
        "w1", shardKey = Some(PipelineE2E.shardByLang(2)))
      val t0 = System.nanoTime()
      chain.drain()
      val sec = (System.nanoTime() - t0) / 1e9
      val admitted = spark.read.schema(PipelineE2E.admitSchema)
        .parquet(s"$root/admitted").count()
      val packed = spark.read.json(s"$root/layout/ffd").count()
      (sec, admitted, packed)
    } finally chain.stop()
  }

  /** Co-tenancy run: the live chain drains an oplog wave WHILE the
    * serve-path bench answers queries in the same JVM — the number a
    * deployment actually cares about ("what happens to serve p50 when
    * ingest bursts?") that neither meter shows alone. Prints the
    * under-load serve row, then a solo serve row from the same warm
    * JVM for the delta. */
  private def cotenantOnce(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, root: String, sfDir: String, budget: Long,
      fair: Boolean = false): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val horizon = s"${maxId + 60L} seconds"
    val gated = docs.filter(
      size(graft.functions.TextFns.tokens(col("text"))) >= graft.streaming.CurationStream.QualityMinTokens)
    val base = graft.operators.Pipeline.budgetBaseFrom(
      gated.select(col("doc_id"), col("lang"), col("text"))).localCheckpoint()
    val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, budget)
    // FAIR isolation: the chain's queries start in an 'ingest' pool and
    // the serve bench's query in a 'serve' pool (GraftSession.inPool —
    // the micro-batch thread inherits the pool of the thread that
    // STARTED the query); under FAIR mode each pool gets an equal core
    // share instead of FIFO head-of-line
    def inPoolIf[T](pool: String)(body: => T): T =
      if (fair) graft.GraftSession.inPool(spark, pool)(body) else body
    val chain = inPoolIf("ingest") {
      PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(),
        cap = Int.MaxValue / 2,
        applyLateness = horizon, curationDelay = horizon)
    }
    try {
      PipelineE2E.writeOplogWave(spark, docs, root, PipelineE2E.defaultTopology,
        "w1", shardKey = Some(PipelineE2E.shardByLang(2)))
      val t0 = System.nanoTime()
      val drain = Future { chain.drain(); (System.nanoTime() - t0) / 1e9 }
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-cotenant-serve").toFile.getAbsolutePath
      val under = inPoolIf("serve") {
        graft.streaming.StreamBench.benchServe(spark, sfDir, scratch) }
      val freshness = Await.result(drain, Duration.Inf)
      val tag = if (fair) "_fair" else ""
      println(f"""{"probe":"pipeline_e2e_cotenant$tag","docs":${docs.count()},"chain_freshness_sec":$freshness%.2f,"serve_under_load":{"queries_per_sec":${under.rowsPerSec}%.0f,"batch_ms_p50":${under.batchMsP50},"batch_ms_max":${under.batchMsMax}}}""")
      // solo baseline from the same warm JVM, chain idle
      val scratch2 = java.nio.file.Files
        .createTempDirectory("graft-solo-serve").toFile.getAbsolutePath
      val solo = inPoolIf("serve") {
        graft.streaming.StreamBench.benchServe(spark, sfDir, scratch2) }
      println(f"""{"probe":"pipeline_e2e_cotenant_solo","serve_solo":{"queries_per_sec":${solo.rowsPerSec}%.0f,"batch_ms_p50":${solo.batchMsP50},"batch_ms_max":${solo.batchMsMax}}}""")
      Seq(scratch, scratch2).foreach(d =>
        new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
    } finally chain.stop()
  }

  /** SUSTAINED-rate stability: the live chain (near-dup gate ON — the
    * full production shape) fed `waves` successive equal waves of
    * FRESH content (per-wave doc-id offset + per-wave token prefix, so
    * nothing dedups across waves and every stage's corpus-linear state
    * actually grows), each wave drained to quiescence before the next.
    * Two questions a single-burst freshness number can't answer:
    *
    *  1. STABILITY — is per-wave drain time flat in wave count, or
    *     does accumulated state (LWW registers, gate buckets, curation
    *     dedup keys — all corpus-linear by design) leak into per-batch
    *     cost (the HDFSBacked store re-serializes resident state per
    *     commit, so corpus-linear state means wave-linear freshness
    *     UNLESS per-wave deltas dominate)?
    *  2. WHO grows — per-stage state rows/bytes straight from each
    *     query's `lastProgress.stateOperators` after every wave: the
    *     measured growth ledger (which stages are corpus-linear, which
    *     are O(streams) flat).
    *
    * One JSON line per wave: freshness, per-wave admitted/packed
    * deltas, and the per-stage state ledger. */
  private def sustainOnce(spark: org.apache.spark.sql.SparkSession,
      template: DataFrame, root: String, waves: Int, budget: Long,
      applyProvider: Option[String] = None,
      gateTtl: Boolean = false,
      serve: Boolean = false, fair: Boolean = false,
      sfDir: String = "",
      chainPartitions: Option[Int] = None,
      gateProvider: Option[String] = None): Unit = {
    val stride = template.agg(max(col("doc_id"))).head().getLong(0) + 1L
    def waveDocs(w: Int): DataFrame =
      template.select((col("doc_id") + lit(w.toLong * stride)).as("doc_id"),
        col("source"), col("lang"),
        array_join(transform(split(col("text"), " "),
          t => concat(lit(s"w${w}_"), t)), " ").as("text"))
    // lateness must cover within-wave cross-publisher skew (ids span
    // `stride` seconds of event time per wave); waves only move event
    // time forward so cross-wave needs nothing extra
    val horizon = s"${stride + 60L} seconds"
    val gated = template.filter(
      size(graft.functions.TextFns.tokens(col("text"))) >= graft.streaming.CurationStream.QualityMinTokens)
    val base = graft.operators.Pipeline.budgetBaseFrom(
      gated.select(col("doc_id"), col("lang"), col("text"))).localCheckpoint()
    // cuts from the TEMPLATE distribution (deployment-true: parameters
    // from the previous snapshot); above-cut docs admit unboundedly, so
    // every wave admits the same mass under fixed cuts
    val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, budget)
    def inPoolIf[T](pool: String)(body: => T): T =
      if (fair) graft.GraftSession.inPool(spark, pool)(body) else body
    val chain = inPoolIf("ingest") {
      PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(),
        cap = Int.MaxValue / 2,
        applyLateness = horizon, curationDelay = horizon,
        nearDup = true, applyProvider = applyProvider,
        // ttl = 2 waves of event time (ids span `stride` seconds/wave):
        // buckets idle ≥ 2 waves expire, so gate state should PLATEAU at
        // the ttl window's corpus instead of growing wave-linear
        nearDupTtlMs = if (gateTtl) Some(2L * stride * 1000L) else None,
        chainShufflePartitions = chainPartitions,
        gateProvider = gateProvider)
    }
    val nShards = PipelineE2E.defaultTopology.size
    val labels = (0 until nShards).map(i => s"ingest$i") ++
      Seq("apply", "curate", "neardup", "budget", "pack")
    try {
      var prevAdmitted = 0L
      var prevPacked = 0L
      (1 to waves).foreach { w =>
        val docs = waveDocs(w).localCheckpoint()
        val n = docs.count()
        PipelineE2E.writeOplogWave(spark, docs, root, PipelineE2E.defaultTopology,
          s"w$w", shardKey = Some(PipelineE2E.shardByLang(2)))
        val t0 = System.nanoTime()
        // co-tenant form: the serve bench answers queries WHILE this
        // wave drains (drain on a Future, serve in its own pool) —
        // per-wave serve q/s under STEADY ingest, not a one-off burst
        val (sec, serveRow) =
          if (!serve) { chain.drain(); ((System.nanoTime() - t0) / 1e9, "") }
          else {
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration.Duration
            import scala.concurrent.ExecutionContext.Implicits.global
            val drainF = Future { chain.drain(); (System.nanoTime() - t0) / 1e9 }
            val scratch = java.nio.file.Files
              .createTempDirectory(s"graft-sustain-serve-$w").toFile.getAbsolutePath
            val r = inPoolIf("serve") {
              graft.streaming.StreamBench.benchServe(spark, sfDir, scratch) }
            val freshness = Await.result(drainF, Duration.Inf)
            new scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
            (freshness,
              f""","serve":{"queries_per_sec":${r.rowsPerSec}%.0f,"batch_ms_p50":${r.batchMsP50},"batch_ms_max":${r.batchMsMax}}""")
          }
        val admitted = spark.read.schema(PipelineE2E.admitSchema)
          .parquet(s"$root/admitted").count()
        val packed = spark.read.json(s"$root/layout/ffd").count()
        val state = chain.queries.zip(labels).map { case (q, l) =>
          val ops = Option(q.lastProgress).map(_.stateOperators.toSeq).getOrElse(Seq.empty)
          s""""$l":{"rows":${ops.map(_.numRowsTotal).sum},"bytes":${ops.map(_.memoryUsedBytes).sum}}"""
        }.mkString(",")
        val prov = applyProvider.getOrElse("hdfs")
        println(f"""{"probe":"chain_sustain","apply_provider":"$prov","gate_ttl":$gateTtl,"fair":$fair,"wave":$w,"docs":$n,"freshness_sec":$sec%.2f,"admitted_wave":${admitted - prevAdmitted},"packed_wave":${packed - prevPacked},"state":{$state}$serveRow}""")
        prevAdmitted = admitted
        prevPacked = packed
      }
    } finally chain.stop()
  }

  /** OPEN-LOOP stability (the λ < μ measurement the drain-clocked
    * sustain mode can't make): waves injected on a FIXED wall-clock
    * cadence with no drain barrier — the chain's continuous
    * micro-batches pipeline across stages — while a poller snapshots
    * the packed layout every ~2 s. Post-hoc, each wave's LAG =
    * first-poll-where-its-packed-count-reached-final − its injection
    * time. A stable system (arrival rate under capacity) shows flat
    * lag; past capacity, lag grows wave over wave — the knee is the
    * chain's sustainable throughput in deployment (open-loop) terms. */
  private def rateOnce(spark: org.apache.spark.sql.SparkSession,
      template: DataFrame, root: String, waves: Int, periodSec: Int,
      budget: Long, chainPartitions: Option[Int] = None,
      gateParts: Option[Int] = None,
      gateProvider: Option[String] = None,
      gateTtl: Boolean = false,
      serveChain: Option[String] = None,
      lww: Boolean = false,
      triggerSec: Option[Int] = None): Unit = {
    val stride = template.agg(max(col("doc_id"))).head().getLong(0) + 1L
    // serve-chain mode: the oplog payload carries a synthetic 64-d
    // embedding per doc (deterministic in doc_id — the serve stage is
    // idle, the carry cost is what's being priced into the baseline)
    def waveDocs(w: Int): DataFrame = {
      val d = template.select(
        (col("doc_id") + lit(w.toLong * stride)).as("doc_id"),
        col("source"), col("lang"),
        array_join(transform(split(col("text"), " "),
          t => concat(lit(s"w${w}_"), t)), " ").as("text"))
      if (serveChain.isDefined)
        d.withColumn("embedding",
          expr("transform(sequence(1, 64), i -> cast((doc_id % 97 + 1) * i as double))"))
      else d
    }
    val horizon = s"${stride + 60L} seconds"
    val gated = template.filter(
      size(graft.functions.TextFns.tokens(col("text"))) >= graft.streaming.CurationStream.QualityMinTokens)
    val base = graft.operators.Pipeline.budgetBaseFrom(
      gated.select(col("doc_id"), col("lang"), col("text"))).localCheckpoint()
    val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, budget)
    // instrumentation: every chain query's full progress history (the
    // default 100-entry buffer evicts early batches over a long
    // open-loop run); the chain's own shuffle/state partition count is
    // startLive's chainShufflePartitions dial. The raised retention
    // must OUTLIVE the run: ProgressReporter re-reads
    // streamingProgressRetention from the original session's conf on
    // EVERY progress append (spark-sql 4.1.2 addNewProgress), so
    // restoring it as soon as startLive returns would silently put the
    // buffer back at 100 and truncate the binding-stage report's
    // window — the restore lives in the outer finally with chain.stop.
    val priorProgress =
      spark.conf.getOption("spark.sql.streaming.numRecentProgressUpdates")
    val progressRetention = 10000
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      progressRetention.toString)
    try {
    val chain = PipelineE2E.startLive(spark, root,
      hist.localCheckpoint(), cuts.localCheckpoint(),
      cap = Int.MaxValue / 2,
      applyLateness = horizon, curationDelay = horizon,
      nearDup = true, chainShufflePartitions = chainPartitions,
      serveFromChain = serveChain, nearDupLww = lww,
      gateShufflePartitions = gateParts, gateProvider = gateProvider,
      // ttl = 2 waves of event time, the sustain protocol's bound: the
      // gate's resident band state plateaus at the ttl window instead
      // of growing corpus-linear — the dial for the growth term the
      // 400k-doc over-capacity point names
      nearDupTtlMs = if (gateTtl) Some(2L *
        (template.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 1000L)
      else None,
      // the trigger-size amortization dial (round 17): N-second
      // processing-time triggers on every stage — fewer, larger
      // batches at the same offered rate
      chainTriggerSec = triggerSec)
    try {
      // pre-render every wave TO DISK so injection is a pure file move —
      // the injector holds its cadence instead of competing with the
      // chain for Spark cores (the round-12 first-measurement confound)
      val rendered = (1 to waves).map { w =>
        w -> PipelineE2E.renderOplogWave(spark, waveDocs(w),
          PipelineE2E.defaultTopology, s"w$w",
          shardKey = Some(PipelineE2E.shardByLang(2)))
      }.toMap
      def packedPerWave(): Map[Long, Long] =
        scala.util.Try {
          spark.read.json(s"$root/layout/ffd")
            .select((col("data.doc_id") / stride).cast("long").as("w"))
            .groupBy("w").count()
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        }.getOrElse(Map.empty)
      val t0 = System.nanoTime()
      def now() = (System.nanoTime() - t0) / 1e9
      val snaps = Seq.newBuilder[(Double, Map[Long, Long])]
      // DEDICATED injector thread: injection is pure file moves, so a
      // thread of its own holds the cadence exactly however long the
      // poller's snapshot job takes — the round-15 first-protocol
      // confound (inject-inside-the-poll-loop floors the cadence at
      // the poll interval + one snapshot job, ~2.1 s/wave) removed;
      // the chain, not the probe, is again the measured element.
      val injected = new java.util.concurrent.ConcurrentHashMap[Int, Double]()
      val injector = new Thread(() => {
        (1 to waves).foreach { w =>
          val target = (w - 1).toDouble * periodSec
          while (now() < target) Thread.sleep(10)
          PipelineE2E.injectStagedWave(rendered(w), root,
            PipelineE2E.defaultTopology, s"w$w")
          injected.put(w, now())
          ()
        }
      }, "rate-injector")
      injector.setDaemon(true)
      injector.start()
      // poll; then settle (~12 s of identical snapshots after the
      // last injection)
      while (injector.isAlive || {
          val s = snaps.result(); s.length < 8 ||
            s.takeRight(8).map(_._2).distinct.size > 1
        }) {
        snaps += ((now(), packedPerWave()))
        Thread.sleep(1500)
      }
      injector.join()
      // ground truth: a full drain after the quiet period — if it adds
      // rows, the quiet window lied and the affected waves get the
      // post-drain time as their (pessimistic) completion
      chain.drain()
      snaps += ((now(), packedPerWave()))
      val all = snaps.result()
      val fin = all.last._2
      (1 to waves).foreach { w =>
        val target = fin.getOrElse(w.toLong, 0L)
        val done = all.find { case (_, m) => m.getOrElse(w.toLong, 0L) >= target }
          .map(_._1).getOrElse(Double.NaN)
        val injAt = injected.get(w)
        val lag = done - injAt
        println(f"""{"probe":"chain_rate","period_sec":$periodSec,"trigger_sec":${triggerSec.getOrElse(0)},"wave":$w,"injected_at":$injAt%.1f,"packed":$target,"lag_sec":$lag%.1f}""")
      }
      // ---- the BINDING-STAGE report: which stage consumed the run's
      // wall clock, and which stage's per-batch cost GROWS. Per stage:
      // busy fraction (Σ triggerExecution / run window), batch count,
      // mean data-batch ms split into its dominant terms (addBatch =
      // plan+execute, stateCommit = state-store commit, walCommit =
      // offset log), and the first-third vs last-third mean — a flat
      // stage is a throughput term, a growing one is the lag-growth
      // term the cadence-3 knee measured (1.5 s/wave). ----
      val windowSec = all.last._1
      val nShards = PipelineE2E.defaultTopology.size
      val labels = (0 until nShards).map(i => s"ingest$i") ++
        Seq("apply", "curate") ++
        (if (lww) Seq("neardupreg", "neardup") else Seq("neardup")) ++
        Seq("budget", "pack") ++
        (if (serveChain.isDefined) Seq("serve") else Seq.empty)
      chain.queries.zip(labels).foreach { case (q, l) =>
        val ps = q.recentProgress.toSeq
        // the report is only trustworthy over the FULL window — if the
        // buffer filled, early batches were evicted and busy_pct /
        // first3rd are computed over a truncated suffix; say so loudly
        if (ps.length >= progressRetention)
          println(s"""{"probe":"chain_rate_stage_warn","stage":"$l","warn":"progress buffer filled (${ps.length}) — window truncated"}""")
        def dur(p: org.apache.spark.sql.streaming.StreamingQueryProgress,
            k: String): Long =
          Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
        val busyMs = ps.map(dur(_, "triggerExecution")).sum
        val data = ps.filter(_.numInputRows > 0)
        val rows = data.map(_.numInputRows).sum
        val commitMs = data.map(dur(_, "commitOffsets")).sum +
          data.map(dur(_, "walCommit")).sum
        val addMs = data.map(dur(_, "addBatch")).sum
        val trig = data.map(dur(_, "triggerExecution"))
        def mean(xs: Seq[Long]): Long =
          if (xs.isEmpty) 0L else xs.sum / xs.length
        val third = math.max(1, trig.length / 3)
        println(f"""{"probe":"chain_rate_stage","period_sec":$periodSec,"stage":"$l","busy_pct":${(100.0 * busyMs / math.max(1e-9, windowSec * 1000)).round},"batches":${ps.length},"data_batches":${data.length},"rows":$rows,"batch_ms_mean":${mean(trig)},"batch_ms_first3rd":${mean(trig.take(third))},"batch_ms_last3rd":${mean(trig.takeRight(third))},"add_batch_ms":$addMs,"offset_commit_ms":$commitMs}""")
      }
    } finally chain.stop()
    } finally priorProgress match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.numRecentProgressUpdates")
    }
  }

  def main(args: Array[String]): Unit = {
    val sustain = args.headOption.contains("sustain")
    val fair = args.headOption.contains("cotenantfair") ||
      (sustain && args.contains("fair"))
    val cotenant = args.headOption.contains("cotenantfair") ||
      args.headOption.contains("cotenant")
    val liveDup = args.headOption.contains("livedup")
    val live = liveDup || args.headOption.contains("live")
    val repArgs =
      if (live || cotenant || sustain || args.headOption.contains("rate"))
        args.drop(1) else args
    val numArgs = repArgs.filter(_.forall(_.isDigit))
    val reps = if (numArgs.nonEmpty) numArgs.map(_.toInt).toSeq else Seq(1, 20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark =
      if (fair) graft.GraftSession.localFair() else graft.GraftSession.local()
    try {
      val base = graft.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("text"))
      if (args.headOption.contains("rate")) {
        // args after 'rate': [periodSec] [waves] [rep] [chainPartitions]
        // [gateParts] [rocksgate] [ttl] [servechain] [lww] (default
        // 20 8 4, session-default partitions, gate on the chain dial /
        // session store, unbounded; `servechain` adds the embedding
        // carry + idle serve stage, `lww` — implies servechain — swaps
        // the gate for the update-aware two-query form: A/B the two for
        // the LWW gate's capacity fee at the same chain shape)
        val nArgs = repArgs.filterNot(Set("rocksgate", "ttl", "servechain", "lww"))
          .filterNot(_.startsWith("trig"))
        // trigN (e.g. trig4): the trigger-size amortization dial
        val trigSec = repArgs.collectFirst {
          case a if a.startsWith("trig") && a.drop(4).nonEmpty &&
            a.drop(4).forall(_.isDigit) => a.drop(4).toInt }
        val period = nArgs.lift(0).map(_.toInt).getOrElse(20)
        val nWaves = nArgs.lift(1).map(_.toInt).getOrElse(8)
        val rep = nArgs.lift(2).map(_.toInt).getOrElse(4)
        val parts = nArgs.lift(3).map(_.toInt)
        val gateParts = nArgs.lift(4).map(_.toInt)
        val gateProv =
          if (repArgs.contains("rocksgate")) Some("rocksdb") else None
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-e2e-rate").toFile.getAbsolutePath
        val lww = repArgs.contains("lww")
        val serveChain =
          if (lww || repArgs.contains("servechain"))
            Some(s"$sfDir/embeddings.parquet")
          else None
        try rateOnce(spark, replicate(base, rep).localCheckpoint(),
          root, nWaves, period, 2000L * rep, chainPartitions = parts,
          gateParts = gateParts, gateProvider = gateProv,
          gateTtl = repArgs.contains("ttl"),
          serveChain = serveChain, lww = lww, triggerSec = trigSec)
        finally {
          new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
        }
      } else if (sustain) {
        // args after 'sustain': [waves] [rep] [chainPartitions]
        // [rocksapply] [rocksgate] [ttl] [serve] [fair] (default 8
        // waves at 4×, session-default partitions, apply and gate on
        // the session default store, gate unbounded, no co-tenant
        // serve, FIFO)
        val sArgs = repArgs.filterNot(
          Set("rocksapply", "rocksgate", "ttl", "serve", "fair"))
        val applyProv =
          if (repArgs.contains("rocksapply")) Some("rocksdb") else None
        val gateProv =
          if (repArgs.contains("rocksgate")) Some("rocksdb") else None
        val waves = sArgs.headOption.map(_.toInt).getOrElse(8)
        val rep = sArgs.drop(1).headOption.map(_.toInt).getOrElse(4)
        val parts = sArgs.drop(2).headOption.map(_.toInt)
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-e2e-sustain").toFile.getAbsolutePath
        try sustainOnce(spark, replicate(base, rep).localCheckpoint(),
          root, waves, 2000L * rep, applyProvider = applyProv,
          gateTtl = repArgs.contains("ttl"),
          serve = repArgs.contains("serve"), fair = fair, sfDir = sfDir,
          chainPartitions = parts, gateProvider = gateProv)
        finally {
          new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
        }
      } else if (cotenant) {
        reps.foreach { k =>
          val root = java.nio.file.Files
            .createTempDirectory(s"graft-e2e-cot-x$k").toFile.getAbsolutePath
          try cotenantOnce(spark, replicate(base, k).localCheckpoint(),
            root, sfDir, 2000L * k, fair = fair)
          finally {
            new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
          }
        }
      } else if (live) {
        reps.foreach { k =>
          val root = java.nio.file.Files
            .createTempDirectory(s"graft-e2e-live-x$k").toFile.getAbsolutePath
          try {
            val docs = replicate(base, k).localCheckpoint()
            val n = docs.count()
            val (sec, admitted, packed) = liveOnce(spark, docs, root, 2000L * k,
              nearDup = liveDup)
            println(s"""{"probe":"pipeline_e2e_live${if (liveDup) "_neardup" else ""}","rep":$k,"docs":$n,""" +
              s""""freshness_sec":${f"$sec%.2f"},"docs_per_sec":${f"${n / sec}%.1f"},""" +
              s""""admitted":$admitted,"packed":$packed}""")
          } finally {
            new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
          }
        }
      } else reps.foreach { k =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-e2e-x$k").toFile.getAbsolutePath
        try {
          val docs = replicate(base, k).localCheckpoint()
          val n = docs.count()
          val stages = PipelineE2E.run(spark, docs, root, sfDir,
            cap = 18 * k, budget = 2000L * k, nprobe = 2)
          val total = stages.map(_.seconds).sum
          val chain = stages.filter(_.name != "fixture").map(_.seconds).sum
          val detail = stages.map(s =>
            s""""${s.name}":{"sec":${f"${s.seconds}%.2f"},"rows":${s.rowsOut}}""").mkString(",")
          println(s"""{"probe":"pipeline_e2e","rep":$k,"docs":$n,""" +
            s""""chain_sec":${f"$chain%.2f"},"total_sec":${f"$total%.2f"},""" +
            s""""docs_per_sec":${f"${n / chain}%.1f"},$detail}""")
        } finally {
          new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
        }
      }
    } finally spark.stop()
  }
}
