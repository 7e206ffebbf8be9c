package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables
import graft.model.OplogEntry

/** Streaming throughput benchmark for the engine's production path —
  * the Spark rendition of the reference's entire job
  * (`reference:src/main/java/org/flinkmon/main/MongoDBOplogTail.java:36-42`):
  *
  *   tailable source (file-modeled, `maxFilesPerTrigger` admission =
  *   the reference's 128-slot queue, `MongoDBOplogSource.java:58`)
  *   → O3 static filter → quorum dedup (O7, stateful)
  *   → apply-to-current-state (stateful LWW materialization)
  *
  * and reports end-to-end SOURCE rows/s plus per-micro-batch latency.
  * Batch queries measure the relational surface; this measures the one
  * axis a CDC engine actually ships — sustained change-stream
  * throughput through two chained stateful operators.
  *
  * Fixture: the sf events table fanned out ×`replicas` oplog copies
  * (one per simulated replica-set member), written as `files` JSON
  * files co-partitioned on the op hash `h` so every copy of an op
  * lands in the same file — quorum then resolves within each
  * micro-batch and the emitted count is exactly the op count,
  * independent of trigger pacing. Event times span the whole corpus
  * out of arrival order, so the watermark lateness must cover the full
  * span (no row may be late-dropped by the stateful operators — the
  * bench measures state-store work, not the drop fast-path).
  */
object StreamBench {

  final case class Result(
      inputRows: Long,
      appliedRows: Long,   // FINAL live materialized keys (LWW fold over all emissions, tombstones dropped) — batch-invariant, so it doubles as a file-vs-connector correctness cross-check
      emittedRows: Long,   // per-batch state-change emissions — depends on trigger pacing; diagnostic only
      batches: Int,
      elapsedSec: Double,
      rowsPerSec: Double,
      batchMsP50: Long,
      batchMsMax: Long)

  /** events → oplog-shaped JSON dir; returns the op count (pre-fanout).
    * Generation is setup, never timed. */
  def prepareFixture(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      files: Int = 96,
      replicas: Int = 3): Long = {
    import spark.implicits._
    val ev = Tables.load(spark, sfDir, "events")
    val hosts = array((1 to replicas).map(i => lit(s"r$i")): _*)
    val oplog = ev.select(
        $"ts",
        ($"event_id" % 1000).cast("int").as("tsInc"),
        $"event_id".as("h"),
        lit("i").as("op"),
        lit("bench.events").as("ns"),
        to_json(struct($"user_id".as("_id"), $"value".as("v"),
          unix_micros($"ts").as("t"))).as("o"),
        lit(null).cast("string").as("o2"))
      .withColumn("sourceHost", explode(hosts))
    // co-partition replica copies by op hash (see scaladoc)
    oplog.repartition(files, $"h").write.mode("overwrite").json(outDir)
    ev.count()
  }

  /** Sets session confs for the duration of `body` and ALWAYS restores
    * the prior values — including when stream construction or start()
    * throws (Bench catches streaming failures and keeps using the
    * session, so a leaked shuffle.partitions=4 or a disabled
    * stateful-operator check would silently poison every later query). */
  private def withSessionConf[T](
      spark: SparkSession, confs: Map[String, String])(body: => T): T = {
    val priors = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally priors.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The shared metering core: wires the production chain
    * (O3 filter → quorum dedup → LWW apply) onto `src`, drains it once
    * under the given trigger, and assembles the [[Result]] — one body
    * for both the file-stream and DSv2-connector modes so the
    * conf-scoping and metering can never diverge between them.
    *
    * State partitioning: each stateful operator commits one state
    * store per shuffle partition per micro-batch, a fixed ~100ms-class
    * fsync cost that dwarfs task work at local scale — measured on
    * this box (sf0.1, 300k rows, 12 batches): 32 partitions → 5.2k
    * rows/s, 8 → 18.7k, 4 → 37.9k (SCALING.md). So the streaming
    * query gets its own partition count, sized to STATE VOLUME (on a
    * 1000-executor cluster: hundreds+, so each store holds a bounded
    * shard of keys), not to the session's CPU-count default.
    *
    * Spark refuses chained stateful operators by default because an
    * upstream stateful op CAN emit rows older than watermark+lateness.
    * Here the lateness covers the whole corpus span (the watermark
    * never passes any event time), so no downstream row is ever late
    * and the chain is sound; the check is disabled for this query only.
    *
    * The progress-retention conf is raised for the run because
    * inputRows/batches are summed from `q.recentProgress`, whose buffer
    * is CAPPED at `numRecentProgressUpdates` (default 100) entries — a
    * probe run at mfpt=1 (96 data batches + stateful no-data batches)
    * would silently evict early entries and undercount. */
  private def meter(
      spark: SparkSession,
      src: org.apache.spark.sql.DataFrame,
      checkpointDir: String,
      depth: Int,
      lateness: String,
      statePartitions: Int,
      availableNow: Boolean): Result = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    withSessionConf(spark, Map(
      "spark.sql.shuffle.partitions" -> statePartitions.toString,
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled" -> "false",
      "spark.sql.streaming.numRecentProgressUpdates" -> "10000")) {
      val deduped = QuorumDedup(
        OplogPipeline.staticFilter(src)
          .withWatermark("ts", lateness)
          .as[OplogEntry],
        depth)
      val applied = OplogApply.currentState(deduped, lateness)

      val emittedRows = new java.util.concurrent.atomic.AtomicLong(0L)
      // The sink keeps only the 5 narrow key/clock/op fields per emission
      // (never the materialized `doc` payload — shipping it to the driver
      // would tax the timed region with payload-size-dependent work), and
      // the LWW fold over them runs AFTER the drain, outside the timing.
      // The latest emission per key IS the current state (currentState's
      // contract), so the folded live-key count equals the BATCH
      // materialization of the same input — invariant under trigger
      // pacing, unlike the raw emission count (round-5 finding: 17,931
      // file vs 14,050 connector for identical input).
      val chunks =
        new java.util.concurrent.ConcurrentLinkedQueue[Array[(String, String, Long, Int, String)]]()
      val t0 = System.nanoTime()
      val q = applied.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpointDir)
        .trigger(if (availableNow) Trigger.AvailableNow()
                 else Trigger.ProcessingTime("0 seconds"))
        .foreachBatch { (b: Dataset[OplogApply.DocState], _: Long) =>
          val rows = b.select($"ns", $"docId", $"tsUs", $"tsInc", $"op").collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3), r.getString(4)))
          emittedRows.addAndGet(rows.length.toLong)
          chunks.add(rows)
          ()
        }
        .start()
      // stop() unconditionally: idempotent on a terminated AvailableNow
      // query, and without it a throwing awaitTermination (e.g.
      // StreamingQueryException) would leak the failed query past
      // withSessionConf's conf restore
      try { if (availableNow) q.awaitTermination() else q.processAllAvailable() }
      finally { q.stop() }
      val elapsed = (System.nanoTime() - t0) / 1e9

      val progs = q.recentProgress.filter(_.numInputRows > 0)
      val inputRows = progs.map(_.numInputRows).sum
      val durs = progs.flatMap(p => Option(p.durationMs.get("triggerExecution")))
        .map(_.longValue).sorted
      val liveKeys = {
        import scala.jdk.CollectionConverters._
        val last = new scala.collection.mutable.HashMap[(String, String), (Long, Int, String)]()
        chunks.asScala.foreach(_.foreach { case (ns, id, ts, inc, op) =>
          val k = (ns, id)
          last.get(k) match {
            case Some((ots, oinc, _)) if ts < ots || (ts == ots && inc < oinc) => ()
            case _ => last(k) = (ts, inc, op)
          }
        })
        last.valuesIterator.count(_._3 != "d")
      }
      Result(
        inputRows = inputRows,
        appliedRows = liveKeys.toLong,
        emittedRows = emittedRows.get(),
        batches = progs.length,
        elapsedSec = elapsed,
        rowsPerSec = if (elapsed > 0) inputRows / elapsed else 0.0,
        batchMsP50 = if (durs.nonEmpty) durs(durs.length / 2) else 0L,
        batchMsMax = if (durs.nonEmpty) durs.last else 0L)
    }
  }

  /** Run the chain once over the fixture dir and meter it. The trigger
    * is AvailableNow so admission control (`maxFilesPerTrigger`) still
    * paces micro-batches but the query drains and terminates itself. */
  def run(
      spark: SparkSession,
      srcDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8,
      depth: Int = 3,
      lateness: String = "3650 days",
      statePartitions: Int = 4): Result = {
    val src = spark.readStream
      .schema(OplogEntry.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(srcDir)
    meter(spark, src, checkpointDir, depth, lateness, statePartitions,
      availableNow = true)
  }

  /** Connector-mode fixture: the SAME op stream written the way a
    * replica set actually presents it — one directory per replica-set
    * member (`root/s0/rN_port/` JSON files), each holding a FULL copy of
    * every op with itself as sourceHost. The DSv2 connector plans one
    * InputPartition per member and splits the admission budget
    * round-robin across them, so replica copies of one op can land in
    * DIFFERENT micro-batches — the cross-batch quorum-state path the
    * co-partitioned file fixture never exercises. */
  def prepareConnectorFixture(
      spark: SparkSession,
      sfDir: String,
      root: String,
      filesPerMember: Int = 32,
      replicas: Int = 3): Long = {
    import spark.implicits._
    val ev = Tables.load(spark, sfDir, "events")
    val oplog = ev.select(
      $"ts",
      ($"event_id" % 1000).cast("int").as("tsInc"),
      $"event_id".as("h"),
      lit("i").as("op"),
      lit("bench.events").as("ns"),
      to_json(struct($"user_id".as("_id"), $"value".as("v"),
        unix_micros($"ts").as("t"))).as("o"),
      lit(null).cast("string").as("o2"))
    (1 to replicas).foreach { i =>
      oplog.withColumn("sourceHost", lit(s"r$i"))
        .repartition(filesPerMember)
        .write.mode("overwrite")
        .json(graft.sources.OplogConnector.memberDir(root, "s0", s"r$i", 27017 + i))
    }
    ev.count()
  }

  /** [[run]]'s chain over the native DSv2 connector source instead of
    * the file stream (same filter → quorum → apply, same metering; the
    * connector doesn't implement AvailableNow semantics, so the drain
    * is ProcessingTime(0) + processAllAvailable + stop). */
  def runConnector(
      spark: SparkSession,
      root: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8,
      replicas: Int = 3,
      depth: Int = 3,
      lateness: String = "3650 days",
      statePartitions: Int = 4): Result = {
    val topology = (1 to replicas).map(i => s"r$i:${27017 + i}")
      .mkString("s0/", ",", "")
    val src = spark.readStream
      .format("graft.sources.OplogSourceProvider")
      .option("topology", topology)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(root)
    meter(spark, src, checkpointDir, depth, lateness, statePartitions,
      availableNow = false)
  }

  /** Connector fixture + metered run in a scratch dir. */
  def benchConnector(
      spark: SparkSession,
      sfDir: String,
      scratch: String,
      filesPerMember: Int = 32,
      replicas: Int = 3,
      maxFilesPerTrigger: Int = 8): (Result, Long) = {
    val root = s"$scratch/members"
    val ops = prepareConnectorFixture(spark, sfDir, root, filesPerMember, replicas)
    val res = runConnector(spark, root, s"$scratch/ckpt_conn", maxFilesPerTrigger, replicas)
    (res, ops)
  }

  /** SERVING-PATH meter: the RAG retrieve→MMR chain
    * ([[MmrServeStream.serve]]) driven by a paced query-vector stream —
    * the second axis a deployment actually ships beside CDC ingest:
    * online ANN serving. Queries are the sf embeddings fanned out
    * ×`fanout` with DISTINCT qids (duplicate qids inside one batch
    * would pool their candidates and break the per-query kernel's
    * k-window), written as `files` parquet files and admitted
    * `maxFilesPerTrigger` at a time; every batch probes nprobe/C of the
    * persisted static side, joins, and re-ranks per query. Reported:
    * queries/s over the drain + per-micro-batch latency percentiles —
    * the numbers an SLA conversation needs (the CDC meter's rows/s says
    * nothing about serve latency). The static-side persist materializes
    * in the FIRST batch, so p50 reflects steady state while max
    * includes the cold fill (deliberate: that is what a rollout sees).
    * `statePartitions` sizes the serve shuffle (stream-static join +
    * per-query group exchange) exactly as the CDC meter sizes its state
    * stores — the SCALING.md sweep dial. */
  def benchServe(
      spark: SparkSession,
      sfDir: String,
      scratch: String,
      files: Int = 24,
      fanout: Int = 4,
      maxFilesPerTrigger: Int = 4,
      nprobe: Int = 2,
      statePartitions: Int = 8): Result = {
    import spark.implicits._
    val dirQ = s"$scratch/serve_queries"
    val e = Tables.load(spark, sfDir, "embeddings").select($"vec_id", $"embedding")
    // Stride by max(vec_id)+1, not count(): a sparse vec_id domain (max >= n)
    // would otherwise collide replica qids, pooling their candidates across
    // the per-query MMR k-window and silently under-reporting served queries.
    val stride = e.agg(max($"vec_id").cast("long")).as[Long].head() + 1L
    val fanned = e.crossJoin(
        broadcast((0 until fanout).toDF("rep")))
      .select(($"vec_id" + $"rep".cast("long") * stride).as("vec_id"), $"embedding")
    fanned.repartition(files).write.mode("overwrite").parquet(dirQ)
    withSessionConf(spark, Map(
      "spark.sql.shuffle.partitions" -> statePartitions.toString,
      "spark.sql.streaming.numRecentProgressUpdates" -> "10000")) {
      val src = spark.readStream.schema(fanned.schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .parquet(dirQ)
      val hits = MmrServeStream.serve(src, sfDir, nprobe = nprobe)
      val hitRows = new java.util.concurrent.atomic.AtomicLong(0L)
      val served = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val t0 = System.nanoTime()
      val q = hits.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$scratch/ckpt_serve")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[MmrHit], _: Long) =>
          val qids = b.select($"qid").distinct().as[Long].collect()
          qids.foreach(served.add)
          hitRows.addAndGet(b.count())
          ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
      val elapsed = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      val inputRows = progs.map(_.numInputRows).sum
      val durs = progs.flatMap(p => Option(p.durationMs.get("triggerExecution")))
        .map(_.longValue).sorted
      Result(
        inputRows = inputRows,
        appliedRows = served.size().toLong,
        emittedRows = hitRows.get(),
        batches = progs.length,
        elapsedSec = elapsed,
        rowsPerSec = if (elapsed > 0) inputRows / elapsed else 0.0,
        batchMsP50 = if (durs.nonEmpty) durs(durs.length / 2) else 0L,
        batchMsMax = if (durs.nonEmpty) durs.last else 0L)
    }
  }

  /** NEAR-DUP ADMISSION meter: the live MinHash-LSH gate
    * ([[NearDupStream.flag]]) fed the sf documents corpus as a paced
    * file stream — the ingest-side dedup axis beside the CDC chain and
    * the serve path. Reported: documents/s over the drain (sketch +
    * band explode + bucket-state rendezvous + per-batch verdict fold
    * all inside the meter), flagged count (the corpus's real near-dup
    * mass — sanity: > 0, planted pairs exist at every sf), and batch
    * latency percentiles. `statePartitions` sizes the (band, band-hash)
    * keyed exchange — the same dial the CDC meter sweeps. */
  def benchNearDup(
      spark: SparkSession,
      sfDir: String,
      scratch: String,
      files: Int = 16,
      maxFilesPerTrigger: Int = 4,
      statePartitions: Int = 8): Result = {
    import spark.implicits._
    benchNearDupDocs(spark,
      Tables.load(spark, sfDir, "documents").select($"doc_id", $"text"),
      scratch, files, maxFilesPerTrigger, statePartitions)
  }

  /** [[benchNearDup]] over an explicit corpus frame — the scale probe
    * feeds replica corpora with per-replica-distinct shingles. */
  def benchNearDupDocs(
      spark: SparkSession,
      docs0: DataFrame,
      scratch: String,
      files: Int = 16,
      maxFilesPerTrigger: Int = 4,
      statePartitions: Int = 8): Result = {
    import spark.implicits._
    val dirD = s"$scratch/neardup_docs"
    val docs = docs0.select($"doc_id", $"text")
    docs.repartition(files).write.mode("overwrite").parquet(dirD)
    withSessionConf(spark, Map(
      "spark.sql.shuffle.partitions" -> statePartitions.toString,
      "spark.sql.streaming.numRecentProgressUpdates" -> "10000")) {
      val src = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .parquet(dirD)
      val flagged = new java.util.concurrent.atomic.AtomicLong(0L)
      val bandRows = new java.util.concurrent.atomic.AtomicLong(0L)
      val t0 = System.nanoTime()
      val q = NearDupStream.flag(src)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$scratch/ckpt_neardup")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[NearDupBand], _: Long) =>
          val v = NearDupStream.fold(b.toDF()).cache()
          flagged.addAndGet(v.filter(col("dup_of").isNotNull).count())
          bandRows.addAndGet(b.count())
          v.unpersist()
          ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
      val elapsed = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      val inputRows = progs.map(_.numInputRows).sum
      val durs = progs.flatMap(p => Option(p.durationMs.get("triggerExecution")))
        .map(_.longValue).sorted
      Result(
        inputRows = inputRows,
        appliedRows = flagged.get(),
        emittedRows = bandRows.get(),
        batches = progs.length,
        elapsedSec = elapsed,
        rowsPerSec = if (elapsed > 0) inputRows / elapsed else 0.0,
        batchMsP50 = if (durs.nonEmpty) durs(durs.length / 2) else 0L,
        batchMsMax = if (durs.nonEmpty) durs.last else 0L)
    }
  }

  /** Fixture + run in a scratch dir; returns the result and the op
    * count so callers can sanity-check emitted == ops. */
  def bench(
      spark: SparkSession,
      sfDir: String,
      scratch: String,
      files: Int = 96,
      replicas: Int = 3,
      maxFilesPerTrigger: Int = 8,
      statePartitions: Int = 4): (Result, Long) = {
    val srcDir = s"$scratch/oplog"
    val ops = prepareFixture(spark, sfDir, srcDir, files, replicas)
    val res = run(spark, srcDir, s"$scratch/ckpt", maxFilesPerTrigger,
      statePartitions = statePartitions)
    (res, ops)
  }
}
