package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.OplogEntry
import graft.streaming.ShardTopology.ShardSet

/** THE COMPOSED INGEST→SERVE CHAIN — every stage of the engine run as
  * ONE system, the flagship end-to-end probe the per-stage specs and
  * benches only exercise in isolation:
  *
  *   sharded CDC ingest (O1/O2/O7/O9: per-shard tailable source →
  *   static filter → replica-quorum dedup → idempotent index sink)
  *     → APPLY (the oplog index read back as a stream, LWW-folded into
  *       the materialized document store)
  *     → STREAMING CURATION (gate → content dedup → per-source cap →
  *       split, [[CurationStream]])
  *     → BUDGET ADMISSION (broadcast histogram/cut static side from
  *       the curated snapshot, stream-static text rehydration,
  *       [[TokenBudgetStream]])
  *     → FFD PACKING ([[FfdPackStream]] over the admitted manifest)
  *     → the packed LAYOUT published through the exactly-once DSv2
  *       index sink ([[graft.sources.IndexSinkProvider]])
  *     → VECTOR SERVE (retrieve→MMR re-rank, [[MmrServeStream]] —
  *       the serving side of the corpus the chain curates).
  *
  * Handoffs are DIRECTORIES — the storage layer is the rendezvous,
  * exactly as deployed (each stage is an independent streaming query
  * with its own checkpoint, backpressure and restart, the same reason
  * [[ShardedOplogPipeline]] runs one query per shard). [[run]] drives
  * the stages to quiescence in topological order and reports per-stage
  * wall-clock + rows; a live deployment starts the same queries
  * concurrently and the file sources pick upstream output up as it
  * lands.
  *
  * Exactness: every stateful kernel in the chain sorts its micro-batch
  * by the batch operator's fold key (doc_id / (mh, doc_id) /
  * (in-cap, tokens desc, doc_id)), so when a stage drains its input in
  * one micro-batch — which [[run]]'s stage sequencing guarantees, since
  * each stage starts after its upstream finished and file sources take
  * all available files in the first trigger — the streamed output is
  * ROW-IDENTICAL to the batch twin over the same input
  * (PipelineE2ESpec pins every terminal table; multi-batch arrival
  * semantics are each stage's own spec's subject).
  *
  * Scale shape at 100 TB: no stage adds a shuffle beyond its own keyed
  * exchange; the budget static side is histogram-sized (broadcast);
  * text rehydration probes the document store in place via the curated
  * manifest (broadcast-ranked, never shuffling the store); the serve
  * stage scans nprobe/C of the embedding corpus per batch. The chain's
  * aggregate cost is the SUM of its stages' audited costs — no
  * composition-only hotspot exists, which is precisely what this probe
  * demonstrates (SCALING.md "composed chain" rows, 1× vs 20×).
  */
object PipelineE2E {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("lang", StringType), StructField("text", StringType)))

  /** [[docSchema]] + the document's embedding — the payload shape the
    * serve-from-chain mode ingests, materializes and curates so the
    * serve stage answers from vectors the chain itself produced. The
    * vector rides the oplog payload as a JSON double array (exact:
    * Java's shortest-round-trip double formatting re-parses to the
    * same bits); at 100 TB a deployment would carry it as a packed
    * binary field — the column's PATH through the stages is identical
    * either way. */
  val docSchemaE: StructType = StructType(
    docSchema.fields :+ StructField("embedding", ArrayType(DoubleType)))

  /** [[docSchemaE]] + the document's LWW VERSION — not a payload
    * field: the apply stage stamps each materialized row with the
    * winning op's clock (`tsUs × 1000 + tsInc`, the packed-clock
    * discipline the CDC oracles use; tsInc is replica-op-sized, far
    * under the packing base), so downstream consumers can order a
    * doc's versions across store epochs. The serve-from-chain corpus
    * build dedups by it — an updated document serves its NEWEST
    * embedding, never a stale epoch's. */
  val docSchemaEV: StructType = StructType(
    docSchemaE.fields :+ StructField("ver", LongType))

  val curatedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("lang", StringType), StructField("n_tokens", LongType),
    StructField("split", StringType)))

  val admitSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("n_tokens", LongType), StructField("rank_key", LongType),
    StructField("cum_tokens", LongType)))

  final case class Stage(name: String, seconds: Double, rowsOut: Long)

  /** the two-shard heterogeneous-depth topology every sharded spec
    * uses: s0 at depth 3, s1 at depth 2. */
  def defaultTopology: Seq[ShardSet] = Seq(
    ShardTopology.parseDescriptor("s0/h1:27017,h2:27017,h3:27017"),
    ShardTopology.parseDescriptor("s1/h4:27017,h5:27017"))

  /** default shard key: doc_id mod #shards. */
  def shardByDocId(n: Int): org.apache.spark.sql.Column =
    pmod(col("doc_id"), lit(n)).cast("int")

  /** lang-hash shard key — a collection sharded on language. The LIVE
    * chain's spec uses it: with each language confined to one shard,
    * every budget group's rows ride ONE index epoch per wave, so
    * per-group arrival order survives the shards' independent (and
    * concurrently-triggering) pipelines. Under doc_id-mod sharding a
    * group MIXES shards and the apply stage may materialize the two
    * epochs in separate micro-batches in either order — greedy
    * admission then legitimately deviates from the batch prefix (the
    * documented streaming-cap caveat), which is a property of the
    * SHARD KEY, not of the chain. */
  def shardByLang(n: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("lang")), lit(n.toLong)).cast("int")

  /** Stage 0 (fixture): a documents frame rendered as the CLUSTER'S
    * OPLOGS — each doc an insert op, present once per replica member of
    * its shard, ts a synthetic clock off doc_id. Returns the op-line
    * count (docs × their shard's depth). */
  private def opsFrame(spark: SparkSession, docs: DataFrame,
      topology: Seq[ShardSet], shardKey: org.apache.spark.sql.Column,
      tsOffsetSec: Long = 0L): DataFrame = {
    import spark.implicits._
    val memberDf = broadcast(
      topology.zipWithIndex.flatMap { case (sh, i) =>
        sh.members.map(m => (i, sh.shard, m.host))
      }.toDF("sidx", "shard", "sourceHost"))
    docs
      .withColumn("sidx", shardKey)
      .join(memberDf, "sidx")
      .select(
        // tsOffsetSec > 0 renders an UPDATE wave: the same doc_ids at
        // a LATER op clock, so quorum sees distinct ops and the apply
        // stage's LWW fold replaces the document (fixture updates are
        // full-doc upserts, the "i" op — exactly how the LWW register
        // treats any non-delete)
        timestamp_micros((col("doc_id") + 86400L + tsOffsetSec) * 1000000L).as("ts"),
        lit(1).as("tsInc"),
        col("doc_id").as("h"),
        lit("i").as("op"),
        lit("graft.documents").as("ns"),
        // payload = EVERY column of the docs frame (so an embedding
        // column rides the oplog automatically in serve-from-chain
        // mode; the 4-column shape is byte-identical to before)
        to_json(struct(col("doc_id").as("_id") +:
          docs.columns.toSeq.map(col): _*)).as("o"),
        lit(null).cast("string").as("o2"),
        col("sourceHost"), col("shard"))
  }

  def writeOplogFixture(spark: SparkSession, docs: DataFrame, root: String,
      topology: Seq[ShardSet], filesPerShard: Int = 2): Long = {
    val ops = opsFrame(spark, docs, topology,
      shardByDocId(topology.size)).localCheckpoint()
    topology.foreach { sh =>
      ops.filter(col("shard") === sh.shard).drop("shard")
        .repartition(filesPerShard)
        .write.mode("overwrite").json(s"$root/src/${sh.shard}")
    }
    ops.count()
  }

  /** Live-mode wave writer: one more tranche of oplog traffic ADDED to
    * already-tailed source dirs (a tailable source can't be
    * overwritten under its reader) — rendered to scratch, part files
    * moved in under wave-unique names. */
  def writeOplogWave(spark: SparkSession, docs: DataFrame, root: String,
      topology: Seq[ShardSet], wave: String,
      shardKey: Option[org.apache.spark.sql.Column] = None,
      tsOffsetSec: Long = 0L): Long = {
    val staged = renderOplogWave(spark, docs, topology, wave, shardKey, tsOffsetSec)
    injectStagedWave(staged, root, topology, wave)
  }

  /** Render one wave's per-shard json to a staging dir WITHOUT
    * touching the live source dirs — [[injectStagedWave]] later moves
    * the files in with pure filesystem ops. Split out so an open-loop
    * injector can pre-render every wave and hold its cadence without
    * competing with the chain for Spark cores. Returns (stagingDir,
    * opCount). */
  def renderOplogWave(spark: SparkSession, docs: DataFrame,
      topology: Seq[ShardSet], wave: String,
      shardKey: Option[org.apache.spark.sql.Column] = None,
      tsOffsetSec: Long = 0L): (String, Long) = {
    val ops = opsFrame(spark, docs, topology,
      shardKey.getOrElse(shardByDocId(topology.size)), tsOffsetSec).localCheckpoint()
    val scratch = java.nio.file.Files.createTempDirectory(s"graft-wave-$wave")
    topology.foreach { sh =>
      ops.filter(col("shard") === sh.shard).drop("shard")
        .coalesce(1).write.json(scratch.resolve(sh.shard).toString)
    }
    (scratch.toString, ops.count())
  }

  /** Move a [[renderOplogWave]] staging dir into the live source dirs
    * (a tailable source can't be overwritten under its reader; files
    * get wave-unique names). Pure file moves — safe to call from a
    * cadence thread. Deletes the staging dir. */
  def injectStagedWave(staged: (String, Long), root: String,
      topology: Seq[ShardSet], wave: String): Long = {
    topology.foreach { sh =>
      val src = java.nio.file.Paths.get(staged._1, sh.shard)
      val dst = java.nio.file.Paths.get(s"$root/src/${sh.shard}")
      java.nio.file.Files.createDirectories(dst)
      src.toFile.listFiles.filter(_.getName.endsWith(".json"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath, dst.resolve(s"$wave-$i.json"))
          ()
        }
    }
    new scala.reflect.io.Directory(new java.io.File(staged._1)).deleteRecursively()
    staged._2
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Stage 1: per-shard ingest pipelines (filter → quorum dedup at the
    * shard's own depth → index sink), drained to quiescence. */
  def runIngest(spark: SparkSession, topology: Seq[ShardSet], root: String,
      watermark: String = "10 seconds"): Unit = {
    val qs = ShardedOplogPipeline.run(spark, topology,
      sh => s"$root/src/$sh", s"$root/index", s"$root/ckpt/ingest", watermark)
    try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
  }

  /** Stage 2: the oplog INDEX read back as a json-lines stream (the
    * storage-layer union of all shards — O9 at the handoff), LWW-folded
    * into the materialized document store. */
  def runApply(spark: SparkSession, root: String,
      watermark: String = "10 seconds"): Unit = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val lineSchema = StructType(Seq(StructField("data", OplogEntry.schema)))
    val ops = spark.readStream.schema(lineSchema)
      .json(s"$root/index/*/oplog/batch=*")
      .select("data.*").as[OplogEntry]
    val q = OplogApply.currentState(ops, watermark)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt/apply")
      .foreachBatch(writeDocsBatch(root) _)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** materialized-store publish, the index sink's epoch discipline:
    * each micro-batch STAGES its complete parquet output under `_tmp/`
    * and takes `batch=<id>` with ONE directory rename — a concurrent
    * lister (the curation stage tails this store live) sees a whole
    * epoch or none of it, never a partial (Spark's own commit moves
    * part files one at a time — a partial listing would split a
    * downstream group's rows across micro-batches out of fold order,
    * observed as a rare live-chain admission flake); a replayed batch
    * REPLACES its own possibly-partial epoch instead of appending
    * duplicates. Readers glob `docs/batch=*`. Residual window, stated
    * honestly: a replay rewrites identical content under fresh part
    * names, so a downstream that consumed the first attempt BEFORE the
    * crash would re-read the epoch — closing that too is what the full
    * [[graft.sources.IndexSinkProvider]] protocol is for (the layout
    * terminal uses it). */
  private def writeDocsBatch(root: String,
      schema: StructType = docSchema, withVer: Boolean = false,
      sinkCoalesce: Option[Int] = None,
      sweepEmptyEpochs: Boolean = false)(
      b: Dataset[OplogApply.DocState], batchId: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stage = Paths.get(s"$root/docs/_tmp/batch=$batchId-${java.util.UUID.randomUUID()}")
    val cols =
      if (withVer)
        // stamp the winning op's packed clock beside the payload —
        // the version the serve's newest-wins dedup orders by
        Seq(col("d.*"), (col("tsUs") * 1000L + col("tsInc")).as("ver"))
      else Seq(col("d.*"))
    val out = b.filter(col("op") =!= "d")
      .withColumn("d", from_json(col("doc"), schema))
      .select(cols: _*)
    // files-per-epoch bound: the curation stage raw-lists this store,
    // and listing cost grows with TOTAL file count (the extended
    // soak's named residual term); epoch volume is trigger-bounded.
    // REPARTITION, not coalesce: coalesce(n) collapses the whole
    // upstream stage — the JSON payload parse ran in ONE task and
    // tripled apply's batch time in the first sink1 soak (7.9 → 21.4 s
    // last-third, the stage pinned at 93% busy); repartition keeps the
    // parse parallel and pays one trigger-bounded exchange for the
    // file bound
    sinkCoalesce.fold(out)(out.repartition)
      .write.mode("overwrite").parquet(stage.toString)
    val target = Paths.get(s"$root/docs/batch=$batchId")
    if (Files.exists(target))
      new scala.reflect.io.Directory(target.toFile).deleteRecursively()
    Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
    // docs-retention companion sweep (round 19): with the consumer's
    // `cleanSource=archive` moving consumed part files out of the
    // handoff namespace, the epoch DIRS themselves are what's left to
    // grow the per-trigger listing (the lister visits every batch=N
    // dir whether or not it holds files). An emptied dir at least 3
    // epochs behind the frontier is consumed-and-archived by
    // construction (this writer is the only one, and it runs serially
    // per batch) — remove it. One name-level listStatus per batch,
    // driver-side; the guard keeps the replay window untouched.
    if (sweepEmptyEpochs) {
      val Epoch = """batch=(\d+)""".r
      Option(new java.io.File(s"$root/docs").listFiles).getOrElse(Array.empty)
        .foreach { d =>
          d.getName match {
            case Epoch(e) if e.toLong <= batchId - 3 && d.isDirectory &&
                Option(d.listFiles).forall(_.forall(f =>
                  f.getName.startsWith("_") || f.getName.startsWith("."))) =>
              new scala.reflect.io.Directory(d).deleteRecursively()
              ()
            case _ => ()
          }
        }
    }
    ()
  }

  /** the materialized document store, both read shapes. */
  def docsGlob(root: String): String = s"$root/docs/batch=*"

  /** where the docs-retention consumer archive lands: Spark's
    * `SourceFileArchiver` preserves the file's FULL original path under
    * the archive base, so the archived twin of `docsGlob` is the base +
    * the absolute glob. Post-hoc corpus readers under retention read
    * BOTH globs (the live tail + the archived cold tier). */
  def docsArchiveBase(root: String): String = s"$root/docs_archive"
  def docsAllGlobs(root: String): Seq[String] = {
    val archived = s"${docsArchiveBase(root)}$root/docs/batch=*"
    if (new java.io.File(s"${docsArchiveBase(root)}$root/docs").isDirectory)
      Seq(docsGlob(root), archived)
    else Seq(docsGlob(root))
  }

  /** Stage 3: streaming curation over the materialized store. */
  def runCuration(spark: SparkSession, root: String, cap: Int): Unit = {
    val src = spark.readStream.schema(docSchema).parquet(docsGlob(root))
    val q = CurationStream.curate(src, cap = cap)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt/curate")
      .format("parquet").option("path", s"$root/curated")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Stage 4: budget admission — histogram/cut static side computed in
    * batch from the CURATED snapshot (the "previous corpus snapshot" of
    * the deployed form), arriving manifest rows rehydrated with text
    * from the document store by a stream-static join. */
  def runBudget(spark: SparkSession, root: String, budget: Long): Unit = {
    val docsStatic = spark.read.schema(docSchema).parquet(docsGlob(root))
      .select(col("doc_id"), col("text"))
    val curatedStatic = spark.read.schema(curatedSchema).parquet(s"$root/curated")
    val base = graft.operators.Pipeline.budgetBaseFrom(
        curatedStatic.select(col("doc_id"), col("lang")).join(docsStatic, "doc_id"))
      .localCheckpoint()   // two consumers: histogram and cut table
    val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, budget)
    val src = spark.readStream.schema(curatedSchema).parquet(s"$root/curated")
      .select(col("doc_id"), col("lang"))
      .join(docsStatic, "doc_id")
    val q = TokenBudgetStream.admit(src, hist, cuts)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt/budget")
      .format("parquet").option("path", s"$root/admitted")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Stage 5: FFD packing over the admitted manifest (already counted —
    * no re-tokenize, no text re-read), the per-doc layout published
    * through the exactly-once DSv2 index sink. */
  def runPack(spark: SparkSession, root: String, binCap: Long = 512L): Unit = {
    import spark.implicits._
    val admitted = spark.readStream.schema(admitSchema).parquet(s"$root/admitted")
      .select(col("doc_id"), col("lang"), col("n_tokens")).as[FfdDoc]
    val q = FfdPackStream.packCounted(admitted, binCap)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt/pack")
      .foreachBatch { (b: Dataset[FfdAssign], batchId: Long) =>
        OplogPipeline.writeIndexBatch(b.toDF(), s"$root/layout", batchId, "ffd")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Stage 6: the serving side — arriving query vectors answered
    * retrieve→MMR against THE CORPUS THE CHAIN ADMITTED (the fixture's
    * vec_id ≡ doc_id linkage): a query must never retrieve a document
    * the curation/dedup/budget stages rejected, so the static side is
    * semi-joined down to the admitted manifest before the cell-keyed
    * candidate join ([[MmrServeStream.serveCorpus]]) — the loop the
    * chain exists to close, curate → admit → index → serve over ONE
    * content set. Queries are the staged `vec_id < 8` set (the batch
    * `vector_mmr_rerank` query set); PipelineE2ESpec pins the served
    * table against a driver replay of the exact MMR kernel over the
    * admitted vectors. */
  def runServe(spark: SparkSession, root: String, vecDir: String,
      nprobe: Int): Unit = {
    spark.read.parquet(s"$vecDir/embeddings.parquet")
      .filter(col("vec_id") < 8).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/queries")
    val stream = graft.Tables.loadStream(
      spark, s"$root/queries", "embeddings", s"$vecDir/embeddings.parquet")
    val admittedIds = spark.read.schema(admitSchema).parquet(s"$root/admitted")
      .select(col("doc_id").as("vec_id"))
    val q = MmrServeStream.serveCorpus(stream, vecDir, admittedIds, nprobe = nprobe)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt/serve")
      .format("parquet").option("path", s"$root/served")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  // -------------------------------------------------------------------
  // LIVE mode: all stages up CONCURRENTLY, data cascading through the
  // directory handoffs as it lands.
  // -------------------------------------------------------------------

  val curatedFullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("lang", StringType), StructField("n_tokens", LongType),
    StructField("split", StringType), StructField("text", StringType)))

  /** [[curatedFullSchema]] + the carried embedding and LWW version —
    * what [[CurationStream.curateWithEmbedding]] writes
    * (serve-from-chain modes; `ver` per [[docSchemaEV]]). */
  val curatedFullSchemaE: StructType = StructType(
    curatedFullSchema.fields ++ Seq(
      StructField("embedding", ArrayType(DoubleType)),
      StructField("ver", LongType)))

  /** [[admitSchema]] + the index columns the admit-time-indexed mode
    * writes: coarse `cell`, precomputed `nrm`, the vector itself, and
    * the LWW `ver` — the admitted manifest AS the serve index. Update
    * semantics are the SEGMENT MODEL: the live tail
    * ([[MmrServeStream.serveIndexedRefreshed]]) serves every admitted
    * version until compaction, and [[MmrServeStream.reindexAdmitted]]
    * seals each published version newest-admitted-wins by `ver` —
    * admission-current semantics, vs the chain form's content-current
    * ([[MmrServeStream.serveChainRefreshed]] dedups the CURATED store
    * by ver, serving an updated doc's new vector even before
    * re-admission); both stated where they bind. */
  val admitSchemaE: StructType = StructType(
    admitSchema.fields ++ Seq(
      StructField("cell", IntegerType), StructField("nrm", DoubleType),
      StructField("embedding", ArrayType(DoubleType)),
      StructField("ver", LongType)))

  /** handle over the concurrently-running stage queries, in topological
    * order. One [[drain]] pass flushes everything currently published
    * end to end (each stage fully drains before its consumer is asked
    * to), so `drop files → drain() → read terminals` measures the
    * chain's FRESHNESS — op landed to doc packed. */
  final case class LiveChain(queries: Seq[org.apache.spark.sql.streaming.StreamingQuery]) {
    def drain(): Unit = queries.foreach(_.processAllAvailable())
    def stop(): Unit = queries.reverse.foreach(_.stop())
  }

  /** Start EVERY stage as a live concurrent query — the deployment
    * shape the sequential [[run]] drains one stage at a time. Two
    * differences from the sequential chain, both deployment-true:
    *
    *  - curation carries TEXT through the manifest
    *    ([[CurationStream.curateWithText]]): in a fully-live chain the
    *    document store is still being written while the manifest
    *    flows, so the sequential form's stream-static store re-probe
    *    would race its own upstream. Carrying text is the standard
    *    hot-path bandwidth trade; both shapes ship.
    *  - the admission histogram/cuts are PARAMETERS (computed in batch
    *    from the previous corpus snapshot, exactly as deployed) rather
    *    than derived mid-run from the not-yet-final curated corpus.
    *
    * Restart-safe: every stage checkpoints under `$root/ckpt/...`, so
    * calling startLive again on the same root resumes all stages —
    * PipelineE2ELiveSpec kills and restarts the WHOLE chain between
    * waves and the terminal tables still come out exact (per-stage
    * exactly-once composes: checkpointed state + file-source path
    * tracking + the sink-metadata handoff + idempotent epoch publish). */
  def startLive(spark: SparkSession, root: String,
      hist: DataFrame, cuts: DataFrame,
      cap: Int = 18, binCap: Long = 512L,
      topology: Seq[ShardSet] = defaultTopology,
      watermark: String = "10 seconds",
      applyLateness: String = "1 hour",
      curationDelay: String = "1 hour",
      nearDup: Boolean = false,
      applyProvider: Option[String] = None,
      nearDupTtlMs: Option[Long] = None,
      serveVecDir: Option[String] = None,
      serveNprobe: Int = 2,
      serveFromChain: Option[String] = None,
      serveIndexedAdmit: Boolean = false,
      budgetLww: Boolean = false,
      chainShufflePartitions: Option[Int] = None,
      nearDupLww: Boolean = false,
      gateShufflePartitions: Option[Int] = None,
      gateProvider: Option[String] = None,
      chainTriggerSec: Option[Int] = None,
      depthControlRoot: Option[String] = None,
      sinkCoalesce: Option[Int] = None,
      epochHandoffs: Boolean = false,
      docsRetention: Boolean = false): LiveChain = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    // the TRIGGER-SIZE amortization dial (round 17): the post-kernel-
    // fix profile names the chain's floor as per-batch FIXED machinery
    // (state commits × partitions × queries, shuffle-file fan-out,
    // per-task conf deserialization — SCALING.md "balanced,
    // machinery-bound"), which amortizes with batch size. Setting a
    // processing-time trigger of N seconds on every stage makes each
    // micro-batch carry ~N seconds of arrivals: fewer, larger batches —
    // the same data pays the fixed machinery 1/N as often, at up to
    // one trigger interval of added latency per stage. None keeps each
    // stage's default cadence (ingest 1 s, the rest as-fast-as-ready).
    def trig[T](w: org.apache.spark.sql.streaming.DataStreamWriter[T]):
        org.apache.spark.sql.streaming.DataStreamWriter[T] =
      chainTriggerSec.fold(w)(n => w.trigger(
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(s"$n seconds")))
    // the chain's own shuffle/STATE partition count, pinned per query
    // at start (conf scoped to this method; the session default is
    // restored before returning). This is the open-loop capacity dial
    // the round-15 rate probe measured: at local[32] with the session
    // default (32), every stateful stage pays ~32 state-store commits
    // per micro-batch and the composed chain saturates at ~700 docs/s
    // (four stages ≥ 80% busy, lag growing 1.9 s/wave at cadence 3);
    // at 8 the same protocol holds ~1.8k+ docs/s offered with FLAT lag
    // and ~50% peak busy (SCALING.md "binding stage" section). On a
    // real cluster: size to state volume per store, not to core count.
    val priorPartitions = chainShufflePartitions
      .map(_ => spark.conf.get("spark.sql.shuffle.partitions"))
    chainShufflePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
    // the two serve modes share the queries dir and checkpoint — one
    // chain serves from ONE corpus definition
    require(serveVecDir.isEmpty || serveFromChain.isEmpty,
      "serveVecDir (fixture-corpus serve) and serveFromChain " +
        "(chain-corpus serve) are mutually exclusive")
    require(!serveIndexedAdmit || serveFromChain.isDefined,
      "serveIndexedAdmit needs serveFromChain (the embedding carry AND " +
        "the codebook/query-schema source)")
    require(!budgetLww || serveFromChain.isDefined,
      "budgetLww (update-aware admission) needs serveFromChain — the " +
        "refund ledger keys on the LWW `ver` the embedding carry stamps")
    require(!nearDupLww || (nearDup && serveFromChain.isDefined),
      "nearDupLww (update-aware band claims) needs nearDup and " +
        "serveFromChain — the registry keys retirement on the LWW " +
        "`ver` the embedding carry stamps")
    // nearDupLww + nearDupTtlMs COMPOSE (round 16): the registry is the
    // one ager ([[NearDupStream.registerExpiringLww]] — an idle doc's
    // timeout emits its own retires before forgetting it), the bucket
    // stage stays [[NearDupStream.applyLww]] unchanged
    // admit-time indexing: the codebook is a START-TIME PARAMETER (the
    // previous snapshot's — cell geometry doesn't change because
    // membership did), shared verbatim by the budget stage's assigner
    // and the serve stage's prober
    val codebook: Array[(Int, Array[Double])] =
      if (serveIndexedAdmit)
        VectorServeStream.codebookFrom(spark, serveFromChain.get)
      else Array.empty
    // persist the geometry WITH the manifest (hidden `_codebook`
    // subdir — the index is self-describing, which is what the
    // offline reindex/pointer tooling reads as the "old" codebook)
    if (serveIndexedAdmit) {
      new java.io.File(s"$root/admitted").mkdirs()
      MmrServeStream.writeCodebook(spark, s"$root/admitted", codebook)
    }
    // pre-create the handoff dirs so every file source can resolve its
    // path before its upstream has published anything (the index glob
    // needs one epoch-shaped dir to match; an empty one is harmless —
    // a real epoch 0 commit REPLACES it wholesale)
    topology.foreach { sh =>
      new java.io.File(s"$root/index/${sh.shard}/oplog/batch=0").mkdirs()
      new java.io.File(s"$root/src/${sh.shard}").mkdirs()
    }
    Seq("docs/batch=0", "curated", "admitted").foreach(d => new java.io.File(s"$root/$d").mkdirs())
    if (nearDup) new java.io.File(s"$root/dedup/neardup/batch=0").mkdirs()
    if (nearDupLww) new java.io.File(s"$root/dedup/bands/batch=0").mkdirs()
    (serveVecDir.toSeq ++ serveFromChain.toSeq).headOption
      .foreach(_ => new java.io.File(s"$root/queries").mkdirs())
    // serve-from-chain: the payload, store, and curated manifest all
    // carry the embedding column
    val chainDocSchema = if (serveFromChain.isDefined) docSchemaE else docSchema
    val curatedLiveSchema =
      if (serveFromChain.isDefined) curatedFullSchemaE else curatedFullSchema

    // depthControlRoot: per-shard LIVE quorum reconfiguration — the
    // fault-tolerance dial (a member dies below quorum mid-run, the
    // operator publishes the new depth, retained sub-quorum copies
    // emit at their timeout under the new depth; ChainSoak's fault
    // mode soaks exactly this protocol)
    // sinkCoalesce: the FILES-PER-EPOCH dial for every raw-listed
    // directory handoff (ingest→apply index epochs, the docs store,
    // gate survivor epochs, the packed layout) — the extended soak
    // named total file count as the one term still rising over a long
    // window (listing cost, not state); an epoch's volume is
    // trigger-bounded so a small writer count loses nothing at steady
    // state. None keeps one file per partition per epoch.
    val ingest = ShardedOplogPipeline.run(spark, topology,
      sh => s"$root/src/$sh", s"$root/index", s"$root/ckpt/ingest", watermark,
      trigger = chainTriggerSec.map(n =>
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(s"$n seconds")),
      depthControlDirFor = depthControlRoot.map(r => (sh: String) => s"$r/$sh"),
      sinkCoalesce = sinkCoalesce)

    val lineSchema = StructType(Seq(StructField("data", OplogEntry.schema)))
    // epochHandoffs (round 19, verdict ask 1): the raw-listed LINE
    // handoffs — ingest index → apply, gate survivor epochs → budget,
    // registry bands → buckets — consume through the EPOCH-POINTER
    // source ([[graft.sources.EpochSourceProvider]]): per trigger one
    // commit-marker probe per newly-committed epoch instead of a full
    // glob re-list whose cost grows with total epoch count forever
    // (the extended soak's one residual rising term). Consumed epochs
    // leave the probed namespace at the consumer's own commit: the
    // ingest index (the O12 product) and the survivor manifest are
    // ARCHIVED (one rename, preserved beside the tree); the bands
    // rendezvous — pure protocol traffic re-derivable from the curated
    // store — is DELETED. Epoch-granular consumption also closes the
    // docs publish's documented replay residual for these handoffs: a
    // replayed (replaced) epoch at or below the consumer cursor is
    // never re-read as new files.
    def epochLines(path: String, retention: String,
        dataSchema: StructType): DataFrame =
      spark.readStream.format("graft.sources.EpochSourceProvider")
        .option("path", path).option("retention", retention)
        .load()
        .select(from_json(col("value"),
          StructType(Seq(StructField("data", dataSchema)))).as("j"))
        .select(col("j.data").as("data"))
    // applyLateness, NOT the per-shard ingest watermark: the apply
    // stage UNIONS every shard's epochs into one query, and an
    // event-time-stateful operator drops input at/below its watermark
    // (empirically pinned, AttributionWatermarkSpec) — so its horizon
    // must cover CROSS-PUBLISHER skew: one shard's epoch can land a
    // full publication cycle of event time behind another's (observed
    // live: the second shard's whole wave arriving "late" under a 10 s
    // horizon and silently vanishing from the store). Per-shard
    // quorum queries don't have this problem; the union stage does.
    // the apply stage's LWW registers are the chain's one
    // corpus-linear-by-contract store (sustain-probe growth ledger) —
    // `applyProvider = Some("rocksdb")` moves JUST this query's state
    // off-heap (conf pinned per query at start; the other stages keep
    // the session default per the churn-vs-resident dial)
    val applyOps =
      if (epochHandoffs)
        topology.map(sh =>
            epochLines(s"$root/index/${sh.shard}/oplog", "archive",
              OplogEntry.schema))
          .reduce(_.unionByName(_))
          .select("data.*").as[OplogEntry]
      else
        spark.readStream.schema(lineSchema)
          .json(s"$root/index/*/oplog/batch=*")
          .select("data.*").as[OplogEntry]
    def startApply() = trig(OplogApply.currentState(applyOps, applyLateness)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt/apply")
      .foreachBatch(
        writeDocsBatch(root, chainDocSchema,
          withVer = serveFromChain.isDefined,
          sinkCoalesce = sinkCoalesce,
          sweepEmptyEpochs = docsRetention) _))
      .start()
    val apply = applyProvider.fold(startApply())(p =>
      graft.GraftSession.withStateProvider(spark, p)(startApply()))

    // serve-from-chain widens the curated manifest by the embedding
    // column (pure carried payload — same kernels, same state, same
    // verdicts; downstream readers project their own narrower schemas
    // over the wider files)
    // docsRetention (round 19, verdict ask 1a): the docs store is a
    // PARQUET handoff, so its consumer keeps the standard file source —
    // but Spark's own consumed-file cleaner (`cleanSource=archive`,
    // fired at the consumer's commit) moves each consumed part file to
    // the cold tier under [[docsArchiveBase]] (full original path
    // preserved), and the writer's companion sweep (writeDocsBatch
    // `sweepEmptyEpochs`) removes the emptied epoch dirs — together
    // bounding the handoff listing to the unconsumed tail. The corpus
    // itself is PRESERVED: post-hoc readers use [[docsAllGlobs]].
    def docsStream(schema: StructType): DataFrame = {
      val r = spark.readStream.schema(schema)
      (if (docsRetention)
        r.option("cleanSource", "archive")
          .option("sourceArchiveDir", docsArchiveBase(root))
      else r).parquet(docsGlob(root))
    }
    val curateSink =
      (if (serveFromChain.isDefined)
        CurationStream.curateWithEmbedding(
          docsStream(docSchemaEV),
          cap = cap, delay = curationDelay).toDF()
      else
        CurationStream.curateWithText(
          docsStream(docSchema),
          cap = cap, delay = curationDelay).toDF())
    val curate = trig(curateSink
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt/curate")
      .format("parquet").option("path", s"$root/curated"))
      .start()

    // OPTIONAL near-dup admission between curation and budget
    // ([[NearDupStream]]): the gate's stateful kernel sees band rows
    // with the document's FULL ROW riding its band-0 row as a carried
    // JSON payload ([[NearDupStream.flagCarry]]), so the per-batch
    // survivor publish is a BATCH-LOCAL semi-join (verdict fold →
    // band-0 carriers → from_json) through the exactly-once index-sink
    // epoch discipline — a foreachBatch replay replaces its own epoch
    // instead of duplicating survivors. Budget then admits from the
    // deduped manifest. The carry is the width-vs-reread trade taken
    // on the width side, which the round-15 knee measurement decided:
    // the previous form re-read the whole (growing) curated store per
    // batch for the survivor semi-join, and at the post-partition-fix
    // ceiling that scan made THIS stage the chain's binding term (81%
    // busy, every other stage ≤ 48% — SCALING.md); the carried payload
    // costs one serialized row per arrival through the gate's keyed
    // exchange (never ×16 — only the band-0 row carries it) and makes
    // the publish trigger-bounded with no store access at all.
    // `nearDupTtlMs` switches the gate to its BOUNDED-state form
    // ([[NearDupStream.flagExpiringCarry]]): buckets idle past the ttl
    // of EVENT time expire whole, capping gate state at the ttl
    // window's distinct corpus instead of growing corpus-linear
    // (verdicts are identical within the horizon). Event time here is
    // the synthetic corpus's op clock (doc_id seconds, the same
    // formula the oplog fixture writes); a deployment would carry the
    // op ts through the curated manifest instead. The gate's lateness
    // horizon is `curationDelay`, same as the stage it consumes.
    def gateBands(src: DataFrame) = nearDupTtlMs match {
      case Some(ttl) => NearDupStream.flagExpiringCarry(
        src.withColumn("ets",
          timestamp_micros((col("doc_id") + 86400L) * 1000000L)),
        ttl, delay = curationDelay)
      case None => NearDupStream.flagCarry(src)
    }
    // the gate's OWN dials, scoped per query (a streaming query pins
    // its session conf at start): `gateShufflePartitions` sizes the
    // band-state store count independently of the chain-wide dial —
    // the gate is the chain's measured binding stage (81% busy at the
    // r15 knee) AND its largest state ledger (16 buckets/doc vs one
    // register), so its partition sizing is its own decision;
    // `gateProvider` moves just the band state off-heap (rocksdb).
    def gateScoped[T](body: => T): T = {
      def withProv(b: => T): T =
        gateProvider.fold(b)(p => graft.GraftSession.withStateProvider(spark, p)(b))
      gateShufflePartitions match {
        case Some(n) =>
          graft.GraftSession.withShufflePartitions(spark, n)(withProv(body))
        case None => withProv(body)
      }
    }
    // shared survivor publish: per-batch verdict fold → band-0
    // carriers → exactly-once index-sink epoch (see the non-LWW form's
    // inline comments — identical either way)
    def publishSurvivors(b: Dataset[NearDupStream.NearDupBandP],
        batchId: Long): Unit = {
      // persist: the fold AND the carrier filter both consume the
      // batch — without the barrier each action would re-execute
      // the stateful kernel's plan inside the same batch version
      val bands = b.toDF().persist()
      try {
        val verdicts = NearDupStream.fold(bands)
          .filter(col("dup_of").isNull).select(col("doc_id"))
        val survivors = bands
          .filter(col("b") === 0 && col("payload").isNotNull)
          .join(verdicts, Seq("doc_id"), "left_semi")
          .select(from_json(col("payload"), curatedLiveSchema).as("d"))
          .select(col("d.*"))
        // repartition, not coalesce — same stage-collapse trap as the
        // docs publish (the payload from_json + semi-join would run
        // single-task under coalesce)
        OplogPipeline.writeIndexBatch(
          sinkCoalesce.fold(survivors)(survivors.repartition),
          s"$root/dedup", batchId, "neardup")
      } finally {
        bands.unpersist()
        ()
      }
    }
    val gate =
      if (!nearDup) Seq.empty[org.apache.spark.sql.streaming.StreamingQuery]
      else if (nearDupLww) {
        // UPDATE-AWARE gate: two stateful queries joined by the chain's
        // standard exactly-once epoch handoff — the per-doc version
        // REGISTRY (retires a superseded version's band claims;
        // [[NearDupStream.registerLww]]) feeding the version-stamped
        // bucket rendezvous ([[NearDupStream.applyLww]]). Two queries
        // because retirement is per-doc knowledge delivered per-bucket:
        // two partition keys, one directory rendezvous between them.
        // ttl set: the TTL'd registry (the ONE ager — idle docs retire
        // their own claims at timeout; same event clock as gateBands)
        def regBands() = nearDupTtlMs match {
          case Some(ttl) => NearDupStream.registerExpiringLww(
            spark.readStream.schema(curatedLiveSchema).parquet(s"$root/curated")
              .withColumn("ets",
                timestamp_micros((col("doc_id") + 86400L) * 1000000L)),
            ttl, delay = curationDelay)
          case None => NearDupStream.registerLww(
            spark.readStream.schema(curatedLiveSchema).parquet(s"$root/curated"))
        }
        val reg = gateScoped {
          trig(regBands()
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$root/ckpt/neardupreg")
            .foreachBatch { (b: Dataset[NearDupStream.RegMsg], batchId: Long) =>
              // epoch stamp: the bucket kernel replays a catch-up
              // trigger's messages in registry-batch order (a
              // per-batch constant, so it is stamped here, not by the
              // kernel) — see [[NearDupStream.applyLww]].
              // coalesce(1): ONE part file per epoch (round-17 ADVICE)
              // — the epoch-ordered replay guarantees ordering at epoch
              // granularity only, so a consumer trigger boundary (or a
              // future maxFilesPerTrigger bound on the bucket source)
              // landing mid-epoch could apply a same-epoch retire in a
              // later trigger than a co-epoch arrival; one file per
              // epoch makes a straddle structurally impossible. The
              // registry's epoch is one compact row per arriving doc,
              // so the single-writer cost is trigger-bounded; a
              // deployment with corpus-sized epochs would instead bound
              // the consumer to whole epochs per trigger.
              OplogPipeline.writeIndexBatch(
                b.toDF().withColumn("epoch", lit(batchId)).coalesce(1),
                s"$root/dedup", batchId, "bands")
              ()
            })
            .start()
        }
        val bandLineSchema = StructType(Seq(StructField("data",
          StructType.fromDDL(NearDupStream.RegMsgDdl))))
        val bandsSrc =
          if (epochHandoffs)
            epochLines(s"$root/dedup/bands", "delete",
              StructType.fromDDL(NearDupStream.RegMsgDdl)).select("data.*")
          else
            spark.readStream.schema(bandLineSchema)
              .json(s"$root/dedup/bands/batch=*").select("data.*")
        val buckets = gateScoped {
          trig(NearDupStream.applyLww(bandsSrc)
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$root/ckpt/neardup")
            .foreachBatch(publishSurvivors _))
            .start()
        }
        Seq(reg, buckets)
      } else Seq(gateScoped {
        trig(gateBands(
            spark.readStream.schema(curatedLiveSchema).parquet(s"$root/curated"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt/neardup")
          .foreachBatch(publishSurvivors _))
          .start()
      })

    val dedupLineSchema = StructType(Seq(StructField("data", curatedLiveSchema)))
    // the indexed mode additionally pulls the carried embedding into
    // the budget stage (admitCarry — pure carried payload, identical
    // verdicts), then assigns the coarse cell in a STATELESS map inside
    // the same query: the admitted manifest lands cell-keyed with
    // vector and norm, exactly-once via the file sink's own commit
    // log — the manifest IS the serve index, built incrementally at
    // trigger-bounded cost (never a corpus rescan)
    val budgetCols =
      if (serveIndexedAdmit || budgetLww)
        Seq("doc_id", "lang", "text", "embedding", "ver")
      else Seq("doc_id", "lang", "text")
    val budgetSrc =
      if (!nearDup)
        spark.readStream.schema(curatedLiveSchema).parquet(s"$root/curated")
          .select(budgetCols.map(col): _*)
      else if (epochHandoffs)
        epochLines(s"$root/dedup/neardup", "archive", curatedLiveSchema)
          .select(budgetCols.map(c => col(s"data.$c").as(c)): _*)
      else
        spark.readStream.schema(dedupLineSchema)
          .json(s"$root/dedup/neardup/batch=*")
          .select(budgetCols.map(c => col(s"data.$c").as(c)): _*)
    // budgetLww swaps the admission kernel for the UPDATE-AWARE form
    // ([[TokenBudgetStream.admitLww]] — an updated doc consumes the
    // budget once, at its newest version, via the refund-or-restore
    // ledger; `corpus_budget_update_lww` is the oracled batch twin);
    // the carried columns and the indexed cell-assignment map are
    // identical either way
    def admittedCarry() =
      if (budgetLww) TokenBudgetStream.admitLww(budgetSrc, hist, cuts)
      else TokenBudgetStream.admitCarry(budgetSrc, hist, cuts)
    val budgetSink =
      if (serveIndexedAdmit) {
        val cb = codebook
        admittedCarry()
          .mapPartitions { it =>
            it.map { a =>
              (a.doc_id, a.lang, a.n_tokens, a.rank_key, a.cum_tokens,
                VectorServeStream.cellOf(cb, a.embedding),
                VectorServeStream.normOf(a.embedding), a.embedding, a.ver)
            }
          }
          .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens",
            "cell", "nrm", "embedding", "ver")
      } else if (budgetLww) admittedCarry().toDF()
      else TokenBudgetStream.admit(budgetSrc, hist, cuts).toDF()
    val budget = trig(budgetSink
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt/budget")
      .format("parquet").option("path", s"$root/admitted"))
      .start()

    val pack = trig(FfdPackStream.packCounted(
        spark.readStream.schema(admitSchema).parquet(s"$root/admitted")
          .select(col("doc_id"), col("lang"), col("n_tokens")).as[FfdDoc],
        binCap)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt/pack")
      .foreachBatch { (b: Dataset[FfdAssign], batchId: Long) =>
        val out = b.toDF()
        OplogPipeline.writeIndexBatch(
          sinkCoalesce.fold(out)(out.coalesce),
          s"$root/layout", batchId, "ffd")
        ()
      })
      .start()

    // OPTIONAL live SERVE stage — the chain closed end to end IN one
    // concurrent run: query vectors stream from `$root/queries`, the
    // candidate corpus is `serveVecDir`'s embeddings restricted to the
    // CURRENT admitted manifest per micro-batch
    // ([[MmrServeStream.serveRefreshed]] re-reads `$root/admitted`
    // inside foreachBatch, so a query served after wave w retrieves
    // wave w's admissions with no restart), hits publish as
    // exactly-once epochs under `$root/serve/batch=*`. Only possible
    // with the refreshed form: a static-manifest serve would pin the
    // admission snapshot at chain start, before anything was admitted.
    val serve = serveVecDir.toSeq.map { vd =>
      MmrServeStream.serveRefreshed(
        graft.Tables.loadStream(spark, s"$root/queries", "embeddings",
          s"$vd/embeddings.parquet"),
        vd, s"$root/admitted", s"$root/ckpt/serve", root,
        nprobe = serveNprobe)
    }

    // CHAIN-CORPUS serve: no fixture vector table anywhere — the
    // candidate corpus is the curated store's own embedding column
    // restricted to the admitted manifest, rebuilt per admitted EPOCH
    // (pointer-probed each micro-batch), codebook re-derived
    // content-addressed from the admitted ids. `serveFromChain` names
    // the parquet whose schema shapes the QUERY stream (queries are
    // external input either way).
    val serveChain = serveFromChain.toSeq.map { schemaFrom =>
      val queries = graft.Tables.loadStream(
        spark, s"$root/queries", "embeddings", schemaFrom)
      if (serveIndexedAdmit)
        // ADMIT-TIME-INDEXED: the manifest is the index — no store
        // re-read, no per-epoch rebuild; prober uses the SAME codebook
        // the budget stage assigned with
        MmrServeStream.serveIndexedRefreshed(queries, s"$root/admitted",
          codebook, s"$root/ckpt/serve", root, nprobe = serveNprobe)
      else
        MmrServeStream.serveChainRefreshed(queries,
          s"$root/curated", s"$root/admitted", s"$root/ckpt/serve", root,
          nprobe = serveNprobe)
    }

    LiveChain(ingest ++ Seq(apply, curate) ++ gate ++ Seq(budget, pack) ++
      serve ++ serveChain)
    } finally priorPartitions.foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p))
  }

  /** The whole chain, stage-timed. `docs` is the corpus entering CDC;
    * `vecDir` the sf directory whose embeddings the serve stage answers
    * against. Row counts are read back AFTER each stage's clock stops,
    * so timings are pure stage wall-clock. */
  def run(spark: SparkSession, docs: DataFrame, root: String, vecDir: String,
      cap: Int = 18, budget: Long = 2000L, nprobe: Int = 16,
      topology: Seq[ShardSet] = defaultTopology): Seq[Stage] = {
    val stages = Seq.newBuilder[Stage]
    val (nOps, tFix) = timed(writeOplogFixture(spark, docs, root, topology))
    stages += Stage("fixture", tFix, nOps)
    val (_, tIngest) = timed(runIngest(spark, topology, root))
    stages += Stage("ingest", tIngest,
      topology.map(sh => spark.read.json(s"$root/index/${sh.shard}/oplog").count()).sum)
    val (_, tApply) = timed(runApply(spark, root))
    stages += Stage("apply", tApply,
      spark.read.schema(docSchema).parquet(docsGlob(root)).count())
    val (_, tCur) = timed(runCuration(spark, root, cap))
    stages += Stage("curate", tCur,
      spark.read.schema(curatedSchema).parquet(s"$root/curated").count())
    val (_, tBud) = timed(runBudget(spark, root, budget))
    stages += Stage("budget", tBud,
      spark.read.schema(admitSchema).parquet(s"$root/admitted").count())
    val (_, tPack) = timed(runPack(spark, root))
    stages += Stage("pack", tPack,
      spark.read.json(s"$root/layout/ffd").count())
    val (_, tServe) = timed(runServe(spark, root, vecDir, nprobe))
    stages += Stage("serve", tServe,
      spark.read.parquet(s"$root/served").count())
    stages.result()
  }
}
