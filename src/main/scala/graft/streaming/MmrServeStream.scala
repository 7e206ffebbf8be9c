package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One candidate row entering the per-query MMR kernel: the cosine is
  * computed OUTSIDE the kernel by the codegen'd `dot_product`
  * expression, so it is bit-identical to the batch path's; `v`/`nrm`
  * ride along for the candidate-candidate redundancy cosines. */
case class MmrCand(qid: Long, vec_id: Long, cos: Double,
                   v: Array[Double], nrm: Double)

/** One diversity-selected serving row. */
case class MmrHit(qid: Long, step: Int, vec_id: Long, mmr_score: Long)

/** STREAMING RETRIEVE → MMR RE-RANK, composed in ONE query: arriving
  * query vectors are routed to their IVF probe cells, candidates come
  * from the cell-keyed stream-static join ([[VectorServeStream]]'s
  * retrieve half), and each query's top-20 is diversity-re-ranked by
  * the batch `vector_mmr_rerank` rule (operators/VectorSearch.scala)
  * INSIDE the per-key kernel — the serving path a RAG deployment runs
  * (retrieve, then stop the retriever returning five paraphrases of
  * one document) with no second query and no driver round-trip.
  *
  * The greedy MMR loop is per-query over ≤20 candidates, so the
  * streaming-legal home for it is the `flatMapGroupsWithState` group
  * iterator: 20×20 pairwise micro-cosines + 5 unrolled argmax steps,
  * all integer after one HALF_UP micro-rounding per cosine — the SAME
  * arithmetic as the batch operator (Spark `round()` is BigDecimal
  * HALF_UP; the kernel uses BigDecimal HALF_UP, not `math.round`,
  * which differs on negative half-values), so when the probes cover
  * the exact top-20 the streamed selection is bit-identical to batch
  * (MmrServeStreamSpec pins stream ≡ batch at nprobe = C).
  *
  * At 100 TB the economics are the retrieve half's: per batch, nprobe/C
  * of the static side is scanned; the re-rank adds O(k²) per query —
  * top-k-sized frames only, never corpus-sized. */
object MmrServeStream {

  def serve(queries: DataFrame, dir: String, kCand: Int = 20, kOut: Int = 5,
      nprobe: Int = 2): Dataset[MmrHit] =
    serveRestricted(queries, dir, None, kCand, kOut, nprobe)

  /** [[serve]] over a RESTRICTED corpus: candidates come only from
    * vectors whose id appears in `corpusIds` (one `vec_id` column) —
    * the shape the composed chain serves with, where the servable
    * corpus is the ADMITTED manifest, not the raw embedding table:
    * a query must never retrieve a document the curation/dedup/budget
    * stages rejected. The restriction is a semi-join applied BEFORE
    * the cell-keyed candidate join, so the per-batch scan shrinks to
    * the admitted fraction — at 100 TB the admitted manifest IS the
    * index's content set, and the IVF codebook stays the full-corpus
    * one (cell geometry doesn't change because membership did). */
  def serveCorpus(queries: DataFrame, dir: String, corpusIds: DataFrame,
      kCand: Int = 20, kOut: Int = 5, nprobe: Int = 2): Dataset[MmrHit] =
    serveRestricted(queries, dir, Some(corpusIds), kCand, kOut, nprobe)

  private def serveRestricted(queries: DataFrame, dir: String,
      corpusIds: Option[DataFrame], kCand: Int, kOut: Int,
      nprobe: Int): Dataset[MmrHit] = {
    val spark = queries.sparkSession
    import spark.implicits._
    candidates(queries, dir, corpusIds, nprobe)
      .groupByKey(_.qid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[MmrCand], _: GroupState[Long]) =>
          rerank(qid, rows, kCand, kOut)
      }
  }

  /** The retrieve half, shared verbatim by the streaming and batch
    * forms — works on either kind of `queries` frame (probing is a
    * mapPartitions over broadcast centroids; the corpus side is
    * static). */
  private def candidates(queries: DataFrame, dir: String,
      corpusIds: Option[DataFrame], nprobe: Int): Dataset[MmrCand] = {
    val spark = queries.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftexpr.VectorFunctions.dot_product
    val (probed, corpus0, _) = VectorServeStream.probeWithCorpus(queries, dir, nprobe)
    val corpus = corpusIds match {
      case Some(ids) =>
        corpus0.join(broadcast(ids.select($"vec_id").distinct()),
          Seq("vec_id"), "left_semi")
      case None => corpus0
    }
    probed.toDF()
      .join(corpus, Seq("cell"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id",
        (dot_product($"qv", $"v") / ($"qnrm" * $"nrm")).as("cos"),
        $"v", $"nrm")
      .as[MmrCand]
  }

  /** BATCH twin of [[serveCorpus]] — the same candidate build and the
    * same rerank kernel, folded with plain `flatMapGroups` (legal
    * because the serve is stateless per query: every query's
    * candidates live in one frame). Exists so the refreshed form below
    * can run the whole serve INSIDE foreachBatch. */
  def serveBatch(queries: DataFrame, dir: String, corpusIds: Option[DataFrame],
      kCand: Int = 20, kOut: Int = 5, nprobe: Int = 2): Dataset[MmrHit] = {
    val spark = queries.sparkSession
    import spark.implicits._
    candidates(queries, dir, corpusIds, nprobe)
      .groupByKey(_.qid)
      .flatMapGroups((qid: Long, rows: Iterator[MmrCand]) =>
        rerank(qid, rows, kCand, kOut))
  }

  /** BOUNCE-FREE refreshed serve — the [[ManagedServe]] restart fee
    * removed: because the serve is stateless per micro-batch, the
    * admitted-manifest read moves INSIDE `foreachBatch`, where creating
    * the DataFrame anew each batch re-lists the directory — every
    * micro-batch serves against the manifest in force WHEN IT RUNS, so
    * admission-to-servable freshness is one trigger interval, no query
    * restart, no cold-start fee (`tools.ServeRefreshProbe live`
    * prices it vs the bounce). Hits publish through the exactly-once
    * index-sink epoch discipline (a replayed batch REPLACES its epoch,
    * never duplicates — the chain's own idempotence pattern), landing
    * as `{"data": hit}` json lines under `$outRoot/serve/batch=*`. */
  def serveRefreshed(queries: DataFrame, dir: String, admittedDir: String,
      checkpoint: String, outRoot: String,
      kCand: Int = 20, kOut: Int = 5,
      nprobe: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val admitted = readAdmittedIds(spark, admittedDir)
        val hits = serveBatch(batch, dir, Some(admitted), kCand, kOut, nprobe)
        OplogPipeline.writeIndexBatch(hits.toDF(), outRoot, batchId, "serve")
        ()
      }
      .start()

  /** [[serveRefreshed]] with the per-batch re-list+re-plan replaced by
    * an EPOCH-POINTER swap — the sub-second-freshness form SURVEY's
    * sizing rule calls for. `serveRefreshed` re-creates the admitted
    * DataFrame every micro-batch, paying a directory re-list plus plan
    * re-analysis per trigger whether or not anything changed
    * (`tools.ServeRefreshProbe` priced the residual at 1.6–3.4 s of
    * probe cadence). Here each batch instead reads ONE version pointer
    * ([[manifestVersion]] — for a sink-written manifest that is a
    * small commit-log listing, the IndexSink epoch pattern) and
    * re-plans ONLY when the pointer moved: unchanged epochs reuse the
    * held DataFrame, whose file listing is PINNED at creation (the
    * ServeFreshnessSpec static-snapshot semantics, here load-bearing
    * on purpose — same version ⇒ same files ⇒ the pinned plan is the
    * current manifest). Freshness stays one trigger interval; the
    * steady-state per-batch overhead drops to the pointer read.
    * Failure semantics are [[readAdmittedIds]]'s: genuinely-empty
    * serves nothing, everything else fails the query and a restart
    * replays from the checkpoint (the held cache dies with the query,
    * so a restart re-reads — no staleness across failures). */
  def serveEpochRefreshed(queries: DataFrame, dir: String,
      admittedDir: String, checkpoint: String, outRoot: String,
      kCand: Int = 20, kOut: Int = 5,
      nprobe: Int = 2): org.apache.spark.sql.streaming.StreamingQuery = {
    // held epoch, confined to the stream's single micro-batch
    // execution thread (foreachBatch bodies of one query never run
    // concurrently)
    var heldVersion: String = null
    var heldAdmitted: DataFrame = null
    queries.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val v = manifestVersion(spark, admittedDir)
        if (heldAdmitted == null || v != heldVersion) {
          heldAdmitted = readAdmittedIds(spark, admittedDir)
          heldVersion = v
        }
        val hits = serveBatch(batch, dir, Some(heldAdmitted), kCand, kOut, nprobe)
        OplogPipeline.writeIndexBatch(hits.toDF(), outRoot, batchId, "serve")
        ()
      }
      .start()
  }

  /** One held serve epoch of the CHAIN-CORPUS serve: the admitted
    * manifest version it was built from, the epoch's content-addressed
    * codebook, and the persisted cell-assigned corpus (unpersisted on
    * epoch swap). */
  private final case class ChainEpoch(version: String,
      centArr: Array[(Int, Array[Double])],
      corpus: DataFrame)

  /** CHAIN-CORPUS serve — the serve stage with NO fixture vector
    * table: candidates are the embeddings the chain itself produced
    * (ingest payload → apply → [[CurationStream.curateWithEmbedding]]
    * manifest), restricted to the currently-admitted ids. Closes the
    * round-13 gap "chain-derived embeddings are not servable": every
    * retrieved vector rode the oplog through the full pipeline.
    *
    * Epoch discipline is [[serveEpochRefreshed]]'s pointer swap: per
    * micro-batch ONE [[manifestVersion]] probe on the admitted dir;
    * only when the pointer moved does the serve rebuild its static
    * side — admitted ids semi-join the curated store's (doc_id,
    * embedding) projection, the epoch's coarse codebook is re-derived
    * content-addressed (the `nCells` lowest admitted vec_ids — the
    * `vector_ann_ivf_flat` random-sample-init discipline, here fully
    * chain-derived so no fixture table survives anywhere in the serve
    * path), cells are assigned by the same argmin float fold the
    * query probe uses, and the result is PERSISTED for the epoch
    * (previous epoch unpersisted). Queries probe `nprobe` cells and
    * re-rank through the shared MMR kernel; hits publish as
    * exactly-once index-sink epochs under `outRoot/serve/batch=*`.
    *
    * Pre-admission the serve answers with the EMPTY corpus (zero
    * probes, zero hits — by design, not a crash); faults in either
    * store read propagate per [[readAdmittedIds]]'s contract. At
    * 100 TB the per-epoch rebuild is the honest cost statement: a
    * deployment assigns the cell AT ADMISSION (one stateless map over
    * trigger-bounded rows against the broadcast codebook, written
    * into the manifest) and the epoch build becomes a pruned
    * cell-keyed read; the codebook itself refreshes on drift through
    * the retrain loop (`vector_ivf_retrain` / `vector_retrain_gate`),
    * not per epoch. */
  def serveChainRefreshed(queries: DataFrame, curatedDir: String,
      admittedDir: String, checkpoint: String, outRoot: String,
      kCand: Int = 20, kOut: Int = 5, nprobe: Int = 2,
      nCells: Int = 16): org.apache.spark.sql.streaming.StreamingQuery = {
    // held epoch, confined to the stream's single micro-batch thread
    var held: ChainEpoch = null
    queries.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val v = manifestVersion(spark, admittedDir)
        if (held == null || held.version != v) {
          val prev = held
          held = buildChainEpoch(spark, curatedDir, admittedDir, v, nCells)
          if (prev != null) { prev.corpus.unpersist(); () }
        }
        val probed = VectorServeStream.probeQueries(batch, held.centArr, nprobe)
        val cand = probed.toDF()
          .join(held.corpus, Seq("cell"))
          .filter($"vec_id" =!= $"qid")
          .select($"qid", $"vec_id",
            (org.apache.spark.sql.graftexpr.VectorFunctions
              .dot_product($"qv", $"v") / ($"qnrm" * $"nrm")).as("cos"),
            $"v", $"nrm")
          .as[MmrCand]
        val hits = cand.groupByKey(_.qid)
          .flatMapGroups((qid: Long, rows: Iterator[MmrCand]) =>
            rerank(qid, rows, kCand, kOut))
        OplogPipeline.writeIndexBatch(hits.toDF(), outRoot, batchId, "serve")
        ()
      }
      .start()
  }

  /** Build one serve epoch from the chain's own stores. Loud failure
    * modes: a curated store NOT carrying embeddings (chain started
    * without the embedding carry) is a require() failure naming the
    * fix, never a silent empty serve. */
  private def buildChainEpoch(spark: SparkSession, curatedDir: String,
      admittedDir: String, version: String, nCells: Int): ChainEpoch = {
    import spark.implicits._
    val ids = readAdmittedIds(spark, admittedDir)
    // pre-admission: serve the empty corpus WITHOUT touching the
    // curated store (its sink log can exist with zero commits, where
    // schema inference would fail persistently). Once anything is
    // admitted, its curated row is durable upstream by the chain's
    // ordering (budget's source IS the curated store), so the reads
    // below may fail only on real faults — which propagate.
    if (ids.isEmpty)
      return ChainEpoch(version, Array.empty,
        spark.emptyDataset[(Int, Long, Array[Double], Double)]
          .toDF("cell", "vec_id", "v", "nrm"))
    // schema probe per epoch (footer-read-sized): mis-wiring against a
    // text-only curated store must fail loudly, not serve nothing
    val curatedFields = spark.read.parquet(curatedDir).schema.fieldNames
    require(curatedFields.contains("embedding"),
      s"curated store at $curatedDir carries no 'embedding' column — " +
        "start the chain with the embedding carry (curateWithEmbedding / " +
        "startLive(serveFromChain)) to serve chain-derived vectors")
    // NEWEST-WINS when the store carries the LWW version: an updated
    // document appears once per surviving curated version (append-only
    // store epochs), and a query must retrieve its CURRENT embedding,
    // never a stale epoch's — one vec_id-keyed max_by per epoch build
    // (the same exchange the semi-join already keys). Version-less
    // legacy stores keep their historical multi-row behavior.
    val hasVer = curatedFields.contains("ver")
    val curated = spark.read
      .schema("doc_id LONG, embedding ARRAY<DOUBLE>, ver LONG")
      .parquet(curatedDir)
      .select(col("doc_id").as("vec_id"), col("embedding"), col("ver"))
    val admittedAll = curated
      .join(broadcast(ids.select($"vec_id").distinct()), Seq("vec_id"), "left_semi")
    val admittedVecs =
      if (hasVer)
        admittedAll.groupBy($"vec_id")
          .agg(max_by($"embedding", $"ver").as("embedding"))
      else admittedAll.select($"vec_id", $"embedding")
    val corpus0 = graft.operators.VectorSearch.withNorms(admittedVecs)
      .select($"vec_id", $"v", $"nrm").as[(Long, Array[Double], Double)]
    // content-addressed codebook: the nCells lowest ADMITTED vec_ids
    // (driver-sized by construction — TakeOrdered, never a full sort)
    val centArr: Array[(Int, Array[Double])] =
      corpus0.orderBy($"vec_id").limit(nCells)
        .select($"vec_id", $"v").as[(Long, Array[Double])].collect()
        .sortBy(_._1).map(_._2).zipWithIndex.map { case (c, i) => (i, c) }
    // cell assignment: the same argmin float fold as the query probe
    // (ties to the lower cell), so probe and corpus agree on geometry
    val corpus = corpus0.mapPartitions { it =>
      it.map { case (id, vec, nrm) =>
        (VectorServeStream.cellOf(centArr, vec), id, vec, nrm)
      }
    }.toDF("cell", "vec_id", "v", "nrm").persist()
    ChainEpoch(version, centArr, corpus)
  }

  /** ADMIT-TIME-INDEXED serve — the 100 TB form of
    * [[serveChainRefreshed]]: the admitted manifest itself is the ANN
    * index. The chain assigns each admitted row's coarse cell AT
    * ADMISSION ([[PipelineE2E]] `serveIndexedAdmit`: one stateless map
    * over trigger-bounded rows against the broadcast codebook, inside
    * the budget query), so the manifest lands cell-keyed with vector
    * and norm already computed — this serve does NO store re-read and
    * NO per-epoch corpus rebuild: per micro-batch one
    * [[manifestVersion]] pointer probe, and a moved pointer only
    * re-creates the manifest READ (a pinned listing, no computation);
    * candidates come from the cell equi-join, scanning nprobe/C of
    * the manifest per batch. The codebook is a PARAMETER (the
    * previous snapshot's, exactly as deployed — cell geometry doesn't
    * change because membership did; refresh on drift is the retrain
    * loop's job) and MUST be the one the chain assigned with, or
    * probe and index disagree on geometry — pass the same array to
    * both. Empty/missing manifest serves nothing; real faults
    * propagate ([[readAdmittedIds]] contract). */
  def serveIndexedRefreshed(queries: DataFrame, admittedDir: String,
      centArr: Array[(Int, Array[Double])], checkpoint: String,
      outRoot: String, kCand: Int = 20, kOut: Int = 5,
      nprobe: Int = 2): org.apache.spark.sql.streaming.StreamingQuery = {
    // held epoch, confined to the stream's single micro-batch thread
    var heldVersion: String = null
    var heldCorpus: DataFrame = null
    queries.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val v = manifestVersion(spark, admittedDir)
        if (heldCorpus == null || v != heldVersion) {
          heldCorpus = readAdmittedIndex(spark, admittedDir)
          heldVersion = v
        }
        indexServeBatch(batch, heldCorpus, centArr, kCand, kOut, nprobe,
          outRoot, batchId)
      }
      .start()
  }

  // ------------------------------------------------------------------
  // REINDEX + POINTER SWAP — codebook retrain support for the indexed
  // manifest. A codebook change invalidates the manifest's cell
  // column; the deployment move is an OFFLINE reindex (one batch pass
  // re-assigning cells under the new geometry, written as a NEW
  // manifest version with its codebook riding along under the hidden
  // `_codebook` subdir — manifest and geometry travel together, the
  // index is self-describing) followed by ONE atomic pointer flip.
  // The pointer serve re-reads manifest + codebook only when the
  // pointer (or the pointed manifest's own version) moves — a running
  // serve picks up the retrained index with NO restart, and the
  // invariant the spec pins: at full probe a reindex NEVER changes
  // answers (geometry moves candidates between cells, not in or out
  // of the corpus).
  // ------------------------------------------------------------------

  /** Persist a driver-sized codebook under `dir/_codebook` (hidden —
    * skipped by data listings, the version walk, and the manifest
    * read). */
  private[streaming] def writeCodebook(spark: SparkSession, dir: String,
      centArr: Array[(Int, Array[Double])]): Unit = {
    import spark.implicits._
    centArr.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "cvec").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_codebook")
  }

  /** Collect the codebook a manifest carries (driver-sized). */
  private[streaming] def readCodebook(spark: SparkSession,
      dir: String): Array[(Int, Array[Double])] =
    spark.read.parquet(s"$dir/_codebook")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Re-assign every manifest row's cell and norm under `centArr` and
    * write the result as a new self-describing manifest version at
    * `toDir` (data + `_codebook`). One batch pass — at 100 TB this is
    * a map-only job over the manifest (plus one keyed dedup when the
    * source carries versions), embarrassingly parallel, never
    * touching the document store.
    *
    * COMPACTION SEMANTICS: when the source manifest carries the LWW
    * `ver` column (the live chain's admit-time-indexed manifest), a
    * multi-admitted document collapses to its NEWEST admitted version
    * — the segment-merge discipline: the live tail serves
    * versions-until-compaction, each published version is sealed
    * newest-as-of-publish (and therefore carries no `ver`). Returns
    * the published row count. */
  def reindexAdmitted(spark: SparkSession, fromDir: String,
      centArr: Array[(Int, Array[Double])], toDir: String): Long = {
    // a segmented source (compacting a delta'd version) spans its
    // membership; plain manifests read as themselves
    val fromDirs = versionDirs(fromDir)
    val hasVer = fromDirs
      .exists(d => spark.read.parquet(d).schema.fieldNames.contains("ver"))
    val src0 = readDirsUnion(spark, fromDirs, ReindexDdl + ", ver LONG")
      // a cell-partitioned source (re-reindexing an existing version)
      // appends its partition column to the user schema — project the
      // carried fields explicitly
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("rank_key"), col("cum_tokens"), col("embedding"), col("ver"))
    reindexFullFrom(spark, src0, hasVer, centArr, toDir)
  }

  /** [[reindexAdmitted]] over an EXPLICIT file capture: exactly
    * `files` (a cycle's own enumeration, [[dataFiles]] output) are
    * sealed — never a re-list of the live dir, which can have grown
    * between the capture and the seal. [[ManagedIndex]] full seals use
    * this so `consumed` can be set to precisely what was published:
    * with a re-list, rows landing in the gap would be published in
    * v<N> yet marked unconsumed, re-indexed by the next delta cycle,
    * and served as cross-segment duplicates until the next full seal.
    * An empty capture seals an EMPTY version (schema, zero rows) —
    * never a re-read of the live dir, which has the same race as the
    * nonempty case: files committed between the empty capture and the
    * seal would be published in v<N> while the caller records
    * consumed = ∅, and the next delta cycle would re-index them as
    * cross-segment duplicates. Sealed-empty, those files stay
    * unpublished AND unconsumed, picked up whole next cycle. */
  private[graft] def reindexAdmittedFiles(spark: SparkSession,
      fromDir: String, files: Seq[String],
      centArr: Array[(Int, Array[Double])], toDir: String): Long = {
    if (files.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(ReindexDdl + ", ver LONG"))
      return reindexFullFrom(spark, empty, hasVer = false, centArr, toDir)
    }
    val hasVer =
      spark.read.parquet(files: _*).schema.fieldNames.contains("ver")
    // leaf files, never partitioned table roots — one multi-path read
    val src0 = spark.read.schema(ReindexDdl + ", ver LONG").parquet(files: _*)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("rank_key"), col("cum_tokens"), col("embedding"), col("ver"))
    reindexFullFrom(spark, src0, hasVer, centArr, toDir)
  }

  private val ReindexDdl = "doc_id LONG, lang STRING, n_tokens LONG, " +
    "rank_key LONG, cum_tokens LONG, embedding ARRAY<DOUBLE>"

  /** shared seal body of the two full-reindex forms. */
  private def reindexFullFrom(spark: SparkSession, src0: DataFrame,
      hasVer: Boolean, centArr: Array[(Int, Array[Double])],
      toDir: String): Long = {
    import spark.implicits._
    val ddl = ReindexDdl
    val src =
      if (hasVer)
        src0.groupBy(col("doc_id"))
          .agg(max_by(struct(col("lang"), col("n_tokens"), col("rank_key"),
            col("cum_tokens"), col("embedding")),
            coalesce(col("ver"), lit(0L))).as("b"))
          .select(col("doc_id"), col("b.lang"), col("b.n_tokens"),
            col("b.rank_key"), col("b.cum_tokens"), col("b.embedding"))
      else src0.drop("ver")
    val re = src
      .as[(Long, String, Long, Long, Long, Array[Double])]
      .mapPartitions { it =>
        it.map { case (id, lang, nt, rk, ct, emb) =>
          (id, lang, nt, rk, ct,
            VectorServeStream.cellOf(centArr, emb),
            VectorServeStream.normOf(emb), emb)
        }
      }
      .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens",
        "cell", "nrm", "embedding")
    // PARTITIONED BY CELL: the layout that makes the serve's
    // per-batch scan term genuinely nprobe/C — the probed-cell filter
    // ([[indexServeBatch]]) prunes whole partitions instead of
    // post-filtering a full manifest scan (measured: without this the
    // indexed steady cycle LOSES to the memory-pinned chain corpus at
    // 320k rows; with it the scan touches only probed directories)
    re.write.mode("overwrite").partitionBy("cell").parquet(toDir)
    writeCodebook(spark, toDir, centArr)
    // a sealed version is its own single segment (uniform membership
    // contract for segment-aware readers)
    writeSegments(toDir, Seq(toDir))
    spark.read.schema(ddl).parquet(toDir).count()
  }

  /** List a manifest's data files — the unit of incremental
    * consumption for delta reindexing. Enumeration uses the SAME
    * source of truth the manifest READS use ([[readAdmittedIds]] /
    * [[readAdmittedIndex]]): for a dir written by a streaming file
    * sink (`_spark_metadata` present) the file list comes from the
    * sink's COMMIT LOG (the metadata-log file index behind
    * `spark.read`), so an orphaned part file from a crashed epoch —
    * present on disk but never committed — is invisible here exactly
    * as it is to the serve path; a raw walk would index it, producing
    * served rows the admitted manifest never committed. Plain dirs
    * keep the recursive hidden-aware walk. */
  private[graft] def dataFiles(spark: SparkSession,
      dir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return Seq.empty
    if (fs.exists(new org.apache.hadoop.fs.Path(path, "_spark_metadata")))
      // explicit schema bypasses inference (zero committed files must
      // enumerate empty, not fail); inputFiles is the commit-log-driven
      // file index — the one readAdmittedIds' read resolves against
      return spark.read.schema("doc_id LONG").parquet(dir)
        .inputFiles.toSeq.sorted
    val acc = Seq.newBuilder[String]
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (st.isFile && n.endsWith(".parquet")) acc += st.getPath.toString
          else if (st.isDirectory) walk(st.getPath)
        }
      }
    walk(path)
    acc.result().sorted
  }

  /** DELTA reindex — the incremental-compaction form: only `files`
    * (the manifest data files not yet consumed by an earlier segment)
    * are read, assigned under `centArr` and written as a NEW SEGMENT
    * at `toDir`; the version's `_segments` membership file lists
    * `prevSegments :+ toDir`, and a segment-aware read
    * ([[readVersionRaw]] / [[readAdmittedIndex]]) unions the listed
    * dirs — merge-on-read. Per cycle the work is DELTA-SIZED, not
    * corpus-sized; the trade is the segment model's own: cross-segment
    * duplicate versions of an updated doc serve until the next FULL
    * compaction seals ([[reindexAdmitted]] — newest-wins, single
    * segment), exactly the versions-until-compaction contract the
    * live tail already documents. Returns the delta row count. */
  def reindexDelta(spark: SparkSession, files: Seq[String],
      centArr: Array[(Int, Array[Double])], toDir: String,
      prevSegments: Seq[String]): Long = {
    import spark.implicits._
    val ddl = "doc_id LONG, lang STRING, n_tokens LONG, rank_key LONG, " +
      "cum_tokens LONG, embedding ARRAY<DOUBLE>"
    // `ver` is CARRIED into the segment (null when the source manifest
    // has none): the tiered compaction ([[compactSegments]]) dedups a
    // doc's cross-segment versions newest-wins by it, so a merge never
    // has to re-read the raw manifest to restore LWW semantics
    val re = spark.read.schema(ddl + ", ver LONG").parquet(files: _*)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("rank_key"), col("cum_tokens"), col("embedding"), col("ver"))
      .as[(Long, String, Long, Long, Long, Array[Double], Option[Long])]
      .mapPartitions { it =>
        it.map { case (id, lang, nt, rk, ct, emb, ver) =>
          (id, lang, nt, rk, ct,
            VectorServeStream.cellOf(centArr, emb),
            VectorServeStream.normOf(emb), emb, ver)
        }
      }
      .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens",
        "cell", "nrm", "embedding", "ver")
    re.write.mode("overwrite").partitionBy("cell").parquet(toDir)
    writeCodebook(spark, toDir, centArr)
    writeSegments(toDir, prevSegments :+ toDir)
    spark.read.schema(ddl).parquet(toDir).count()
  }

  /** TIERED SEGMENT COMPACTION — the reseal without the corpus-sized
    * re-read (round-18; the r17 soak named the every-8th-cycle full
    * seal as the serving path's ONE still-growing cost: it re-read the
    * WHOLE admitted manifest, linear in corpus size, and the RocksDB
    * soak's late-window lag drift tracked exactly that term). Merges
    * the given SEGMENT dirs — already-assigned rows, so no `cellOf`
    * recompute and never a raw-manifest read — into one new segment at
    * `toDir`, collapsing a doc's cross-segment duplicates NEWEST-WINS
    * by the carried `ver` (tie / no ver → the later segment wins:
    * `segDirs` is chronological). The merged segment keeps `ver`, so
    * it composes under further merges. Work is TIER-SIZED: the
    * [[ManagedIndex]] merge policy only fires when the newer run has
    * grown to its predecessor's size, so rewrite cost is geometric
    * (amortized O(N log N) over corpus life) instead of linear per
    * cap-hit. `_segments` membership = `keepSegments :+ toDir`. */
  private[graft] def compactSegments(spark: SparkSession,
      segDirs: Seq[String], centArr: Array[(Int, Array[Double])],
      toDir: String, keepSegments: Seq[String]): Long = {
    val ddl = "doc_id LONG, lang STRING, n_tokens LONG, rank_key LONG, " +
      "cum_tokens LONG, cell INT, nrm DOUBLE, embedding ARRAY<DOUBLE>, " +
      "ver LONG"
    val src = segDirs.zipWithIndex.map { case (d, i) =>
      spark.read.schema(ddl).parquet(d)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("rank_key"),
          col("cum_tokens"), col("cell"), col("nrm"), col("embedding"),
          col("ver"), lit(i).as("seg"))
    }.reduce(_.unionByName(_))
    val merged = src
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("lang"), col("n_tokens"), col("rank_key"),
        col("cum_tokens"), col("cell"), col("nrm"), col("embedding"),
        col("ver")),
        struct(coalesce(col("ver"), lit(0L)), col("seg"))).as("b"))
      .select(col("doc_id"), col("b.lang"), col("b.n_tokens"),
        col("b.rank_key"), col("b.cum_tokens"), col("b.cell"), col("b.nrm"),
        col("b.embedding"), col("b.ver"))
    merged.write.mode("overwrite").partitionBy("cell").parquet(toDir)
    writeCodebook(spark, toDir, centArr)
    writeSegments(toDir, keepSegments :+ toDir)
    spark.read.schema(ddl).parquet(toDir).count()
  }

  /** Hadoop configuration for the small-file helpers below (segment
    * membership, pointer). The active session's, so fs.* settings
    * travel; a bare default only outside any session (tooling). */
  private def hconf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Atomic small-file publish through the Hadoop FS API (every
    * sibling publish in this file goes through it — a java.nio path
    * would silently break on any non-local store): temp write + one
    * FileContext OVERWRITE rename, the HDFSMetadataLog discipline — a
    * reader sees the old content or the new, never a partial. */
  private def writeFileAtomic(target: org.apache.hadoop.fs.Path,
      content: String): Unit = {
    val conf = hconf()
    val fs = target.getFileSystem(conf)
    fs.mkdirs(target.getParent)
    val tmp = new org.apache.hadoop.fs.Path(
      target.getParent, s".${target.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, conf)
    fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    ()
  }

  private def readFileFully(p: org.apache.hadoop.fs.Path): Option[String] = {
    val fs = p.getFileSystem(hconf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Write the version's segment membership (hidden `_segments`, one
    * dir per line; temp + atomic rename). */
  private[streaming] def writeSegments(dir: String, segments: Seq[String]): Unit =
    writeFileAtomic(
      new org.apache.hadoop.fs.Path(dir, "_segments"), segments.mkString("\n"))

  /** The dirs a version's read spans: its `_segments` membership when
    * present (merge-on-read), else the version dir itself. */
  private[streaming] def versionDirs(dir: String): Seq[String] =
    readFileFully(new org.apache.hadoop.fs.Path(dir, "_segments"))
      .map(_.split("\n").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq(dir))

  /** Load several version/segment dirs as ONE frame under an explicit
    * schema: each dir is its own cell-partitioned table root, so a
    * naive multi-path read trips partition-root discovery — load
    * separately, union by name. */
  private[streaming] def readDirsUnion(spark: SparkSession,
      dirs: Seq[String], ddl: String): DataFrame =
    dirs.map(d => spark.read.schema(ddl).parquet(d))
      .reduce(_.unionByName(_))

  /** Segment-aware raw read of a version's (doc_id, cell, embedding,
    * nrm) — the shared input of the balance counts, the Lloyd round
    * and the recall gate. */
  private[graft] def readVersionRaw(spark: SparkSession,
      dir: String): DataFrame =
    readDirsUnion(spark, versionDirs(dir),
      "doc_id LONG, cell INT, nrm DOUBLE, embedding ARRAY<DOUBLE>")
      .select(col("doc_id"), col("cell"), col("nrm"), col("embedding"))

  /** Atomically advance the index pointer: the file's content is the
    * current manifest dir. Temp-write + rename — a reader sees the old
    * version or the new, never a partial. */
  def advancePointer(pointerFile: String, dir: String): Unit =
    writeFileAtomic(new org.apache.hadoop.fs.Path(pointerFile), dir)

  private def readPointer(pointerFile: String): Option[String] =
    readFileFully(new org.apache.hadoop.fs.Path(pointerFile)).map(_.trim)

  /** [[serveIndexedRefreshed]] behind a POINTER: per micro-batch one
    * pointer read (+ the pointed manifest's own version probe); a
    * flip re-reads manifest AND codebook (the manifest's `_codebook`
    * — geometry travels with the index, so the prober can never
    * disagree with the cells it scans). This is the serve that rides
    * through a codebook RETRAIN without restart: offline
    * [[reindexAdmitted]] to a new version dir, [[advancePointer]],
    * and the next micro-batch answers under the new geometry. No
    * pointer yet → serve nothing (by design); faults propagate. */
  def serveIndexedPointer(queries: DataFrame, pointerFile: String,
      checkpoint: String, outRoot: String,
      kCand: Int = 20, kOut: Int = 5,
      nprobe: Int = 2): org.apache.spark.sql.streaming.StreamingQuery = {
    // held epoch, confined to the stream's single micro-batch thread
    var heldVersion: String = null
    var heldCorpus: DataFrame = null
    var heldCents: Array[(Int, Array[Double])] = Array.empty
    queries.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val ptr = readPointer(pointerFile)
        val v = ptr.fold("")(d => s"$d@${manifestVersion(spark, d)}")
        if (heldCorpus == null || v != heldVersion) {
          ptr match {
            case Some(d) =>
              heldCorpus = readAdmittedIndex(spark, d)
              heldCents = readCodebook(spark, d)
            case None =>
              heldCorpus = emptyIndex(spark)
              heldCents = Array.empty
          }
          heldVersion = v
        }
        indexServeBatch(batch, heldCorpus, heldCents, kCand, kOut, nprobe,
          outRoot, batchId)
      }
      .start()
  }

  /** shared per-batch body of the indexed serves: probe → cell
    * equi-join → MMR re-rank → exactly-once epoch publish. */
  private def indexServeBatch(batch: DataFrame, corpus: DataFrame,
      centArr: Array[(Int, Array[Double])], kCand: Int, kOut: Int,
      nprobe: Int, outRoot: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // probe once (persisted for the batch — reused by the cell list
    // AND the candidate join, unpersisted before return so a
    // long-running serve never accumulates blocks), then PRUNE the
    // manifest scan to the probed cells: the list is driver-sized
    // (≤ queries × nprobe ints) and, with the cell-partitioned index
    // layout, the isin filter prunes whole partitions — the per-batch
    // scan term is nprobe/C of the manifest, not a full scan
    // post-filtered by the join
    val probed = VectorServeStream.probeQueries(batch, centArr, nprobe)
      .toDF().persist()
    try {
      val cells = probed.select($"cell").distinct().as[Int].collect()
      val cand = probed
        .join(corpus.filter($"cell".isin(cells.map(Int.box): _*)), Seq("cell"))
        .filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id",
          (org.apache.spark.sql.graftexpr.VectorFunctions
            .dot_product($"qv", $"v") / ($"qnrm" * $"nrm")).as("cos"),
          $"v", $"nrm")
        .as[MmrCand]
      val hits = cand.groupByKey(_.qid)
        .flatMapGroups((qid: Long, rows: Iterator[MmrCand]) =>
          rerank(qid, rows, kCand, kOut))
      OplogPipeline.writeIndexBatch(hits.toDF(), outRoot, batchId, "serve")
    } finally {
      probed.unpersist()
      ()
    }
  }

  /** Read the cell-keyed admitted index as (cell, vec_id, v, nrm) —
    * same emptiness/failure discipline as [[readAdmittedIds]], with
    * the index columns projected by explicit schema. */
  private val IndexDdl = "doc_id LONG, cell INT, nrm DOUBLE, embedding ARRAY<DOUBLE>"

  private def projectIndex(df: DataFrame): DataFrame = df.select(col("cell"),
    col("doc_id").as("vec_id"), col("embedding").as("v"), col("nrm"))

  /** the (cell, vec_id, v, nrm) frame with zero rows — what a missing
    * index serves against. */
  private[streaming] def emptyIndex(spark: SparkSession): DataFrame =
    projectIndex(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(IndexDdl)))

  private[streaming] def readAdmittedIndex(spark: SparkSession,
      admittedDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(admittedDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) emptyIndex(spark)
    else if (fs.exists(new org.apache.hadoop.fs.Path(path, "_segments")))
      // a segmented version: merge-on-read over its membership
      projectIndex(readDirsUnion(spark, versionDirs(admittedDir), IndexDdl))
    else if (fs.exists(new org.apache.hadoop.fs.Path(path, "_spark_metadata")) ||
        hasParquetData(fs, path))
      projectIndex(spark.read.schema(IndexDdl).parquet(admittedDir))
    else emptyIndex(spark)
  }

  /** Read the admitted manifest as a one-column `vec_id` frame, with
    * the serve-nothing fallback NARROWED to the genuinely-empty case:
    * only a missing directory or one holding no committed parquet data
    * files means "nothing admitted yet" (the live chain pre-creates
    * the handoff dir before any admission lands). Any OTHER failure —
    * transient IO, a corrupt or partially-visible file, permissions —
    * PROPAGATES, which FAILS the streaming query (a foreachBatch
    * exception terminates it); a restart replays the batch from the
    * checkpoint, so no query vector is ever silently skipped — the
    * previous broad `Try(...).getOrElse(empty)` would instead commit
    * an empty serve epoch and advance the checkpoint past those query
    * vectors forever (silent query loss on a transient fault). The
    * expected supervisor policy is restart-from-checkpoint, the same
    * contract every other stage of the chain runs under.
    *
    * Emptiness is judged from the SAME source of truth the read uses:
    *  - a dir written by a streaming FILE SINK (`_spark_metadata`
    *    present): the read's file index is the sink's commit log, so
    *    a raw listing can disagree with it in both directions (an
    *    orphaned uncommitted part file is NOT data; zero committed
    *    files must serve empty, not fail schema inference). Passing
    *    the explicit one-column schema bypasses inference — zero
    *    committed files yields an empty frame, orphans are ignored by
    *    the log-driven index, and a corrupt COMMITTED file still
    *    fails the scan loudly.
    *  - a plain dir: a recursive probe for `*.parquet` data files,
    *    skipping hidden (`_`/`.`-prefixed) entries at every depth, so
    *    a partitioned layout (`lang=…` dirs holding `part-….parquet`)
    *    counts as data instead of silently serving nothing.
    * At cluster scale the same check is an epoch-pointer read
    * ([[serveEpochRefreshed]] does exactly that). */
  private[streaming] def readAdmittedIds(spark: SparkSession,
      admittedDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(admittedDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val empty = spark.range(0).select(col("id").as("vec_id"))
    if (!fs.exists(path)) return empty
    if (fs.exists(new org.apache.hadoop.fs.Path(path, "_spark_metadata")))
      spark.read.schema("doc_id LONG").parquet(admittedDir)
        .select(col("doc_id").as("vec_id"))
    else if (hasParquetData(fs, path))
      spark.read.parquet(admittedDir).select(col("doc_id").as("vec_id"))
    else empty
  }

  /** Cheap manifest VERSION probe — the driver-side epoch pointer.
    * For a dir written by a streaming file sink the commit log under
    * `_spark_metadata` IS the pointer: one small-dir listing of batch
    * files (a handful of names, independent of data size) changes
    * exactly when an epoch commits. For a plain dir the version is
    * the recursive visible-data-file signature (name:length, sorted)
    * — same layout tolerance as [[readAdmittedIds]], so a partitioned
    * manifest never reads as permanently unchanged. Missing dir →
    * `""` (sorts before any real version, so the first epoch is a
    * change). */
  private[streaming] def manifestVersion(spark: SparkSession,
      dir: String): String = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return ""
    val meta = new org.apache.hadoop.fs.Path(path, "_spark_metadata")
    if (fs.exists(meta))
      fs.listStatus(meta).map(_.getPath.getName)
        .filterNot(_.startsWith(".")).sorted.mkString(",")
    else {
      val acc = Seq.newBuilder[String]
      def walk(p: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(p).foreach { st =>
          val n = st.getPath.getName
          if (!n.startsWith("_") && !n.startsWith(".")) {
            if (st.isFile && n.endsWith(".parquet"))
              acc += s"$n:${st.getLen}"
            else if (st.isDirectory) walk(st.getPath)
          }
        }
      walk(path)
      acc.result().sorted.mkString(",")
    }
  }

  /** Depth-unbounded probe for visible `*.parquet` data files under
    * `p`, skipping hidden entries (the `_`/`.` prefix convention the
    * parquet reader itself applies) at every level. */
  private def hasParquetData(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean = {
    val visible = fs.listStatus(p).filterNot { st =>
      val n = st.getPath.getName
      n.startsWith("_") || n.startsWith(".")
    }
    visible.exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")) ||
      visible.exists(st => st.isDirectory && hasParquetData(fs, st.getPath))
  }

  /** Spark `round(1e6 * x)`: BigDecimal HALF_UP on the double value. */
  private def micro(x: Double): Long =
    java.math.BigDecimal.valueOf(1e6 * x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** The batch MMR rule over one query's candidate iterator: top-kCand
    * by (cos desc, vec_id), step 1 = pure relevance (score rel·10),
    * steps 2..kOut maximize 7·rel − 3·maxRedundancy with ties to the
    * smaller vec_id. */
  private[streaming] def rerank(qid: Long, rows: Iterator[MmrCand],
      kCand: Int, kOut: Int): Iterator[MmrHit] = {
    val top = rows.toArray.sortBy(c => (-c.cos, c.vec_id)).take(kCand)
    if (top.isEmpty) return Iterator.empty
    val n = top.length
    val rel = top.map(c => micro(c.cos))
    // pairwise candidate-candidate micro-cosines (same fold order as
    // the dot_product expression: ascending index, one running sum)
    val cc = Array.ofDim[Long](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (i != j) {
          val a = top(i).v; val b = top(j).v
          var s = 0.0
          var k = 0
          while (k < a.length) { s += a(k) * b(k); k += 1 }
          cc(i)(j) = micro(s / (top(i).nrm * top(j).nrm))
        }
        j += 1
      }
      i += 1
    }
    val selected = Array.newBuilder[MmrHit]
    val taken = Array.fill(n)(false)
    // step 1: pure relevance, ties to the smaller vec_id
    var best = -1
    i = 0
    while (i < n) {
      if (best < 0 || rel(i) > rel(best) ||
        (rel(i) == rel(best) && top(i).vec_id < top(best).vec_id)) best = i
      i += 1
    }
    taken(best) = true
    selected += MmrHit(qid, 1, top(best).vec_id, rel(best) * 10L)
    var step = 2
    while (step <= math.min(kOut, n)) {
      var bi = -1
      var bScore = 0L
      i = 0
      while (i < n) {
        if (!taken(i)) {
          var maxRed = Long.MinValue
          var j = 0
          while (j < n) {
            if (taken(j) && cc(i)(j) > maxRed) maxRed = cc(i)(j)
            j += 1
          }
          val score = rel(i) * 7L - (if (maxRed == Long.MinValue) 0L else maxRed) * 3L
          if (bi < 0 || score > bScore ||
            (score == bScore && top(i).vec_id < top(bi).vec_id)) {
            bi = i; bScore = score
          }
        }
        i += 1
      }
      taken(bi) = true
      selected += MmrHit(qid, step, top(bi).vec_id, bScore)
      step += 1
    }
    selected.result().iterator
  }
}
