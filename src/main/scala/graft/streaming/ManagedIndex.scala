package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SELF-DRIVING INDEX MAINTENANCE — the drift loop's trigger wiring,
  * composing the measured pieces the catalog already ships: a
  * driver-side monitor watches the live admitted manifest
  * ([[MmrServeStream.manifestVersion]] — an epoch-pointer read for
  * sink-written dirs), and on every manifest change publishes a fresh
  * IMMUTABLE index version behind the atomic pointer
  * ([[MmrServeStream.reindexAdmitted]] + `advancePointer`): the
  * periodic-snapshot serving pattern, where a
  * [[MmrServeStream.serveIndexedPointer]] serve picks each version up
  * with no restart and index freshness is one poll + one map-only
  * reindex pass.
  *
  * Each cycle additionally evaluates the version's CELL BALANCE under
  * the current codebook (the [[IvfBalanceStream]] load-factor rule:
  * `max_cell × C × 100 / total`, breach above `breachPct`). A breach
  * fires a RETRAIN — one Lloyd round of exact truncating integer-micro
  * means per (cell, dim), the `vector_ivf_retrain` discipline, fully
  * deterministic — and, if the `retrainGate` accepts the candidate
  * codebook, the cycle re-indexes under the new geometry before
  * flipping the pointer. The gate is the composition point for the
  * recall guard: a deployment passes `vector_retrain_gate`'s
  * breach-AND-recall-retained decision (the catalog operator exists
  * and is oracled); the default accepts, i.e. breach alone retrains.
  * [[MmrServeIndexPointerSpec]]'s invariant makes the whole loop safe
  * to run against a live serve: at full probe a reindex NEVER changes
  * answers, and at production nprobe it only moves which cells hold
  * which candidates.
  *
  * Scale shape: the monitor does one version probe per poll; steady
  * cycles are DELTA-SIZED ([[MmrServeStream.reindexDelta]] — only the
  * manifest files no earlier segment consumed are read and assigned,
  * merge-on-read via the version's `_segments` membership), and
  * compaction is TIERED ([[MmrServeStream.compactSegments]], round 18):
  * when the newest segment has grown to its predecessor's size the two
  * merge — the binary-counter discipline, so segment sizes stay
  * geometric, the segment count stays logarithmic (with `maxSegments`
  * as a hard fold-down cap on read fan-out), and rewrite cost is
  * amortized O(N log N) over corpus life instead of a corpus-linear
  * re-read every cap-hit (the r17 soak's one still-growing
  * serving-path cost — the RocksDB run's late-window lag drift tracked
  * exactly that reseal term). A FULL corpus-sized seal remains only on
  * the first cycle, when the signature moves with no new data files (a
  * replaced file — never serve stale silently), on an accepted
  * retrain (a codebook swap compacts by necessity: every segment's
  * cells are stale), or when the union's SUPERSEDED-ROW fraction
  * crosses `staleFoldPct` (round 19: pure tiering never re-merges the
  * base on an update-heavy / slow-growth corpus — LWW folds SHRINK
  * tiers — so a superseded doc's stale base row would otherwise serve
  * forever through the union-at-read path; the stale-ratio fold
  * bounds served staleness by a declared budget, with cost amortized
  * to update volume rather than corpus life). Balance is a C-row count aggregate, the retrain's
  * mean aggregate moves C×D bigint rows to the driver. Nothing
  * corpus-sized is ever collected (the consumed-file set is
  * driver-held path strings, one per manifest file — the same order as
  * the file-source listing state every stage already keeps).
  * Identical-copy blobs are a known k-means fixed point (one Lloyd
  * round cannot split coincident points — the retrain spec's skewed
  * fixture uses SPREAD clusters for the balance win); the loop still
  * converges because verdicts and geometry stay deterministic. */
object ManagedIndex {

  final class Handle private[ManagedIndex] (
      step: () => Unit,
      signature: () => String,
      pollMs: Long) {
    private[ManagedIndex] val nVersions = new AtomicInteger(0)
    private[ManagedIndex] val nRetrains = new AtomicInteger(0)
    @volatile private[ManagedIndex] var lastLoadPct: Long = 0L
    @volatile private var running = true
    @volatile private var sig: String = ""

    private val monitor = new Thread(() => {
      while (running) {
        Thread.sleep(pollMs)
        val s = try signature() catch { case _: Exception => sig }
        if (running && s != sig && s.nonEmpty) {
          // sig advances only on SUCCESS: a failed cycle (transient
          // IO, a throwing gate) is retried on the next poll instead
          // of silently killing the monitor thread and stranding the
          // manifest change forever
          try { step(); sig = s }
          catch { case e: Exception =>
            System.err.println(s"[managed-index] cycle failed, will retry: $e")
          }
        }
      }
    }, "managed-index-monitor")
    monitor.setDaemon(true)
    monitor.start()

    /** published index versions (each an immutable dir + pointer flip). */
    def versions: Int = nVersions.get()
    /** accepted retrains (codebook actually replaced). */
    def retrains: Int = nRetrains.get()
    /** last cycle's load factor (pct of balanced population). */
    def loadPct: Long = lastLoadPct

    def awaitVersions(n: Int, timeoutMs: Long = 60000): Boolean = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (nVersions.get() < n && System.nanoTime() < deadline) Thread.sleep(50)
      nVersions.get() >= n
    }

    def stop(): Unit = {
      running = false
      monitor.join(10000)
    }
  }

  /** Start the maintenance loop over `manifestDir` (admitted-shaped
    * rows carrying `embedding`), publishing versions under
    * `versionsRoot/v<N>` and flipping `pointerFile` after each. */
  def start(spark: SparkSession, manifestDir: String, versionsRoot: String,
      pointerFile: String, codebook0: Array[(Int, Array[Double])],
      pollMs: Long = 1000L, breachPct: Long = 200L,
      maxSegments: Int = 8,
      retrainGate: (Array[(Int, Array[Double])], Array[(Int, Array[Double])]) => Boolean =
        (_, _) => true,
      keepVersions: Option[Int] = None,
      staleFoldPct: Long = 30L): Handle = {
    @volatile var codebook = codebook0
    // incremental-compaction state, monitor-thread-confined and
    // committed only at the END of a successful cycle (a failed cycle
    // is retried with the pre-cycle state — publishes are
    // overwrite-idempotent, so the retry redoes the same versions)
    var consumed: Set[String] = Set.empty
    var segments: Seq[String] = Seq.empty
    var segSizes: Seq[Long] = Seq.empty
    // the version each completed cycle POINTED to — GC retention is
    // counted in CYCLES, not version numbers (a tier-fold cascade
    // bumps several versions in ONE cycle, so a number-counted window
    // could delete the previously-pointed version the very cycle it
    // was superseded, under a racing serve batch)
    var pointedHistory: Vector[Int] = Vector.empty
    lazy val handle: Handle = new Handle(() => {
      var n = handle.nVersions.get() + 1
      val files = MmrServeStream.dataFiles(spark, manifestDir)
      val fresh = files.filterNot(consumed)
      var newConsumed = consumed
      var newSegments = segments
      var newSizes = segSizes
      var newCodebook = codebook
      var retrained = false
      // 1. publish: DELTA when possible (only the fresh manifest files
      //    are read and assigned — delta-sized work, merge-on-read via
      //    the version's `_segments` membership), then TIERED
      //    compaction; FULL seal only on the first cycle or when the
      //    signature moved without new data files (a replaced file —
      //    never serve stale silently)
      if (segments.nonEmpty && fresh.nonEmpty) {
        val cnt = MmrServeStream.reindexDelta(spark, fresh, newCodebook,
          s"$versionsRoot/v$n", segments)
        newConsumed = consumed ++ fresh
        newSegments = segments :+ s"$versionsRoot/v$n"
        newSizes = segSizes :+ cnt
        // tiered merge (binary-counter): while the newest segment has
        // grown to at least its predecessor's size, fold the two into
        // one TIER-SIZED compaction — sizes stay geometric, the count
        // logarithmic, and no cycle ever re-reads the raw manifest;
        // `maxSegments` stays as a hard fold-down cap on read fan-out
        while (newSegments.length >= 2 && (
            newSizes.last >= newSizes(newSizes.length - 2) ||
            newSegments.length > maxSegments)) {
          n += 1
          val keep = newSegments.dropRight(2)
          val cnt2 = MmrServeStream.compactSegments(spark,
            newSegments.takeRight(2), newCodebook,
            s"$versionsRoot/v$n", keep)
          newSegments = keep :+ s"$versionsRoot/v$n"
          newSizes = newSizes.dropRight(2) :+ cnt2
        }
      } else {
        // seal EXACTLY the captured enumeration, never a re-list of
        // the live dir: rows landing between the capture and the seal
        // stay unconsumed AND unpublished, picked up whole by the next
        // cycle (a re-list would publish them now yet mark them
        // unconsumed — cross-segment duplicates until the next seal)
        val cnt = MmrServeStream.reindexAdmittedFiles(spark, manifestDir,
          files, newCodebook, s"$versionsRoot/v$n")
        newConsumed = files.toSet
        newSegments = Seq(s"$versionsRoot/v$n")
        newSizes = Seq(cnt)
      }
      // 1b. STALE-RATIO BOUND (round 19): under pure tiering an
      //     update-heavy / slow-growth corpus can keep the base
      //     unmerged forever (LWW folds SHRINK tiers, so post-base
      //     tiers may never reach base size) and the plain
      //     union-at-read serve would answer with a superseded doc's
      //     stale base-segment row indefinitely. Bound it: when the
      //     SUPERSEDED fraction of the union (rows minus distinct
      //     docs) crosses `staleFoldPct`, fold EVERY segment — base
      //     included — into one newest-wins seal. The check costs one
      //     count-distinct over the union per multi-segment cycle,
      //     the same cost class as the balance count below; the fold
      //     itself is corpus-sized but fires only when a staleness
      //     budget has actually accrued, so amortized cost stays
      //     bounded by update volume, not corpus life.
      if (newSegments.length >= 2 && staleFoldPct > 0L) {
        val total = newSizes.sum
        val distinct = MmrServeStream.readVersionRaw(spark, s"$versionsRoot/v$n")
          .select(count_distinct(col("doc_id"))).collect()(0).getLong(0)
        if (total > 0L && (total - distinct) * 100L >= staleFoldPct * total) {
          n += 1
          val cnt = MmrServeStream.compactSegments(spark, newSegments,
            newCodebook, s"$versionsRoot/v$n", Seq.empty)
          newSegments = Seq(s"$versionsRoot/v$n")
          newSizes = Seq(cnt)
        }
      }
      // 2. evaluate balance from the version's cells (segment-aware)
      val counts = MmrServeStream
        .readVersionRaw(spark, s"$versionsRoot/v$n")
        .groupBy(col("cell")).count()
        .collect().map(r => r.getLong(1))
      val total = counts.sum
      val load =
        if (total == 0L) 0L
        else counts.max * newCodebook.length * 100L / total
      // 3. breach → deterministic Lloyd round → gate → FULL seal
      //    under the new geometry (a codebook swap always compacts:
      //    every segment's cells are stale)
      if (load > breachPct && total > 0L) {
        val candidate = lloydRound(spark, s"$versionsRoot/v$n", newCodebook)
        if (retrainGate(newCodebook, candidate)) {
          newCodebook = candidate
          retrained = true
          n += 1
          // same captured-enumeration discipline as the cycle's seal
          val cnt = MmrServeStream.reindexAdmittedFiles(spark, manifestDir,
            files, newCodebook, s"$versionsRoot/v$n")
          newConsumed = files.toSet
          newSegments = Seq(s"$versionsRoot/v$n")
          newSizes = Seq(cnt)
        }
      }
      // 4. one atomic flip, then commit the cycle's state
      MmrServeStream.advancePointer(pointerFile, s"$versionsRoot/v$n")
      codebook = newCodebook
      consumed = newConsumed
      segments = newSegments
      segSizes = newSizes
      if (retrained) { handle.nRetrains.incrementAndGet(); () }
      handle.lastLoadPct = load
      // 5. VERSION RETENTION (round 18; CYCLE-COUNTED round 19):
      //    superseded version dirs otherwise accumulate forever —
      //    O(N log N) DISK over corpus life under the tiered model
      //    (the extended soak rolled 127 versions). The retention
      //    window is counted in COMPLETED CYCLES, not version numbers:
      //    the cutoff is the version the keep-th prior cycle POINTED
      //    to, so a reader that read the pointer up to `keep−1` cycles
      //    ago can never touch a deleted dir no matter how many
      //    versions one cycle's fold cascade burned (a number-counted
      //    window deleted the previously-pointed version in the very
      //    cycle that superseded it). Membership-aware on top: a dir
      //    referenced by any retained version's `_segments` (the
      //    tiered base, typically v1-era) SURVIVES regardless of age;
      //    only dirs both below the cutoff AND unreferenced are
      //    deleted. This is the reader-safety CONTRACT the
      //    ManagedIndexSpec slow-reader case pins: a pointer serve
      //    re-probes per batch, so size `keep` ≥ 2 (deployments more)
      //    to the slowest consumer's batch horizon in cycles.
      keepVersions.foreach { k =>
        val keep = math.max(2, k)
        pointedHistory = (pointedHistory :+ n).takeRight(keep)
        if (pointedHistory.length >= keep)
          gcVersions(spark, versionsRoot, pointedHistory.head)
      }
      // the counter advances LAST: awaitVersions(n) means cycle n is
      // fully complete, GC included (asserting disk state right after
      // an await raced a mid-GC window otherwise)
      handle.nVersions.set(n)
      ()
    }, () => MmrServeStream.manifestVersion(spark, manifestDir), pollMs)
    handle
  }

  /** delete version dirs under `versionsRoot` that are BOTH below the
    * retention `cutoff` (the version number the keep-th prior cycle
    * pointed to — versions AT or NEWER than it are retained wholesale,
    * so every version pointed within the last `keep` cycles survives
    * intact) AND unreferenced by any retained version's segment
    * membership. Failures are non-fatal (retried next cycle — GC is
    * idempotent). */
  private[streaming] def gcVersions(spark: SparkSession,
      versionsRoot: String, cutoff: Int): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(versionsRoot)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return
    val dirs = fs.listStatus(rootPath)
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .map(st => st.getPath.getName.stripPrefix("v").toInt -> st.getPath)
      .sortBy(_._1)
    val (old, kept) = dirs.partition(_._1 < cutoff)
    if (old.isEmpty) return
    // membership entries are the dir strings the writers recorded;
    // compare by version NAME under this root (path-scheme agnostic)
    val referenced: Set[String] = kept.flatMap { case (_, p) =>
      MmrServeStream.versionDirs(p.toString)
        .map(d => new org.apache.hadoop.fs.Path(d).getName)
    }.toSet ++ kept.map { case (num, _) => s"v$num" }
    old.foreach { case (_, p) =>
      if (!referenced.contains(p.getName)) {
        try { fs.delete(p, true); () }
        catch { case e: Exception =>
          System.err.println(s"[managed-index] gc of $p failed, will retry: $e")
        }
      }
    }
  }

  /** The RECALL GUARD as a `retrainGate` closure — the composition
    * `vector_retrain_gate` (operators/VectorSearch.scala) promises,
    * bound to the loop: before a candidate codebook is accepted, its
    * serving quality is measured on a held QUERY FIXTURE against the
    * manifest itself — per query, exact top-`k` by brute cosine over
    * the current version's rows vs IVF top-`k` under the CANDIDATE
    * geometry at `nprobe`; the candidate is accepted iff the mean
    * recall (micro-units) is ≥ `minRecallMicro`. A breach alone never
    * swaps geometry that would degrade answers — the same
    * breach-AND-recall-retained rule the oracled batch gate pins,
    * here over the live manifest.
    *
    * Cost shape (per ACCEPTED-breach cycle only, never per batch):
    * one corpus×queries scored pass for the exact side and one for
    * the candidate side — queries are fixture-sized (broadcast), the
    * corpus is scanned twice; at 100 TB the fixture runs over a
    * sampled slice (the dial a deployment sizes, stated here rather
    * than hidden). The gate evaluates against the LATEST published
    * version under `versionsRoot` — during a cycle that is the
    * just-published current-geometry v<N>. */
  def recallGate(spark: SparkSession, queryVecs: Array[(Long, Array[Double])],
      versionsRoot: String, k: Int = 10, nprobe: Int = 2,
      minRecallMicro: Long = 900000L):
      (Array[(Int, Array[Double])], Array[(Int, Array[Double])]) => Boolean =
    (_, candidate) => {
      // Hadoop FS listing, like every other path in the loop — a
      // java.io.File walk is local-only and would fail EVERY breach
      // cycle on a remote versionsRoot, permanently blocking retrains
      val dir = {
        val rootPath = new org.apache.hadoop.fs.Path(versionsRoot)
        val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
        val vs =
          if (fs.exists(rootPath))
            fs.listStatus(rootPath).filter(st =>
              st.isDirectory && st.getPath.getName.matches("v\\d+"))
          else Array.empty[org.apache.hadoop.fs.FileStatus]
        require(vs.nonEmpty, s"no published version under $versionsRoot")
        vs.maxBy(_.getPath.getName.stripPrefix("v").toInt).getPath.toString
      }
      recallMicro(spark, queryVecs, dir, candidate, k, nprobe) >= minRecallMicro
    }

  /** Mean recall@`k` (micro-units) of IVF serving at `nprobe` under
    * `candidate` geometry vs exact brute-force, over a query fixture
    * against the version at `dir` — the measurement [[recallGate]]
    * thresholds and `tools.RecallGateProbe` sweeps. */
  private[graft] def recallMicro(spark: SparkSession,
      queryVecs: Array[(Long, Array[Double])], dir: String,
      candidate: Array[(Int, Array[Double])], k: Int,
      nprobe: Int): Long = {
    import spark.implicits._
    {
      val corpus = MmrServeStream.readVersionRaw(spark, dir)
        .select(col("doc_id"), col("embedding"))
        .as[(Long, Array[Double])]
      val qs = queryVecs
      // one pass: per corpus row, its cosine to EVERY fixture query
      // and its candidate-geometry cell — partial top-k per partition
      // per query would be the 100 TB form; fixture-scale keeps the
      // simple global sort per query (frames are corpus × |fixture|)
      val scored = corpus.mapPartitions { it =>
        it.flatMap { case (id, v) =>
          val nrm = VectorServeStream.normOf(v)
          val cell = VectorServeStream.cellOf(candidate, v)
          qs.iterator.map { case (qid, qv) =>
            var s = 0.0
            var i = 0
            while (i < v.length) { s += qv(i) * v(i); i += 1 }
            (qid, id, s / (VectorServeStream.normOf(qv) * nrm), cell)
          }
        }
      }.toDF("qid", "vec_id", "cos", "cell").persist()
      try {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
        val exact = scored
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
          .select(col("qid"), col("vec_id"))
        val probedCells: Map[Long, Set[Int]] = qs.map { case (qid, qv) =>
          qid -> candidate.map { case (cell, c) =>
            var cc = 0.0
            var qc = 0.0
            var j = 0
            while (j < c.length) { cc += c(j) * c(j); qc += qv(j) * c(j); j += 1 }
            (cc - 2.0 * qc, cell)
          }.sortBy(identity).take(nprobe).map(_._2).toSet
        }.toMap
        val probedDf = broadcast(probedCells.toSeq
          .flatMap { case (q, cs) => cs.map(c => (q, c)) }
          .toDF("qid", "cell"))
        val ivf = scored.join(probedDf, Seq("qid", "cell"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
          .select(col("qid"), col("vec_id"))
        val hits = exact.join(ivf, Seq("qid", "vec_id"), "left_semi").count()
        val total = exact.count()
        if (total == 0L) 1000000L else hits * 1000000L / total
      } finally {
        scored.unpersist()
        ()
      }
    }
  }

  /** One Lloyd round over a published version's assignment: per
    * (cell, dim) the truncating integer-micro mean — exact int64
    * sums, one integer division, one ÷10⁶ back to a double — the
    * `vector_ivf_retrain` arithmetic, so the result is deterministic
    * under any partitioning. Cells with no members keep their current
    * centroid. */
  private[graft] def lloydRound(spark: SparkSession, versionDir: String,
      current: Array[(Int, Array[Double])]): Array[(Int, Array[Double])] = {
    val rows = MmrServeStream.readVersionRaw(spark, versionDir)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(round(lit(1e6) * col("x")).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val byCell = rows.groupBy(_.getInt(0))
    current.map { case (cell, cvec) =>
      byCell.get(cell) match {
        case Some(rs) =>
          val c = cvec.clone()
          rs.foreach { r =>
            c(r.getInt(1)) = (r.getLong(2) / r.getLong(3)).toDouble / 1e6
          }
          (cell, c)
        case None => (cell, cvec)
      }
    }
  }
}
