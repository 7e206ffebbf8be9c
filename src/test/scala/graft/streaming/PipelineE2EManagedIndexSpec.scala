package graft.streaming

import graft.SparkSuite
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE WHOLE PRODUCTION TOPOLOGY IN ONE RUN: the live indexed chain
  * (ingest → apply → curation → budget writing the cell-keyed admitted
  * manifest) + [[ManagedIndex]] watching that SINK-WRITTEN manifest
  * (commit-log version probe, delta cycles over the sink's fresh part
  * files, immutable versions behind the pointer) + a
  * [[MmrServeStream.serveIndexedPointer]] serve answering from the
  * published versions — three independently-specced components
  * composed end to end. Pinned: after each wave the pointer serve
  * answers EXACTLY the kernel replay over that wave's admitted ids,
  * and the second cycle is a DELTA (its version's own data is exactly
  * the new admissions, fresh-file-sized work over a live sink
  * manifest). */
class PipelineE2EManagedIndexSpec extends SparkSuite {

  private val Budget = 2000L
  private val WaveSplit = 250L
  // the delta-cycle test splits 350/150: wave 2 strictly SMALLER than
  // the base, so the tiered binary-counter policy (round 18) never
  // folds it into the base — the multi-segment delta shape under test
  // is deterministic regardless of how many cycles wave 2 lands in
  // (equal 250/250 waves folded to one segment whenever wave 2 drained
  // in a single cycle, a timing-dependent flake)
  private val DeltaSplit = 350L

  private def uniqueDocsE: DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .withColumn("rk", row_number().over(
        Window.partitionBy(TextFns.fingerprint(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as("doc_id"),
        expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    docs.join(vecs, "doc_id")
  }

  private def replay(qids: Seq[Long], corpusIds: Set[Long],
      vecs: Map[Long, Array[Double]]): Set[(Long, Int, Long, Long)] = {
    def nrm(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    qids.flatMap { qid =>
      val qv = vecs(qid); val qn = nrm(qv)
      val cands = corpusIds.toSeq.filter(_ != qid).sorted.map { id =>
        val v = vecs(id); val n = nrm(v)
        var s = 0.0; var i = 0
        while (i < v.length) { s += qv(i) * v(i); i += 1 }
        MmrCand(qid, id, s / (qn * n), v, n)
      }
      MmrServeStream.rerank(qid, cands.iterator, 20, 5)
    }.map(h => (h.qid, h.step, h.vec_id, h.mmr_score)).toSet
  }

  test("chain -> ManagedIndex -> pointer serve: exact per wave, delta second cycle") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-midx")
      .toFile.getAbsolutePath
    val serveRoot = java.nio.file.Files.createTempDirectory("graft-e2e-midxs")
      .toFile.getAbsolutePath
    val in = java.nio.file.Files.createTempDirectory("graft-e2e-midxq")
    val scratch = java.nio.file.Files.createTempDirectory("graft-e2e-midxscr")
    try {
      val docs = uniqueDocsE.localCheckpoint()
      val cap = docs.groupBy($"source").count().agg(max($"count"))
        .head().getLong(0).toInt + 1
      val gated = docs.filter(
        size(TextFns.tokens($"text")) >= CurationStream.QualityMinTokens)
      val base = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, Budget)
      val vecs: Map[Long, Array[Double]] =
        graft.Tables.load(spark, sf0001, "embeddings")
          .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
          .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
      def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
        val tmp = scratch.resolve(name)
        spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
          .coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
        ()
      }
      def served() = spark.read.json(s"$serveRoot/serve/batch=*")
        .select($"data.qid".as("qid"), $"data.step".cast("int").as("step"),
          $"data.vec_id".as("vec_id"), $"data.mmr_score".as("mmr_score"))
        .as[(Long, Int, Long, Long)].collect()
      def admittedIds() = spark.read.schema(PipelineE2E.admitSchema)
        .parquet(s"$root/admitted").select($"doc_id").as[Long].collect().toSet

      // the monitor may cycle several times while a wave drains (one
      // per manifest commit it observes) — assertions key on the
      // POINTED version's coverage, never on a cycle count
      def awaitIndexed(n: Long, timeoutMs: Long = 30000): Boolean = {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        def covered(): Boolean = {
          val p = java.nio.file.Paths.get(s"$serveRoot/POINTER")
          // the WHOLE probe sits in the Try: the pointer's atomic
          // replace is a rename-with-overwrite, which on the local FS
          // has a brief absent window between exists() and the read
          // (observed once as NoSuchFileException under suite load)
          scala.util.Try {
            val dir = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
            MmrServeStream.readVersionRaw(spark, dir).count() == n
          }.getOrElse(false)
        }
        while (!covered() && System.nanoTime() < deadline) Thread.sleep(100)
        covered()
      }
      val cb = VectorServeStream.codebookFrom(spark, s"$sf0001/embeddings.parquet")
      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours",
        serveNprobe = 16, serveFromChain = Some(s"$sf0001/embeddings.parquet"),
        serveIndexedAdmit = true)
      val idx = ManagedIndex.start(spark, s"$root/admitted",
        s"$serveRoot/versions", s"$serveRoot/POINTER", cb, pollMs = 400L)
      val q = MmrServeStream.serveIndexedPointer(
        graft.Tables.loadStream(spark, in.toString, "embeddings",
          s"$sf0001/embeddings.parquet"),
        s"$serveRoot/POINTER", s"$serveRoot/ckpt", serveRoot, nprobe = 16)
      try {
        // ---- wave 1: chain admits → v1 published → exact serve ----
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" < DeltaSplit),
          root, PipelineE2E.defaultTopology, "w1",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val admitW1 = admittedIds()
        assert(admitW1.nonEmpty)
        assert(idx.awaitVersions(1), "the chain's manifest must roll v1")
        assert(awaitIndexed(admitW1.size),
          "the pointed version must cover every wave-1 admission")
        addQueries(col("vec_id") < 4, "qa")
        q.processAllAvailable()
        val phase1 = served()
        assert(phase1.map(t => (t._1, t._2, t._3, t._4)).toSet ==
          replay(0L until 4L, admitW1, vecs),
          "the pointer serve must answer exactly over wave-1 admissions")

        // ---- wave 2: DELTA cycle over the sink's fresh part files ----
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" >= DeltaSplit),
          root, PipelineE2E.defaultTopology, "w2",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val nv1 = idx.versions
        val admitW2 = admittedIds()
        assert(admitW2.size > admitW1.size)
        assert(idx.awaitVersions(nv1 + 1), "wave-2 admissions must roll a version")
        assert(awaitIndexed(admitW2.size),
          "the pointed version must cover every wave-2 admission")
        // incremental: the post-wave-1 cycles were DELTAS — the
        // pointed version is a multi-segment union whose latest
        // segment holds only fresh admissions, not a full reseal
        val ptr = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$serveRoot/POINTER")), "UTF-8").trim
        val segs = MmrServeStream.versionDirs(ptr)
        assert(segs.size >= 2, s"wave 2 must append delta segments, got $segs")
        val lastOwn = spark.read.parquet(ptr).count()
        assert(lastOwn < admitW2.size,
          s"the latest segment must be delta-sized ($lastOwn of ${admitW2.size})")
        addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "qb")
        q.processAllAvailable()
        val phase2 = served()
        val bHits = phase2.filter(t => t._1 >= 4 && t._1 < 8)
          .map(t => (t._1, t._2, t._3, t._4)).toSet
        assert(bHits == replay(4L until 8L, admitW2, vecs),
          "the pointer serve must answer exactly over the grown corpus")
      } finally {
        q.stop()
        idx.stop()
        chain.stop()
      }
    } finally {
      Seq(root, serveRoot).foreach(d =>
        new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
      Seq(in, scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("update wave through budgetLww + seal: the pointed version serves LWW-newest") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-midxu")
      .toFile.getAbsolutePath
    val serveRoot = java.nio.file.Files.createTempDirectory("graft-e2e-midxus")
      .toFile.getAbsolutePath
    val in = java.nio.file.Files.createTempDirectory("graft-e2e-midxuq")
    val scratch = java.nio.file.Files.createTempDirectory("graft-e2e-midxuscr")
    try {
      val docs = uniqueDocsE.localCheckpoint()
      val cap = docs.groupBy($"source").count().agg(max($"count"))
        .head().getLong(0).toInt + 50
      val gated = docs.filter(
        size(TextFns.tokens($"text")) >= CurationStream.QualityMinTokens)
      val base = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, Budget)
      val vecs: Map[Long, Array[Double]] =
        graft.Tables.load(spark, sf0001, "embeddings")
          .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
          .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
      def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
        val tmp = scratch.resolve(name)
        spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
          .coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
        ()
      }
      def served() = spark.read.json(s"$serveRoot/serve/batch=*")
        .select($"data.qid".as("qid"), $"data.step".cast("int").as("step"),
          $"data.vec_id".as("vec_id"), $"data.mmr_score".as("mmr_score"))
        .as[(Long, Int, Long, Long)].collect()
      def admittedVer() = spark.read
        .schema("doc_id LONG, ver LONG")
        .parquet(s"$root/admitted")
        .select($"doc_id", $"ver").as[(Long, Long)].collect()
      def awaitIndexed(n: Long, timeoutMs: Long = 30000): Boolean = {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        def covered(): Boolean = {
          val p = java.nio.file.Paths.get(s"$serveRoot/POINTER")
          // the WHOLE probe sits in the Try: the pointer's atomic
          // replace is a rename-with-overwrite, which on the local FS
          // has a brief absent window between exists() and the read
          // (observed once as NoSuchFileException under suite load)
          scala.util.Try {
            val dir = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
            MmrServeStream.readVersionRaw(spark, dir).count() == n
          }.getOrElse(false)
        }
        while (!covered() && System.nanoTime() < deadline) Thread.sleep(100)
        covered()
      }
      val cb = VectorServeStream.codebookFrom(spark, s"$sf0001/embeddings.parquet")
      // budgetLww: the chain's admission is the update-aware ledger;
      // maxSegments = 1: EVERY maintenance cycle folds down to ONE
      // segment (delta + tiered fold into the base since round 18 —
      // the `ver`-carried merge, never a raw-manifest re-read), i.e.
      // the segment model's compaction — a multi-admitted doc's
      // versions collapse newest-wins in every published version, so
      // the pointed serve is deterministic LWW the whole run
      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours",
        serveNprobe = 16, serveFromChain = Some(s"$sf0001/embeddings.parquet"),
        serveIndexedAdmit = true, budgetLww = true)
      val idx = ManagedIndex.start(spark, s"$root/admitted",
        s"$serveRoot/versions", s"$serveRoot/POINTER", cb, pollMs = 400L,
        maxSegments = 1)
      val q = MmrServeStream.serveIndexedPointer(
        graft.Tables.loadStream(spark, in.toString, "embeddings",
          s"$sf0001/embeddings.parquet"),
        s"$serveRoot/POINTER", s"$serveRoot/ckpt", serveRoot, nprobe = 16)
      try {
        // ---- wave 1 ----
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" < WaveSplit),
          root, PipelineE2E.defaultTopology, "w1",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val w1 = admittedVer()
        val admitW1 = w1.map(_._1).toSet
        assert(admitW1.nonEmpty)
        assert(awaitIndexed(admitW1.size))
        addQueries(col("vec_id") < 4, "qa")
        q.processAllAvailable()
        val phase1 = served()
        assert(phase1.map(t => (t._1, t._2, t._3, t._4)).toSet ==
          replay(0L until 4L, admitW1, vecs),
          "wave-1 pointer serve must answer the exact replay")

        // ---- UPDATE wave: new text + NEW embeddings, later clock ----
        val updIds = (100L until 120L)
        val updDocs = docs.filter($"doc_id" >= 100 && $"doc_id" < 120)
          .select($"doc_id", $"source", $"lang",
            concat($"text", lit(" revised edition of this document")).as("text"))
          .join(
            spark.read.parquet(s"$sf0001/embeddings.parquet")
              .filter($"vec_id" >= 400 && $"vec_id" < 420)
              .select(($"vec_id" - 300L).as("doc_id"),
                expr("transform(embedding, x -> cast(x as double))").as("embedding")),
            "doc_id")
        PipelineE2E.writeOplogWave(spark, updDocs,
          root, PipelineE2E.defaultTopology, "wu",
          shardKey = Some(PipelineE2E.shardByLang(2)), tsOffsetSec = 5000L)
        chain.drain()
        // freshness clock starts at drain-complete: everything below
        // until the pointer carries the new vectors is the serving
        // side's own maintenance latency
        val tFresh0 = System.nanoTime()
        val w2 = admittedVer()
        val w1MaxVer = w1.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).max }
        val reAdmitted = w2.filter { case (d, v) =>
          updIds.contains(d) && v > w1MaxVer.getOrElse(d, 0L)
        }.map(_._1).toSet
        assert(reAdmitted.nonEmpty, "fixture must re-admit some updated doc")
        val admitW2 = w2.map(_._1).toSet
        // the seal collapses a twice-admitted doc to ONE served row.
        // NOTE the count alone cannot gate this phase: an update does
        // not change the DISTINCT doc count, so the wave-1 version
        // already satisfies it and under load the serve could answer
        // before the delta cycle re-seals (observed as a suite-order
        // flake) — await the CONTENT the assertion needs: every
        // re-admitted doc's row in the pointed version carries its NEW
        // vector
        assert(awaitIndexed(admitW2.size),
          "the sealed version must hold one row per distinct admitted doc")
        def awaitNewest(ids: Set[Long], timeoutMs: Long = 30000): Boolean = {
          val deadline = System.nanoTime() + timeoutMs * 1000000L
          def covered(): Boolean = {
            val p = java.nio.file.Paths.get(s"$serveRoot/POINTER")
            // whole probe in the Try — the pointer's rename-with-
            // overwrite has a brief absent window on the local FS
            scala.util.Try {
              val dir = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
              val rows = MmrServeStream.readVersionRaw(spark, dir)
                .filter(col("doc_id").isin(ids.toSeq: _*))
                .select(col("doc_id"), col("embedding"))
                .as[(Long, Array[Double])].collect()
              rows.length == ids.size && rows.forall { case (d, e) =>
                java.util.Arrays.equals(e, vecs(d + 300L))
              }
            }.getOrElse(false)
          }
          while (!covered() && System.nanoTime() < deadline) Thread.sleep(100)
          covered()
        }
        assert(awaitNewest(reAdmitted),
          "the pointed version never picked up the update wave's vectors")
        // THE FRESHNESS SLA, stated as a test (round 17): once the
        // update wave has drained into the manifest, the POINTED
        // version must serve every re-admitted doc's NEW vector within
        // one maintenance cycle of the monitor observing the commit —
        // cycle = 0.4 s poll + one full seal over this corpus (~1 s);
        // the bound carries suite-load headroom, and the measured
        // value is recorded in the test report for SCALING.md
        val freshSec = (System.nanoTime() - tFresh0) / 1e9
        info(f"update→pointer freshness: $freshSec%.2f s " +
          "(pollMs=400, maxSegments=1 full seal)")
        // the tight SLA value is a REPORTED metric (the info line above,
        // recorded in SCALING.md), not a hard gate: it is wall-clock
        // through a polling await on a shared CI host, so a loaded
        // neighbor can breach 15 s with zero code defect (round-17
        // ADVICE). GRAFT_STRICT_SLA=1 re-arms the tight bound for
        // dedicated-host runs; the structural freshness contract is
        // already enforced by awaitNewest's own bounded timeout.
        val slaBound =
          if (sys.env.get("GRAFT_STRICT_SLA").contains("1")) 15.0 else 60.0
        assert(freshSec <= slaBound,
          f"pointer freshness $freshSec%.2f s — more than one maintenance " +
            "cycle (+headroom) after the update drained")

        // the serve answers with the NEWEST embedding of every
        // re-admitted doc — the deterministic witness: a doc's NEW
        // vector as the query retrieves that doc at step 1 (cos 1.0)
        val newest = vecs ++ reAdmitted.map(id => id -> vecs(id + 300L))
        addQueries(col("vec_id") >= 400 && col("vec_id") < 420, "qc")
        q.processAllAvailable()
        val phase2 = served()
        val cHits = phase2.filter(t => t._1 >= 400 && t._1 < 420)
          .map(t => (t._1, t._2, t._3, t._4)).toSet
        assert(cHits == replay(400L until 420L, admitW2, newest),
          "post-seal pointer serve must answer over LWW-newest vectors")
        reAdmitted.foreach { id =>
          assert(cHits.exists(t => t._1 == id + 300L && t._2 == 1 && t._3 == id),
            s"query ${id + 300L} (doc $id's new vector) must retrieve doc " +
              s"$id at step 1 — a stale or duplicate version served")
        }
        // wave-1 epochs immutable
        val aBefore = phase1.filter(_._1 < 4).sorted.toSeq
        val aAfter = phase2.filter(_._1 < 4).sorted.toSeq
        assert(aAfter == aBefore, "a pre-update serve epoch changed")
      } finally {
        q.stop()
        idx.stop()
        chain.stop()
      }
    } finally {
      Seq(root, serveRoot).foreach(d =>
        new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
      Seq(in, scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }
}
