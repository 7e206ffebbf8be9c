package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[ManagedIndex]] — the drift loop's trigger wiring as a component.
  * Pinned: (1) manifest growth rolls an immutable index version behind
  * the pointer and a running pointer serve answers the exact kernel
  * replay; (2) a planted blob breaches the load-factor rule and fires
  * a retrain whose new codebook EQUALS the driver-replayed
  * integer-micro Lloyd round (deterministic arithmetic); (3) answers
  * remain exact after the automatic retrain+reflip (the full-probe
  * reindex invariant, now exercised end to end by the loop);
  * (4) the retrain gate is consulted — a rejecting gate keeps the
  * codebook while versions still roll. */
class ManagedIndexSpec extends SparkSuite {

  private def vecsMap(): Map[Long, Array[Double]] = {
    import spark.implicits._
    graft.Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
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

  /** stage admitted-shaped rows and MOVE one file into the manifest
    * (atomic appearance — the monitor never sees a partial wave). */
  private def dropWave(manifest: java.nio.file.Path,
      scratch: java.nio.file.Path, name: String,
      rows: Seq[(Long, Array[Double])]): Unit = {
    import spark.implicits._
    val tmp = scratch.resolve(name)
    rows.map { case (id, v) => (id, "en", 10L, 0L, 0L, v.toSeq) }
      .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens", "embedding")
      .coalesce(1).write.parquet(tmp.toString)
    val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, manifest.resolve(s"$name.parquet"))
    ()
  }

  test("growth rolls versions; a blob breaches, retrains exactly, answers stay exact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-midx")
      .toFile.getAbsolutePath
    val manifest = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "admitted"))
    val in = java.nio.file.Files.createTempDirectory("graft-midx-q")
    val scratch = java.nio.file.Files.createTempDirectory("graft-midx-scr")
    try {
      val vecs = vecsMap()
      val cb0: Array[(Int, Array[Double])] =
        (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      val waveA = (100L until 251L).toSeq
      // deterministic no-breach threshold for wave A: one above its
      // own (fixed, content-addressed) load factor
      val countsA = waveA.map(id => VectorServeStream.cellOf(cb0, vecs(id)))
        .groupBy(identity).map(_._2.size)
      val loadA = countsA.max.toLong * cb0.length * 100L / waveA.size
      val breach = loadA + 1

      val h = ManagedIndex.start(spark, manifest.toString,
        s"$root/versions", s"$root/POINTER", cb0,
        pollMs = 300L, breachPct = breach)
      try {
        dropWave(manifest, scratch, "wa", waveA.map(id => (id, vecs(id))))
        assert(h.awaitVersions(1), "wave A must roll v1")
        assert(h.retrains == 0 && h.loadPct == loadA,
          s"wave A must not breach (load ${h.loadPct} vs computed $loadA)")

        // running pointer serve answers exactly
        def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
          val tmp = scratch.resolve(name)
          spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
            .coalesce(1).write.parquet(tmp.toString)
          val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
          ()
        }
        def served() = spark.read.json(s"$root/serve/batch=*")
          .select($"data.qid".as("qid"), $"data.step".cast("int").as("step"),
            $"data.vec_id".as("vec_id"), $"data.mmr_score".as("mmr_score"))
          .as[(Long, Int, Long, Long)].collect()
        val stream = graft.Tables.loadStream(
          spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
        val q = MmrServeStream.serveIndexedPointer(stream, s"$root/POINTER",
          s"$root/ckpt", root, nprobe = 16)
        try {
          addQueries(col("vec_id") < 4, "qa")
          q.processAllAvailable()
          assert(served().map(t => (t._1, t._2, t._3, t._4)).toSet ==
            replay(0L until 4L, waveA.toSet, vecs),
            "v1 pointer serve must answer the exact replay")

          // identical-copy blob: lands in ONE cell, guaranteed breach
          val blobIds = (1000L until 1150L).toSeq
          val allVecs = vecs ++ blobIds.map(_ -> vecs(130L))
          dropWave(manifest, scratch, "wb", blobIds.map(id => (id, vecs(130L))))
          assert(h.awaitVersions(3), "wave B must roll v2 (breached) then v3")
          assert(h.retrains == 1, "the breach must fire exactly one retrain")
          assert(h.loadPct > breach, "the recorded load must be the breach")

          // the retrained codebook equals the driver-replayed
          // integer-micro Lloyd round over v2's assignment
          val allIds = waveA ++ blobIds
          val assign = allIds.map(id => id -> VectorServeStream.cellOf(cb0, allVecs(id)))
          val expect = cb0.map { case (cell, cvec) =>
            val members = assign.filter(_._2 == cell).map(a => allVecs(a._1))
            if (members.isEmpty) (cell, cvec)
            else {
              val dim = cvec.length
              val c = cvec.clone()
              (0 until dim).foreach { p =>
                val s = members.map(v => math.round(1e6 * v(p))).sum
                c(p) = (s / members.size).toDouble / 1e6
              }
              (cell, c)
            }
          }
          val got = MmrServeStream.readCodebook(spark, s"$root/versions/v3")
          assert(got.length == expect.length &&
            got.zip(expect).forall { case ((gc, gv), (ec, ev)) =>
              gc == ec && gv.sameElements(ev) },
            "retrained codebook must equal the exact integer-micro replay")

          // answers remain exact under the retrained geometry
          addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "qb")
          q.processAllAvailable()
          val bHits = served().filter(t => t._1 >= 4 && t._1 < 8)
            .map(t => (t._1, t._2, t._3, t._4)).toSet
          assert(bHits == replay(4L until 8L, allIds.toSet, allVecs),
            "post-retrain pointer serve must still answer the exact replay")
        } finally q.stop()
      } finally h.stop()
    } finally {
      Seq(java.nio.file.Paths.get(root), in, scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("delta cycles reindex only fresh admissions; tiers merge instead of resealing the corpus") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-midx-delta")
      .toFile.getAbsolutePath
    val manifest = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "admitted"))
    val in = java.nio.file.Files.createTempDirectory("graft-midx-dq")
    val scratch = java.nio.file.Files.createTempDirectory("graft-midx-dscr")
    try {
      val vecs = vecsMap()
      val cb0: Array[(Int, Array[Double])] =
        (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      val h = ManagedIndex.start(spark, manifest.toString,
        s"$root/versions", s"$root/POINTER", cb0,
        pollMs = 300L, breachPct = 100000L, maxSegments = 3)
      try {
        def ownRows(v: Int): Long =
          spark.read.parquet(s"$root/versions/v$v").count()
        def segsOf(v: Int): Seq[String] =
          MmrServeStream.versionDirs(s"$root/versions/v$v")

        // v1: first cycle → FULL seal
        dropWave(manifest, scratch, "wa",
          (100L until 250L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(1))
        assert(ownRows(1) == 150 && segsOf(1) == Seq(s"$root/versions/v1"))

        // v2, v3: DELTA cycles — each version's own data is exactly
        // the fresh admissions, membership accumulates
        dropWave(manifest, scratch, "wb",
          (250L until 300L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(2))
        assert(ownRows(2) == 50,
          s"delta v2 must hold only the fresh 50 rows, got ${ownRows(2)}")
        assert(segsOf(2) == Seq(s"$root/versions/v1", s"$root/versions/v2"))
        dropWave(manifest, scratch, "wc",
          (300L until 325L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(3))
        assert(ownRows(3) == 25 && segsOf(3).size == 3)

        // merge-on-read correctness: a pointer serve over the
        // segmented v3 answers the exact replay over EVERYTHING
        def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
          val tmp = scratch.resolve(name)
          spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
            .coalesce(1).write.parquet(tmp.toString)
          val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
          ()
        }
        val stream = graft.Tables.loadStream(
          spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
        val q = MmrServeStream.serveIndexedPointer(stream, s"$root/POINTER",
          s"$root/ckpt", root, nprobe = 16)
        try {
          addQueries(col("vec_id") < 4, "qa")
          q.processAllAvailable()
          val got = spark.read.json(s"$root/serve/batch=*")
            .select($"data.qid".as("qid"), $"data.step".cast("int").as("step"),
              $"data.vec_id".as("vec_id"), $"data.mmr_score".as("mmr_score"))
            .as[(Long, Int, Long, Long)].collect()
            .map(t => (t._1, t._2, t._3, t._4)).toSet
          assert(got == replay(0L until 4L, (100L until 325L).toSet, vecs),
            "merge-on-read over three segments must answer the exact replay")
        } finally q.stop()

        // wd: TIERED compaction (round 18) — the new 25-row delta (v4)
        // matches its predecessor's size, so the binary-counter policy
        // folds v4+v3 → v5 (50 rows), whose size now matches v2's →
        // v5+v2 fold into v6 (100 rows). The BASE (v1, 150 rows) is
        // NEVER re-read or rewritten — the reseal is tier-sized, not
        // corpus-sized (the r17 soak's named growth term)
        val v1Mtime = new java.io.File(s"$root/versions/v1").lastModified
        dropWave(manifest, scratch, "wd",
          (325L until 350L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(6), "wd must roll delta v4 + merges v5, v6")
        assert(ownRows(6) == 100,
          s"the folded tier must hold the 100 post-base rows, got ${ownRows(6)}")
        assert(segsOf(6) == Seq(s"$root/versions/v1", s"$root/versions/v6"),
          s"membership must be base + one folded tier, got ${segsOf(6)}")
        assert(new java.io.File(s"$root/versions/v1").lastModified == v1Mtime,
          "the tiered fold must never rewrite the base segment")
        assert(MmrServeStream.readVersionRaw(spark, s"$root/versions/v6")
          .count() == 250, "merge-on-read over base + tier spans everything")
        assert(h.retrains == 0, "no breach anywhere in this protocol")
      } finally h.stop()
    } finally {
      Seq(java.nio.file.Paths.get(root), in, scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("a tiered fold collapses cross-segment versions newest-wins by ver") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-midx-lww")
      .toFile.getAbsolutePath
    val manifest = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "admitted"))
    val scratch = java.nio.file.Files.createTempDirectory("graft-midx-lscr")
    // LWW-manifest wave: admitted-shaped rows WITH the `ver` column the
    // live chain's update-aware budget stamps
    def dropWaveV(name: String,
        rows: Seq[(Long, Array[Double], Long)]): Unit = {
      val tmp = scratch.resolve(name)
      rows.map { case (id, v, ver) => (id, "en", 10L, 0L, 0L, v.toSeq, ver) }
        .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens",
          "embedding", "ver")
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, manifest.resolve(s"$name.parquet"))
      ()
    }
    try {
      val vecs = vecsMap()
      val cb0: Array[(Int, Array[Double])] =
        (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      val h = ManagedIndex.start(spark, manifest.toString,
        s"$root/versions", s"$root/POINTER", cb0,
        pollMs = 300L, breachPct = 100000L, maxSegments = 8)
      try {
        // v1: base (full seal, 50 rows)
        dropWaveV("wa", (100L until 150L).map(id => (id, vecs(id), 1L)))
        assert(h.awaitVersions(1))
        // v2: 20 NEW docs at ver 1, each carrying vec(id)
        dropWaveV("wb", (150L until 170L).map(id => (id, vecs(id), 1L)))
        assert(h.awaitVersions(2))
        // v3: the SAME 20 docs UPDATED to ver 2 with different vectors —
        // equal tier sizes fold v3+v2 → v4, which must collapse each doc
        // to its ver-2 row (newest-wins travels through the merge)
        dropWaveV("wc", (150L until 170L).map(id => (id, vecs(id + 300L), 2L)))
        assert(h.awaitVersions(4), "the equal-size tiers must fold into v4")
        val folded = spark.read.parquet(s"$root/versions/v4")
          .select($"doc_id", $"embedding", $"ver")
          .as[(Long, Array[Double], Long)].collect()
        assert(folded.length == 20,
          s"the fold must collapse 40 rows to 20 docs, got ${folded.length}")
        assert(folded.forall { case (id, e, ver) =>
          ver == 2L && java.util.Arrays.equals(e, vecs(id + 300L)) },
          "every folded doc must carry its ver-2 vector")
        assert(MmrServeStream.versionDirs(s"$root/versions/v4") ==
          Seq(s"$root/versions/v1", s"$root/versions/v4"))
      } finally h.stop()
    } finally {
      Seq(java.nio.file.Paths.get(root), scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("version retention GC deletes superseded dirs, keeps the referenced base") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-midx-gc")
      .toFile.getAbsolutePath
    val manifest = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "admitted"))
    val in = java.nio.file.Files.createTempDirectory("graft-midx-gcq")
    val scratch = java.nio.file.Files.createTempDirectory("graft-midx-gcs")
    try {
      val vecs = vecsMap()
      val cb0: Array[(Int, Array[Double])] =
        (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      val h = ManagedIndex.start(spark, manifest.toString,
        s"$root/versions", s"$root/POINTER", cb0,
        pollMs = 300L, breachPct = 100000L, maxSegments = 8,
        keepVersions = Some(2))
      try {
        def exists(v: Int) = new java.io.File(s"$root/versions/v$v").isDirectory
        // v1 base (50), v2 delta (20), then a 20-delta that folds
        // v2+v3 → v4, then one more delta v5 — five dirs rolled, the
        // base referenced by every membership throughout
        dropWave(manifest, scratch, "wa", (100L until 150L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(1))
        dropWave(manifest, scratch, "wb", (150L until 170L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(2))
        dropWave(manifest, scratch, "wc", (170L until 190L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(4), "wc must roll delta v3 + fold v4")
        dropWave(manifest, scratch, "wd", (190L until 210L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(5))
        // kept window = {v4, v5}; their memberships reference v1 (the
        // tiered base) — it must SURVIVE GC although it is the oldest
        // dir; the superseded delta/fold inputs v2, v3 must be gone
        assert(exists(1), "the base is referenced by the kept memberships")
        assert(!exists(2) && !exists(3),
          "superseded, unreferenced versions must be deleted")
        assert(exists(4) && exists(5))
        assert(MmrServeStream.versionDirs(s"$root/versions/v5") ==
          Seq(s"$root/versions/v1", s"$root/versions/v4", s"$root/versions/v5"))

        // the pointed serve still answers the exact replay over
        // everything — GC removed no live data
        def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
          val tmp = scratch.resolve(name)
          spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
            .coalesce(1).write.parquet(tmp.toString)
          val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
          ()
        }
        val stream = graft.Tables.loadStream(
          spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
        val q = MmrServeStream.serveIndexedPointer(stream, s"$root/POINTER",
          s"$root/ckpt", root, nprobe = 16)
        try {
          addQueries(col("vec_id") < 4, "qa")
          q.processAllAvailable()
          val got = spark.read.json(s"$root/serve/batch=*")
            .select($"data.qid".as("qid"), $"data.step".cast("int").as("step"),
              $"data.vec_id".as("vec_id"), $"data.mmr_score".as("mmr_score"))
            .as[(Long, Int, Long, Long)].collect()
            .map(t => (t._1, t._2, t._3, t._4)).toSet
          assert(got == replay(0L until 4L, (100L until 210L).toSet, vecs),
            "post-GC pointer serve must answer the exact replay")
        } finally q.stop()
      } finally h.stop()
    } finally {
      Seq(java.nio.file.Paths.get(root), in, scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("GC retention is cycle-counted: a fold cascade never deletes the previously-pointed version") {
    // the round-18 advice scenario: one cycle's tier-fold cascade bumps
    // SEVERAL version numbers (delta v4 + folds v5, v6), so a
    // number-counted keep=2 window would delete v3 — the version the
    // PREVIOUS cycle pointed to — in the very cycle that superseded it,
    // and a serve batch that read the pointer just before the flip
    // would scan deleted files mid-batch. Cycle-counted retention keeps
    // every version pointed within the last `keep` cycles readable.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-midx-cyc")
      .toFile.getAbsolutePath
    val manifest = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "admitted"))
    val scratch = java.nio.file.Files.createTempDirectory("graft-midx-cscr")
    try {
      val vecs = vecsMap()
      val cb0: Array[(Int, Array[Double])] =
        (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      val h = ManagedIndex.start(spark, manifest.toString,
        s"$root/versions", s"$root/POINTER", cb0,
        pollMs = 300L, breachPct = 100000L, maxSegments = 3,
        keepVersions = Some(2))
      try {
        def exists(v: Int) = new java.io.File(s"$root/versions/v$v").isDirectory
        // cycles 1-3: full seal v1 (150), delta v2 (50), delta v3 (25)
        dropWave(manifest, scratch, "wa", (100L until 250L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(1))
        dropWave(manifest, scratch, "wb", (250L until 300L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(2))
        dropWave(manifest, scratch, "wc", (300L until 325L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(3))
        // cycle 4 is the CASCADE: delta v4 (25) folds with v3 into v5
        // (50), which folds with v2 into v6 (100) — three bumps, one
        // cycle. The previously-pointed v3 MUST survive this cycle's
        // GC, fully readable (membership closure intact).
        dropWave(manifest, scratch, "wd", (325L until 350L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(6), "wd must roll delta v4 + folds v5, v6")
        assert(exists(3),
          "the previously-pointed version must survive its superseding cycle")
        assert(MmrServeStream.readVersionRaw(spark, s"$root/versions/v3")
          .count() == 225,
          "the previously-pointed version must stay fully readable")
        // membership CLOSURE after GC: every surviving version's
        // segment dirs all exist — GC can never leave a version that
        // reads partial
        (1 to 6).filter(exists).foreach { v =>
          MmrServeStream.versionDirs(s"$root/versions/v$v").foreach { d =>
            assert(new java.io.File(d.stripPrefix("file:")).isDirectory,
              s"kept v$v references deleted segment $d")
          }
        }
        // one more quiet cycle (delta v7): now v3 is TWO cycles stale —
        // beyond the keep=2 horizon — and the superseded chain v2..v5
        // is reclaimed; the referenced base v1 survives regardless of age
        dropWave(manifest, scratch, "we", (350L until 360L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(7))
        assert(exists(1), "the referenced base survives GC at any age")
        assert(!exists(2) && !exists(3) && !exists(4) && !exists(5),
          "versions beyond the cycle horizon and unreferenced are reclaimed")
        assert(exists(6) && exists(7))
        assert(MmrServeStream.readVersionRaw(spark, s"$root/versions/v7")
          .count() == 260, "the pointed version spans everything after GC")
      } finally h.stop()
    } finally {
      Seq(java.nio.file.Paths.get(root), scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("the stale-ratio fold bounds cross-segment staleness on an update-heavy corpus") {
    // the round-18 advice scenario: LWW updates land in SMALL deltas
    // that never grow to the base's size, so pure tiering would never
    // re-merge the base and the union-at-read serve would answer with
    // the superseded docs' stale base rows forever. Crossing the
    // staleFoldPct budget must trigger a base-including newest-wins
    // fold.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-midx-stale")
      .toFile.getAbsolutePath
    val manifest = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "admitted"))
    val scratch = java.nio.file.Files.createTempDirectory("graft-midx-sscr")
    def dropWaveV(name: String, rows: Seq[(Long, Array[Double], Long)]): Unit = {
      val tmp = scratch.resolve(name)
      rows.map { case (id, v, ver) => (id, "en", 10L, 0L, 0L, v.toSeq, ver) }
        .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens",
          "embedding", "ver")
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, manifest.resolve(s"$name.parquet"))
      ()
    }
    try {
      val vecs = vecsMap()
      val cb0: Array[(Int, Array[Double])] =
        (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      val h = ManagedIndex.start(spark, manifest.toString,
        s"$root/versions", s"$root/POINTER", cb0,
        pollMs = 300L, breachPct = 100000L, maxSegments = 8,
        staleFoldPct = 30L)
      try {
        // v1: base — 50 docs at ver 1
        dropWaveV("wa", (100L until 150L).map(id => (id, vecs(id), 1L)))
        assert(h.awaitVersions(1))
        // one UPDATE wave: 25 of the 50 docs re-admitted at ver 2 with
        // different vectors. The 25-row delta (v2) is smaller than the
        // 50-row base, so the tier policy alone would never fold it in
        // — but the union is now 75 rows over 50 docs: 33% superseded,
        // over the 30% budget → base-including fold v3 fires in the
        // same cycle.
        dropWaveV("wb", (100L until 125L).map(id => (id, vecs(id + 300L), 2L)))
        assert(h.awaitVersions(3), "the stale breach must fold delta v2 + base into v3")
        assert(MmrServeStream.versionDirs(s"$root/versions/v3") ==
          Seq(s"$root/versions/v3"),
          "the stale fold must seal to a SINGLE segment (base included)")
        val folded = spark.read.parquet(s"$root/versions/v3")
          .select($"doc_id", $"embedding", $"ver")
          .as[(Long, Array[Double], Option[Long])].collect()
        assert(folded.length == 50,
          s"75 union rows must collapse to 50 docs, got ${folded.length}")
        // the base seal is newest-as-of-publish and carries no ver
        // (reindexFullFrom drops it), so un-updated docs fold with a
        // null ver; updated docs carry the delta's ver 2
        assert(folded.forall { case (id, e, ver) =>
          if (id < 125L) ver.contains(2L) && java.util.Arrays.equals(e, vecs(id + 300L))
          else ver.isEmpty && java.util.Arrays.equals(e, vecs(id)) },
          "every updated doc must serve ONLY its newest embedding after the fold")
      } finally h.stop()
    } finally {
      Seq(java.nio.file.Paths.get(root), scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("an orphaned uncommitted part file is never indexed (commit-log enumeration)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-midx-orph")
      .toFile.getAbsolutePath
    val staging = java.nio.file.Files.createTempDirectory("graft-midx-ostage")
    val scratch = java.nio.file.Files.createTempDirectory("graft-midx-oscr")
    try {
      val vecs = vecsMap()
      val cb0: Array[(Int, Array[Double])] =
        (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      // SINK-WRITTEN manifest: admitted-shaped rows stream from a
      // staging dir through a file sink, so the manifest carries a
      // `_spark_metadata` commit log — the layout the live chain's
      // budget stage writes and readAdmittedIds reads log-driven
      def admitWave(name: String, rows: Seq[(Long, Array[Double])]): Unit = {
        val tmp = scratch.resolve(name)
        rows.map { case (id, v) => (id, "en", 10L, 0L, 0L, v.toSeq) }
          .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens", "embedding")
          .coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath, staging.resolve(s"$name.parquet"))
        val q = spark.readStream
          .schema("doc_id LONG, lang STRING, n_tokens LONG, rank_key LONG, " +
            "cum_tokens LONG, embedding ARRAY<DOUBLE>")
          .parquet(staging.toString)
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt-admit")
          .format("parquet").option("path", s"$root/admitted")
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      admitWave("wa", (100L until 200L).map(id => (id, vecs(id))))
      val h = ManagedIndex.start(spark, s"$root/admitted",
        s"$root/versions", s"$root/POINTER", cb0,
        pollMs = 300L, breachPct = 100000L, maxSegments = 8)
      try {
        assert(h.awaitVersions(1))
        assert(spark.read.parquet(s"$root/versions/v1").count() == 100)

        // plant an ORPHAN beside the committed writes — a crashed
        // epoch's uncommitted part file: on disk, absent from the
        // commit log, invisible to readAdmittedIds
        val orphanIds = (9000L until 9050L).toSeq
        val tmp = scratch.resolve("orphan")
        orphanIds.map(id => (id, "en", 10L, 0L, 0L, vecs(130L).toSeq))
          .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens", "embedding")
          .coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath,
          java.nio.file.Paths.get(s"$root/admitted", "part-orphan-0000.parquet"))

        // the orphan alone moves nothing: the signature is the commit
        // log, so no cycle fires for a file the sink never committed
        Thread.sleep(1200)
        assert(h.versions == 1,
          "an uncommitted part file must not trigger an index cycle")

        // a real committed wave fires the next (delta) cycle — the
        // fresh set must be the committed files ONLY
        admitWave("wb", (200L until 240L).map(id => (id, vecs(id))))
        assert(h.awaitVersions(2))
        assert(spark.read.parquet(s"$root/versions/v2").count() == 40,
          "the delta cycle must index only the committed wave")
        val indexed = MmrServeStream
          .readVersionRaw(spark, s"$root/versions/v2")
          .select($"doc_id").as[Long].collect().toSet
        assert(indexed == (100L until 240L).toSet,
          "the merged version must hold exactly the committed rows — " +
            s"orphans present: ${indexed.intersect(orphanIds.toSet)}")
      } finally h.stop()
    } finally {
      Seq(java.nio.file.Paths.get(root), staging, scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("a throwing cycle is retried on the next poll, not fatal to the monitor") {
    val root = java.nio.file.Files.createTempDirectory("graft-midx-retry")
      .toFile.getAbsolutePath
    val manifest = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "admitted"))
    val scratch = java.nio.file.Files.createTempDirectory("graft-midx-rscr")
    try {
      val vecs = vecsMap()
      val cb0: Array[(Int, Array[Double])] =
        (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      val consulted = new java.util.concurrent.atomic.AtomicInteger(0)
      val h = ManagedIndex.start(spark, manifest.toString,
        s"$root/versions", s"$root/POINTER", cb0,
        pollMs = 300L, breachPct = 100L,
        retrainGate = (_, _) => {
          // first cycle dies mid-step (a transient fault); the retry
          // must find the manifest change still pending
          if (consulted.incrementAndGet() == 1) sys.error("transient")
          true
        })
      try {
        dropWave(manifest, scratch, "w",
          (1000L until 1100L).map(id => (id, vecs(130L))))
        assert(h.awaitVersions(2, timeoutMs = 60000),
          "the failed cycle must be retried and complete (v1 + retrained v2)")
        assert(h.retrains == 1 && consulted.get() == 2,
          s"gate consulted ${consulted.get()} times, retrains ${h.retrains}")
      } finally h.stop()
    } finally {
      Seq(java.nio.file.Paths.get(root), scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("the recall guard: full probe accepts; an unreachable bar rejects") {
    val vecs = vecsMap()
    val cb0: Array[(Int, Array[Double])] =
      (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
    val qfix: Array[(Long, Array[Double])] =
      (0L until 5L).map(id => (id, vecs(id))).toArray
    def runWith(minRecallMicro: Long): (Int, Int) = {
      val root = java.nio.file.Files.createTempDirectory("graft-midx-recall")
        .toFile.getAbsolutePath
      val manifest = java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(root, "admitted"))
      val scratch = java.nio.file.Files.createTempDirectory("graft-midx-rcs")
      try {
        val h = ManagedIndex.start(spark, manifest.toString,
          s"$root/versions", s"$root/POINTER", cb0,
          pollMs = 300L, breachPct = 100L,
          retrainGate = ManagedIndex.recallGate(spark, qfix,
            s"$root/versions", k = 5, nprobe = 16,
            minRecallMicro = minRecallMicro))
        try {
          dropWave(manifest, scratch, "w",
            (1000L until 1100L).map(id => (id, vecs(130L))))
          // one cycle either way; the accept path rolls a second
          // version inside the same cycle
          assert(h.awaitVersions(1, timeoutMs = 60000))
          Thread.sleep(1500)
          (h.versions, h.retrains)
        } finally h.stop()
      } finally {
        Seq(java.nio.file.Paths.get(root), scratch).foreach(d =>
          new scala.reflect.io.Directory(d.toFile).deleteRecursively())
      }
    }
    // at nprobe = C the IVF answer IS the exact answer — recall 100%
    // under ANY geometry, so a sane bar must ACCEPT the retrain
    val (vAcc, rAcc) = runWith(900000L)
    assert(vAcc == 2 && rAcc == 1,
      s"full-probe recall must accept the retrain (versions=$vAcc retrains=$rAcc)")
    // an unreachable bar (> 100%) must REJECT it — breach alone never
    // swaps geometry past the guard
    val (vRej, rRej) = runWith(1000001L)
    assert(vRej == 1 && rRej == 0,
      s"an unreachable recall bar must reject (versions=$vRej retrains=$rRej)")
  }

  test("a rejecting retrain gate keeps the codebook; versions still roll") {
    val root = java.nio.file.Files.createTempDirectory("graft-midx-gate")
      .toFile.getAbsolutePath
    val manifest = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "admitted"))
    val scratch = java.nio.file.Files.createTempDirectory("graft-midx-gscr")
    try {
      val vecs = vecsMap()
      val cb0: Array[(Int, Array[Double])] =
        (100L until 116L).map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      var consulted = 0
      val h = ManagedIndex.start(spark, manifest.toString,
        s"$root/versions", s"$root/POINTER", cb0,
        pollMs = 300L, breachPct = 100L,
        retrainGate = (_, _) => { consulted += 1; false })
      try {
        // everything lands in ONE cell — immediate breach
        dropWave(manifest, scratch, "w",
          (1000L until 1100L).map(id => (id, vecs(130L))))
        assert(h.awaitVersions(1), "the wave must roll v1")
        Thread.sleep(800)  // no second cycle without a manifest change
        assert(h.versions == 1, "a rejected retrain must not roll v2")
        assert(consulted == 1 && h.retrains == 0,
          "the gate must be consulted exactly once and reject")
        assert(MmrServeStream.readCodebook(spark, s"$root/versions/v1")
          .zip(cb0).forall { case ((gc, gv), (ec, ev)) =>
            gc == ec && gv.sameElements(ev) },
          "a rejected retrain must keep the current codebook")
      } finally h.stop()
    } finally {
      Seq(java.nio.file.Paths.get(root), scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }
}
