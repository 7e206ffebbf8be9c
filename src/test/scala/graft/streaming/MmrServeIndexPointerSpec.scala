package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** REINDEX + POINTER SWAP ([[MmrServeStream.reindexAdmitted]] /
  * `advancePointer` / `serveIndexedPointer`): the codebook-retrain
  * path for the admit-time-indexed manifest. Pinned:
  *
  *  1. a pointer-served manifest answers exactly the driver kernel
  *     replay over its rows (full probe);
  *  2. an OFFLINE reindex under a different codebook re-assigns every
  *     row's cell to the new geometry (driver-verified cell by cell,
  *     and the geometry genuinely moves rows between cells);
  *  3. after ONE atomic pointer flip the RUNNING serve answers under
  *     the new index with no restart — and at full probe the answers
  *     are IDENTICAL: a reindex moves candidates between cells, never
  *     in or out of the corpus (the invariant that makes codebook
  *     retraining safe to roll);
  *  4. pre-flip serve epochs are immutable. */
class MmrServeIndexPointerSpec extends SparkSuite {

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

  test("reindexAdmitted over a sink-written, wider (chain-shaped) manifest") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-idxsink")
      .toFile.getAbsolutePath
    try {
      val vecs = graft.Tables.load(spark, sf0001, "embeddings")
        .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
        .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
      val cb = (100L until 116L).map(vecs).zipWithIndex
        .map { case (v, i) => (i, v) }.toArray
      // the LIVE chain's manifest shape: admitSchemaE columns (incl.
      // its own cell/nrm) written by a streaming FILE SINK — the
      // reindex must project the carried fields through the commit
      // log and ignore the stale index columns
      val src = s"$root/src"
      (100L until 160L).map(id => (id, "en", 10L, 0L, 0L,
          VectorServeStream.cellOf(cb, vecs(id)),
          VectorServeStream.normOf(vecs(id)), vecs(id).toSeq, id))
        .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens",
          "cell", "nrm", "embedding", "ver")
        .coalesce(1).write.parquet(src)
      val q = spark.readStream
        .schema(PipelineE2E.admitSchemaE).parquet(src)
        .writeStream.format("parquet").option("path", s"$root/admitted")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()

      val cb2 = (120L until 136L).map(vecs).zipWithIndex
        .map { case (v, i) => (i, v) }.toArray
      val n = MmrServeStream.reindexAdmitted(spark, s"$root/admitted",
        cb2, s"$root/v1")
      assert(n == 60, s"reindex over the sink manifest carried $n of 60 rows")
      spark.read.parquet(s"$root/v1")
        .select($"doc_id", $"cell", $"embedding")
        .as[(Long, Int, Array[Double])].collect()
        .foreach { case (id, cell, emb) =>
          assert(cell == VectorServeStream.cellOf(cb2, emb),
            s"doc $id not re-assigned under the new codebook")
        }
      ()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      ()
    }
  }

  test("compaction: a multi-admitted doc collapses to its newest version") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-idxcompact")
      .toFile.getAbsolutePath
    try {
      val vecs = graft.Tables.load(spark, sf0001, "embeddings")
        .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
        .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
      val cb = (100L until 116L).map(vecs).zipWithIndex
        .map { case (v, i) => (i, v) }.toArray
      // the live manifest's segment-model state: doc 150 admitted
      // TWICE (an update re-admitted at a later LWW clock, new vector)
      val rows =
        (100L until 160L).map(id => (id, vecs(id), 1L)) :+
          ((150L, vecs(400L), 2L))
      rows.map { case (id, v, ver) => (id, "en", 10L, 0L, 0L, v.toSeq, ver) }
        .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens",
          "embedding", "ver")
        .write.parquet(s"$root/live")
      val n = MmrServeStream.reindexAdmitted(spark, s"$root/live", cb, s"$root/v1")
      assert(n == 60, s"compaction must seal one row per doc, got $n")
      val doc150 = spark.read.parquet(s"$root/v1")
        .filter($"doc_id" === 150L)
        .select($"embedding").as[Array[Double]].collect()
      assert(doc150.length == 1 && doc150.head.sameElements(vecs(400L)),
        "the sealed version must carry doc 150's NEWEST admitted vector")
      // sealed versions carry no ver (newest-as-of-publish)
      assert(!spark.read.parquet(s"$root/v1").schema.fieldNames.contains("ver"))
      ()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      ()
    }
  }

  test("reindex under a new codebook + pointer flip: same answers, no restart") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-idxptr")
      .toFile.getAbsolutePath
    val in = java.nio.file.Files.createTempDirectory("graft-idxptr-q")
    val scratch = java.nio.file.Files.createTempDirectory("graft-idxptr-scr")
    try {
      val vecs: Map[Long, Array[Double]] =
        graft.Tables.load(spark, sf0001, "embeddings")
          .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
          .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
      val corpusIds = (100L until 300L).toSet
      def codebook(ids: Seq[Long]): Array[(Int, Array[Double])] =
        ids.sorted.map(vecs).zipWithIndex.map { case (v, i) => (i, v) }.toArray
      val cbA = codebook((100L until 116L).toSeq)
      val cbB = codebook((200L until 216L).toSeq)

      // raw (un-indexed) manifest rows → v1 via the reindex op itself
      corpusIds.toSeq.sorted.map(id =>
          (id, "en", 10L, 0L, 0L, vecs(id).toSeq))
        .toDF("doc_id", "lang", "n_tokens", "rank_key", "cum_tokens", "embedding")
        .write.parquet(s"$root/raw")
      val n1 = MmrServeStream.reindexAdmitted(spark, s"$root/raw", cbA, s"$root/v1")
      assert(n1 == corpusIds.size, "reindex must carry every row")
      MmrServeStream.advancePointer(s"$root/POINTER", s"$root/v1")

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
        val phase1 = served()
        assert(phase1.map(t => (t._1, t._2, t._3, t._4)).toSet ==
          replay(0L until 4L, corpusIds, vecs),
          "pointer-served manifest must answer the exact kernel replay")

        // offline reindex under codebook B → new version dir
        val n2 = MmrServeStream.reindexAdmitted(spark, s"$root/v1", cbB, s"$root/v2")
        assert(n2 == corpusIds.size)
        val v1Cells = spark.read.parquet(s"$root/v1")
          .select($"doc_id", $"cell").as[(Long, Int)].collect().toMap
        val v2Cells = spark.read.parquet(s"$root/v2")
          .select($"doc_id", $"cell", $"embedding")
          .as[(Long, Int, Array[Double])].collect()
        v2Cells.foreach { case (id, cell, emb) =>
          assert(cell == VectorServeStream.cellOf(cbB, emb),
            s"doc $id cell not re-assigned to codebook B's geometry")
        }
        assert(v2Cells.exists { case (id, cell, _) => v1Cells(id) != cell },
          "the new geometry moved no row — reindex untested")

        // ONE atomic flip; the RUNNING serve picks it up next batch
        MmrServeStream.advancePointer(s"$root/POINTER", s"$root/v2")
        addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "qb")
        q.processAllAvailable()
        val phase2 = served()
        val bHits = phase2.filter(t => t._1 >= 4 && t._1 < 8)
          .map(t => (t._1, t._2, t._3, t._4)).toSet
        assert(bHits == replay(4L until 8L, corpusIds, vecs),
          "at full probe a reindex must never change answers — same " +
            "corpus, different geometry")
        // pre-flip epochs immutable
        val aBefore = phase1.filter(_._1 < 4).sorted.toSeq
        val aAfter = phase2.filter(_._1 < 4).sorted.toSeq
        assert(aAfter == aBefore, "a pre-flip serve epoch changed")
      } finally q.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }
}
