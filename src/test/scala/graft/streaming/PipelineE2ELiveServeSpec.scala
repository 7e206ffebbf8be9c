package graft.streaming

import graft.SparkSuite
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE WHOLE CHAIN INCLUDING SERVE, live in ONE concurrent run —
  * sharded CDC ingest → apply → curation → budget → FFD layout AND the
  * retrieve→MMR serve, all up together ([[PipelineE2E.startLive]]
  * `serveVecDir`). Only the refreshed serve form makes this possible:
  * its per-micro-batch manifest re-read means a query asked after wave
  * w retrieves wave w's admissions, while a static-manifest serve
  * started with the chain would be pinned to the EMPTY pre-ingest
  * manifest forever (ServeFreshnessSpec's pin, here load-bearing).
  *
  * Pinned: queries asked between the waves serve EXACTLY the
  * wave-1 admitted corpus (driver replay of the exact kernel over that
  * snapshot), queries asked after wave 2 serve exactly the grown
  * corpus, and wave-1 answers are never re-served or changed by wave 2
  * (immutable serve epochs). */
class PipelineE2ELiveServeSpec extends SparkSuite {

  private val Budget = 2000L
  private val WaveSplit = 250L

  private def uniqueDocs: DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.Tables.load(spark, sf0001, "documents")
      .withColumn("rk", row_number().over(
        Window.partitionBy(TextFns.fingerprint(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
  }

  /** brute-force replay of the exact streamed kernel over one admitted
    * snapshot (nprobe = C in the chain ⇒ probes cover everything). */
  private def replay(qids: Seq[Long], admittedIds: Set[Long],
      vecs: Map[Long, Array[Double]]): Set[(Long, Int, Long, Long)] = {
    def nrm(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    qids.flatMap { qid =>
      val qv = vecs(qid); val qn = nrm(qv)
      val cands = admittedIds.toSeq.filter(_ != qid).sorted.map { id =>
        val v = vecs(id); val n = nrm(v)
        var s = 0.0; var i = 0
        while (i < v.length) { s += qv(i) * v(i); i += 1 }
        MmrCand(qid, id, s / (qn * n), v, n)
      }
      MmrServeStream.rerank(qid, cands.iterator, 20, 5)
    }.map(h => (h.qid, h.step, h.vec_id, h.mmr_score)).toSet
  }

  test("queries between waves serve the wave-1 corpus; after wave 2, the grown one") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-liveserve")
      .toFile.getAbsolutePath
    val scratch = java.nio.file.Files.createTempDirectory("graft-e2e-lsq")
    try {
      val docs = uniqueDocs.localCheckpoint()
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
        java.nio.file.Files.copy(part.toPath,
          java.nio.file.Paths.get(s"$root/queries/$name.parquet"))
        ()
      }
      def served() = spark.read.json(s"$root/serve/batch=*")
        .select($"data.qid".as("qid"), $"data.step".cast("int").as("step"),
          $"data.vec_id".as("vec_id"), $"data.mmr_score".as("mmr_score"))
        .as[(Long, Int, Long, Long)].collect()
      def admittedIds() = spark.read.schema(PipelineE2E.admitSchema)
        .parquet(s"$root/admitted").select($"doc_id").as[Long].collect().toSet

      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours",
        serveVecDir = Some(sf0001), serveNprobe = 16)
      try {
        // ---- wave 1 → drain → queries 0..3 serve the W1 corpus ----
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" < WaveSplit),
          root, PipelineE2E.defaultTopology, "w1",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val admitW1 = admittedIds()
        assert(admitW1.nonEmpty)
        addQueries(col("vec_id") < 4, "qa")
        chain.drain()
        val phase1 = served()
        assert(phase1.map(t => (t._1, t._2, t._3, t._4)).toSet ==
          replay(0L until 4L, admitW1, vecs),
          "between-wave queries must serve exactly the wave-1 admitted corpus")

        // ---- wave 2 → drain → queries 4..7 serve the GROWN corpus ----
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" >= WaveSplit),
          root, PipelineE2E.defaultTopology, "w2",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val admitW2 = admittedIds()
        assert(admitW2.size > admitW1.size, "wave 2 must admit more")
        addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "qb")
        chain.drain()
        val phase2 = served()
        val bHits = phase2.filter(t => t._1 >= 4 && t._1 < 8)
          .map(t => (t._1, t._2, t._3, t._4)).toSet
        assert(bHits == replay(4L until 8L, admitW2, vecs),
          "post-wave-2 queries must serve exactly the grown admitted corpus")
        // wave-1 answers immutable (epochs never rewritten)
        val aBefore = phase1.filter(_._1 < 4).sorted.toSeq
        val aAfter = phase2.filter(_._1 < 4).sorted.toSeq
        assert(aAfter == aBefore, "a wave-1 serve epoch changed after wave 2")
      } finally chain.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }
}
