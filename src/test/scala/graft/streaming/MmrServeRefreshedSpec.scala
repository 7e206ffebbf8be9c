package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The bounce-free refreshed serve ([[MmrServeStream.serveRefreshed]])
  * and its batch twin. Pins: (1) `serveBatch` at full probe equals the
  * catalog `vector_mmr_rerank` operator — the same kernel folded with
  * plain flatMapGroups; (2) a manifest growing while the refreshed
  * query RUNS becomes servable in the very next micro-batch, with no
  * restart and no change to earlier epochs. */
class MmrServeRefreshedSpec extends SparkSuite {

  test("serveBatch at full probe equals the batch vector_mmr_rerank operator") {
    import spark.implicits._
    val expected = graft.operators.VectorSearch.mmrRerank.run(spark, sf0001)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getInt(r.fieldIndex("step")),
        r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("mmr_score"))))
      .toSet
    val queries = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter($"vec_id" < 8)
    val got = MmrServeStream.serveBatch(queries, sf0001, None, nprobe = 16)
      .collect().map(h => (h.qid, h.step, h.vec_id, h.mmr_score)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("a growing manifest serves in the NEXT micro-batch, no restart") {
    import spark.implicits._
    val admitted = java.nio.file.Files.createTempDirectory("graft-refresh-adm")
    val in = java.nio.file.Files.createTempDirectory("graft-refresh-q")
    val scratch = java.nio.file.Files.createTempDirectory("graft-refresh-scr")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-refresh-ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft-refresh-out")
    def admit(ids: Seq[Long], name: String): Unit = {
      val tmp = scratch.resolve(name)
      ids.toDF("doc_id").coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, admitted.resolve(s"$name.parquet"))
      ()
    }
    def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = scratch.resolve(name)
      spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
      ()
    }
    def served() = spark.read.json(s"$out/serve/batch=*")
      .select($"data.qid".as("qid"), $"data.vec_id".as("vec_id"))
      .as[(Long, Long)].collect()

    val setA = (100L until 120L)
    val setB = (200L until 300L)
    admit(setA, "a")
    val stream = graft.Tables.loadStream(
      spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
    val q = MmrServeStream.serveRefreshed(stream, sf0001,
      admitted.toString, ckpt.toString, out.toString, nprobe = 16)
    try {
      addQueries(col("vec_id") < 4, "q1")
      q.processAllAvailable()
      val phase1 = served()
      assert(phase1.nonEmpty && phase1.map(_._2).toSet.subsetOf(setA.toSet),
        "phase-1 hits must come from snapshot A")

      // B lands while the query RUNS: the per-batch manifest re-read
      // makes it servable in the very next micro-batch
      admit(setB, "b")
      addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "q2")
      q.processAllAvailable()
      val phase2 = served()
      val q2Hits = phase2.filter(p => p._1 >= 4 && p._1 < 8).map(_._2).toSet
      assert(q2Hits.intersect(setB.toSet).nonEmpty,
        "the next micro-batch must serve the new admissions without a restart")
      // earlier epochs untouched
      val q1Before = phase1.filter(_._1 < 4).sorted.toSeq
      val q1After = phase2.filter(_._1 < 4).sorted.toSeq
      assert(q1After == q1Before, "an earlier serve epoch changed")
    } finally {
      q.stop()
      Seq(admitted, in, scratch, ckpt, out).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }
}
