package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the composed retrieve→MMR serving path: query
  * vectors arriving across two micro-batches, probed over ALL cells
  * (so the candidate set covers the exact top-20), must select exactly
  * the batch `vector_mmr_rerank` picks — same vectors, same steps,
  * same integer scores. A second case runs the production nprobe=2
  * path and checks shape (5 ranked steps per query, scores
  * non-increasing is NOT required by MMR — only step-1 dominance). */
class MmrServeStreamSpec extends SparkSuite {

  test("streamed MMR at full probe equals the batch re-rank across two batches") {
    import spark.implicits._
    val expected = graft.operators.VectorSearch.mmrRerank.run(spark, sf0001)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getInt(r.fieldIndex("step")),
        r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("mmr_score"))))
      .toSet

    val in = java.nio.file.Files.createTempDirectory("graft-mmrserve")
    val scratch = java.nio.file.Files.createTempDirectory("graft-mmrservescratch")
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = scratch.resolve(name)
      spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
      val q = MmrServeStream.serve(stream, sf0001, nprobe = 16)
        .writeStream.format("memory").queryName("mmr_serve_out")
        .outputMode("append").start()
      try {
        addFile(col("vec_id") < 4, "b1")
        q.processAllAvailable()
        addFile(col("vec_id") >= 4 && col("vec_id") < 8, "b2")
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("mmr_serve_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }

  test("production probe (nprobe=2) serves 5 diverse steps per query") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-mmrserve2")
    val scratch = java.nio.file.Files.createTempDirectory("graft-mmrserve2scr")
    try {
      val tmp = scratch.resolve("b1")
      spark.read.parquet(s"$sf0001/embeddings.parquet").filter(col("vec_id") < 8)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve("b1.parquet"))
      val stream = graft.Tables.loadStream(
        spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
      val q = MmrServeStream.serve(stream, sf0001)
        .writeStream.format("memory").queryName("mmr_serve_p2")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table("mmr_serve_p2").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val perQ = rows.groupBy(_._1)
      assert(perQ.size == 8, s"expected 8 served queries, got ${perQ.size}")
      perQ.foreach { case (qid, hs) =>
        assert(hs.map(_._2).sorted.toSeq == (1 to 5), s"qid=$qid steps=${hs.toSeq}")
        assert(hs.map(_._3).distinct.length == 5, s"qid=$qid re-selected a vector")
      }
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }
}
