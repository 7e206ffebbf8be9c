package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Restart-survival for the stateful budget gate: the per-(lang,
  * rank_key) cumsum state must come back from the CHECKPOINT, not from
  * reprocessing — after a kill between micro-batches, the restarted
  * query admits the second batch against the carried residual and the
  * union of both runs' output equals the batch selection exactly
  * (file sink, so replay is also exactly-once). The CheckpointResumeSpec
  * discipline applied to `TokenBudgetStream`. */
class TokenBudgetResumeSpec extends SparkSuite {

  test("budget admission state survives a restart: residual carries, output exact") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val base = graft.operators.Pipeline.budgetBase(spark, sf0001).localCheckpoint()
    val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, 2000L)
    val histB = hist.localCheckpoint()
    val cutsB = cuts.localCheckpoint()
    val expected = graft.operators.Catalog.all
      .find(_.name == "corpus_token_budget").get.run(spark, sf0001).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("cum_tokens"))))
      .toSet

    val root = java.nio.file.Files.createTempDirectory("graft-budgetresume")
    val in = root.resolve("in"); java.nio.file.Files.createDirectory(in)
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = root.resolve(s"scratch-$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    def start() = {
      val stream = spark.readStream.schema(docs.schema).parquet(in.toString)
      TokenBudgetStream.admit(stream, histB, cutsB)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    try {
      addFile(docs.filter($"doc_id" < 250), "b1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()   // the "kill"
      val afterB1 = spark.read.parquet(out).count()
      assert(afterB1 > 0, "first run admitted nothing")

      addFile(docs.filter($"doc_id" >= 250), "b2")
      val q2 = start()                                  // fresh query, same checkpoint
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(out).collect()
        .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("cum_tokens"))))
        .toSet
      assert(got == expected,
        s"restart diverged: missing=${expected -- got} extra=${got -- expected}")
      assert(spark.read.parquet(out).count() > afterB1,
        "second run admitted nothing — state did not carry")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }
}
