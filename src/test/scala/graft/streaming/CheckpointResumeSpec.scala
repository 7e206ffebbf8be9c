package graft.streaming

import graft.SparkSuite
import java.nio.file.{Files, Paths}

/** SURVEY.md §5.2 #3: resume-from-checkpoint replays nothing — the
  * quorum state survives a restart, so late copies of an
  * already-emitted op do NOT re-emit (the reference's in-memory counter
  * loses this and double-emits; `MongoDBOplogSource.java:59`). */
class CheckpointResumeSpec extends SparkSuite {

  private def line(h: Long, host: String, sec: Int): String =
    s"""{"ts":"2024-01-01T00:00:${f"$sec%02d"}.000Z","tsInc":$sec,"h":$h,"op":"i","ns":"t.c","o":"{}","o2":null,"sourceHost":"$host"}"""

  test("quorum state survives restart: no re-emission, new keys still fire") {
    val root = Files.createTempDirectory("graft-resume").toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()

    // phase 1: h=1 reaches quorum and is emitted; h=2 sits at 2/3
    Files.write(Paths.get(s"$src/b0.json"), Seq(
      line(1, "r1", 1), line(1, "r2", 1), line(1, "r3", 1),
      line(2, "r1", 2), line(2, "r2", 2)
    ).mkString("\n").getBytes("UTF-8"))
    val q1 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt", replicaDepth = 3)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.json(s"$root/index/oplog").count() == 1)

    // phase 2 (after restart): late duplicate of h=1 must NOT re-emit;
    // h=2's third copy completes its quorum from restored state
    Files.write(Paths.get(s"$src/b1.json"), Seq(
      line(1, "r3", 1),            // replayed/late copy of emitted op
      line(2, "r3", 2)             // third replica for the pending op
    ).mkString("\n").getBytes("UTF-8"))
    val q2 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt", replicaDepth = 3)
    try q2.processAllAvailable() finally q2.stop()

    import spark.implicits._
    val hs = spark.read.json(s"$root/index/oplog")
      .select($"data.h").as[Long].collect().sorted.toSeq
    assert(hs == Seq(1L, 2L), s"got $hs")
  }

  test("index sink is idempotent when the query dies between sink write and commit") {
    // foreachBatch is at-least-once: a crash AFTER the index write but
    // BEFORE the checkpoint commit replays the whole batch with the
    // same batchId on restart. The per-batch overwrite directory
    // (OplogPipeline.writeIndexBatch) must make that replay replace its
    // own output — one logical op, exactly one index line.
    import org.apache.spark.sql.Dataset
    import graft.model.OplogEntry
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val root = Files.createTempDirectory("graft-replay").toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()
    Files.write(Paths.get(s"$src/b0.json"), Seq(
      line(1, "r1", 1), line(1, "r2", 1), line(1, "r3", 1)
    ).mkString("\n").getBytes("UTF-8"))

    def start(failAfterWrite: Boolean) = {
      val deduped = QuorumDedup(
        OplogPipeline.staticFilter(OplogPipeline.source(spark, src))
          .withWatermark("ts", "10 seconds").as[OplogEntry], 3)
      deduped.writeStream.outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: Dataset[OplogEntry], id: Long) =>
          OplogPipeline.writeIndexBatch(b.toDF(), s"$root/index", id)
          if (failAfterWrite)
            throw new RuntimeException("injected crash between sink write and commit")
        }
        .start()
    }

    val q1 = start(failAfterWrite = true)
    val failure = intercept[Exception] { q1.processAllAvailable() }
    assert(failure.getMessage.contains("injected crash"), s"unexpected: $failure")
    q1.stop()
    // the sink write happened before the crash: the line is on disk but
    // the batch is NOT committed
    assert(spark.read.json(s"$root/index/oplog").count() == 1)

    val q2 = start(failAfterWrite = false)
    try q2.processAllAvailable() finally q2.stop()
    val lines = spark.read.json(s"$root/index/oplog")
      .select($"data.h").as[Long].collect().toSeq
    assert(lines == Seq(1L),
      s"replayed batch must overwrite, not append: got $lines")
  }
}
