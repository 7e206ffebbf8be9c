package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Restart-survival for the maintained RFM profiles: kill the query
  * between micro-batches, restart from the checkpoint — the per-user
  * (last, count, sum) state must come back from the store (batch 1 is
  * NOT reprocessed), and profiles for users straddling the split must
  * accumulate across the restart to the batch ground truth. */
class RfmResumeSpec extends SparkSuite {

  test("RFM state survives a restart: no replay, straddling users accumulate") {
    import spark.implicits._
    val events = graft.Tables.load(spark, sf0001, "events")
    val expected = events.groupBy($"user_id")
      .agg(max(unix_micros($"ts")).as("l"), count(lit(1)).as("f"),
        sum(round($"value" * 100).cast("long")).as("m"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val root = java.nio.file.Files.createTempDirectory("graft-rfmresume")
    val in = root.resolve("in"); java.nio.file.Files.createDirectory(in)
    val ckpt = root.resolve("ckpt").toString
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = root.resolve(s"scratch-$name")
      spark.read.parquet(s"$sf0001/events.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    // emissions accumulate in a JVM-wide buffer that survives query
    // restarts (the "downstream profile store")
    RfmResumeSpec.sink.clear()
    def start() = {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "events", s"$sf0001/events.parquet")
      RfmStream.profiles(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[RfmProfile], _: Long) =>
          b.collect().foreach(p => RfmResumeSpec.sink.add(p)); ()
        }
        .start()
    }
    try {
      val mid = events.count() / 2
      addFile(col("event_id") < mid, "b1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()   // the "kill"
      val afterB1 = RfmResumeSpec.sink.size()
      assert(afterB1 > 0, "first run emitted nothing")

      addFile(col("event_id") >= mid, "b2")
      val q2 = start()                                  // fresh query, same checkpoint
      try q2.processAllAvailable() finally q2.stop()

      // no replay: the restarted query emitted only batch-2-touched
      // users (strictly fewer than a full reprocess would)
      val secondRun = RfmResumeSpec.sink.size() - afterB1
      assert(secondRun > 0 && secondRun <= expected.size,
        s"second run emitted $secondRun profiles")
      // the LATEST profile per user equals the batch ground truth —
      // only possible if batch-1 state was restored, not reset
      val latest = new java.util.ArrayList(RfmResumeSpec.sink).toArray(Array.empty[RfmProfile])
        .groupBy(_.user_id).map { case (u, ps) =>
          u -> { val b = ps.maxBy(p => (p.frequency, p.last_us))
            (b.last_us, b.frequency, b.monetary_cents) } }
      assert(latest.keySet == expected.keySet)
      latest.foreach { case (u, p) =>
        assert(p == expected(u), s"user $u: resumed $p != batch ${expected(u)}")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }
}

object RfmResumeSpec {
  val sink = new java.util.concurrent.ConcurrentLinkedQueue[RfmProfile]()
}
