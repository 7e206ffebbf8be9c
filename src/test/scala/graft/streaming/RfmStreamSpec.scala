package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the maintained RFM profiles: after draining the
  * event log across two micro-batches, the LATEST emitted profile per
  * user must equal the batch per-user aggregation bit-for-bit — the
  * cross-batch accumulation (a user's count/sum/max straddling the
  * batch split) is the thing under test. */
class RfmStreamSpec extends SparkSuite {

  test("maintained per-user profiles equal the batch RFM metrics after two batches") {
    import spark.implicits._
    val events = graft.Tables.load(spark, sf0001, "events")
    val expected = events
      .groupBy($"user_id")
      .agg(max(unix_micros($"ts")).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(round($"value" * 100).cast("long")).as("monetary_cents"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val in = java.nio.file.Files.createTempDirectory("graft-rfmstream")
    val scratch = java.nio.file.Files.createTempDirectory("graft-rfmscratch")
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = scratch.resolve(name)
      spark.read.parquet(s"$sf0001/events.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "events", s"$sf0001/events.parquet")
      val q = RfmStream.profiles(stream)
        .writeStream.format("memory").queryName("rfm_out")
        .outputMode("update").start()
      try {
        val mid = events.count() / 2
        addFile(col("event_id") < mid, "b1")
        q.processAllAvailable()
        addFile(col("event_id") >= mid, "b2")
        q.processAllAvailable()
      } finally q.stop()
      // LATEST emission per user = the maintained state (update mode
      // emits a row per touched user per batch; memory sink appends)
      val got = spark.table("rfm_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).map { case (u, rows) =>
          u -> { val b = rows.maxBy(t => (t._3, t._2)); (b._2, b._3, b._4) } }
      assert(got.keySet == expected.keySet, "every user must carry a profile")
      got.foreach { case (u, p) =>
        assert(p == expected(u), s"user $u: stream $p != batch ${expected(u)}")
      }
      // cross-batch accumulation genuinely exercised: some user has
      // emissions in both micro-batches
      val emissionsPerUser = spark.table("rfm_out").collect()
        .map(_.getLong(0)).groupBy(identity).map(_._2.length)
      assert(emissionsPerUser.exists(_ >= 2),
        "no user straddled the batch split — accumulation untested")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(in.toFile); rm(scratch.toFile)
    }
  }
}
