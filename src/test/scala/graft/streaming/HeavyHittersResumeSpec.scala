package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Restart-survival for the space-saving monitor: kill the query
  * between micro-batches, restart from the checkpoint — the per-type
  * counter sketch must come back from the store (batch 1 is NOT
  * reprocessed), and the final hot-key report must equal the exact
  * batch support rule (below capacity the sketch is the exact
  * counter map, so restored state + batch-2 increments can only match
  * if nothing was lost or replayed). */
class HeavyHittersResumeSpec extends SparkSuite {

  test("sketch state survives a restart: counters accumulate to the batch rule") {
    import spark.implicits._
    val phiInv = 32L
    val ev = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("event_type", "user_id", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (et, rows) =>
      val total = rows.length.toLong
      rows.groupBy(_._2).map { case (u, g) => (et, u, g.length.toLong, total) }
        .filter { case (_, _, n, t) => n * phiInv >= t }
    }.toSet

    val root = java.nio.file.Files.createTempDirectory("graft-hhresume")
    val in = root.resolve("in"); java.nio.file.Files.createDirectory(in)
    val ckpt = root.resolve("ckpt").toString
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = root.resolve(s"scratch-$name")
      spark.read.parquet(s"$sf0001/events.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    HeavyHittersResumeSpec.sink.clear()
    def start() = {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "events", s"$sf0001/events.parquet")
      HeavyHittersStream.hitters(stream, capacity = 4096, phiInv = phiInv)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[HhReport], _: Long) =>
          b.collect().foreach(r => HeavyHittersResumeSpec.sink.add(r)); ()
        }
        .start()
    }
    try {
      val mid = ev.length / 2
      addFile(col("event_id") < mid, "b1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()   // the "kill"
      val afterB1 = HeavyHittersResumeSpec.sink.size()
      assert(afterB1 > 0, "first run emitted nothing")

      addFile(col("event_id") >= mid, "b2")
      val q2 = start()                                  // fresh query, same checkpoint
      try q2.processAllAvailable() finally q2.stop()

      val all = new java.util.ArrayList(HeavyHittersResumeSpec.sink)
        .toArray(Array.empty[HhReport])
      // version continuity proves state restoration (a reset sketch
      // would restart at version 1 and undercount totals)
      val lastV = all.groupBy(_.event_type).view.mapValues(_.map(_.version).max).toMap
      assert(lastV.values.exists(_ >= 2L), "no type saw both batches")
      val got = all.filter(r => r.version == lastV(r.event_type))
        .map { r => assert(r.err == 0L); (r.event_type, r.user_id, r.n, r.n_type) }
        .toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }
}

object HeavyHittersResumeSpec {
  val sink = new java.util.concurrent.ConcurrentLinkedQueue[HhReport]()
}
