package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for last-touch attribution: drained over two
  * time-split micro-batches, the emitted per-purchase channel
  * assignments must equal a driver replay of `events_attribution`'s
  * rule exactly — the state under test is a touch surviving the batch
  * boundary to claim a later purchase, and event-time-timeout eviction
  * firing without changing any assignment. */
class AttributionStreamSpec extends SparkSuite {

  test("streamed attributions equal the batch rule across two time-split batches") {
    import spark.implicits._
    val sevenDaysUs = AttributionStream.SevenDaysUs

    // driver replay of the batch rule (same as QualitySpec)
    val ev = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), math.round(r.getDouble(4) * 100)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      var lastTouch: Option[(Long, String)] = None
      ordered.flatMap { case (_, ts, eid, et, cents) =>
        val out =
          if (et == "purchase") {
            val ch = lastTouch match {
              case Some((tts, tt)) if ts - tts <= sevenDaysUs => tt
              case _ => "direct"
            }
            Seq((u, eid, ch, cents))
          } else Seq.empty
        if (et == "view" || et == "click") lastTouch = Some((ts, et))
        out
      }
    }.toSet

    val cutoffUs = ev.map(_._2).sorted.apply(ev.length / 2)
    val in = java.nio.file.Files.createTempDirectory("graft-attrstream")
    val scratch = java.nio.file.Files.createTempDirectory("graft-attrscratch")
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
      val q = AttributionStream.attribute(stream)
        .writeStream.format("memory").queryName("attr_out")
        .outputMode("append").start()
      try {
        addFile(expr(s"unix_micros(cast(ts as timestamp)) < ${cutoffUs}L"), "b1")
        q.processAllAvailable()
        addFile(expr(s"unix_micros(cast(ts as timestamp)) >= ${cutoffUs}L"), "b2")
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getLong(4))).toSet
      assert(got == expected,
        s"stream ${got.size} assignments != batch ${expected.size}")

      // the batch boundary is genuinely load-bearing: some purchase in
      // the second half is credited to a NON-direct touch whose ts is
      // in the first half — i.e. state carried the touch across
      val touchOf = ev.groupBy(_._1).map { case (u, rows) =>
        u -> rows.filter(r => r._4 == "view" || r._4 == "click")
          .sortBy(r => (r._2, r._3))
      }
      val crossBatch = expected.exists { case (u, eid, ch, _) =>
        ch != "direct" && {
          val p = ev.find(e => e._1 == u && e._3 == eid).get
          p._2 >= cutoffUs &&
            touchOf(u).takeWhile(t => t._2 < p._2 || (t._2 == p._2 && t._3 < p._3))
              .lastOption.exists(_._2 < cutoffUs)
        }
      }
      assert(crossBatch, "no purchase exercised cross-batch touch state")
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }
}
