package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Restart-survival for streaming attribution: the per-user last-touch
  * state must come back from the CHECKPOINT after a kill between
  * micro-batches — a purchase in the second run credited to a touch
  * seen only by the FIRST run proves the state carried, and the union
  * of both runs' file-sink output equals the batch rule exactly. */
class AttributionResumeSpec extends SparkSuite {

  test("last-touch state survives a restart: credits carry, output exact") {
    import spark.implicits._
    val sevenDaysUs = AttributionStream.SevenDaysUs
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

    val root = java.nio.file.Files.createTempDirectory("graft-attrresume")
    val in = root.resolve("in"); java.nio.file.Files.createDirectory(in)
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = root.resolve(s"scratch-$name")
      spark.read.parquet(s"$sf0001/events.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    def start() = {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "events", s"$sf0001/events.parquet")
      AttributionStream.attribute(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    try {
      addFile(expr(s"unix_micros(cast(ts as timestamp)) < ${cutoffUs}L"), "b1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()   // the "kill"

      addFile(expr(s"unix_micros(cast(ts as timestamp)) >= ${cutoffUs}L"), "b2")
      val q2 = start()                                  // fresh query, same checkpoint
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(out).collect()
        .map(r => (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("event_id")),
          r.getString(r.fieldIndex("channel")), r.getLong(r.fieldIndex("value_cents"))))
        .toSet
      assert(got == expected,
        s"restart diverged: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      // the restart genuinely exercised carried state: some second-half
      // purchase is credited to a touch only the FIRST run saw
      val crossRun = expected.exists { case (u, eid, ch, _) =>
        ch != "direct" && {
          val p = ev.find(e => e._1 == u && e._3 == eid).get
          p._2 >= cutoffUs && {
            val touches = ev.filter(e => e._1 == u &&
              (e._4 == "view" || e._4 == "click") &&
              (e._2 < p._2 || (e._2 == p._2 && e._3 < p._3)))
            touches.nonEmpty && touches.maxBy(e => (e._2, e._3))._2 < cutoffUs
          }
        }
      }
      assert(crossRun, "no purchase depended on pre-restart touch state")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }
}
