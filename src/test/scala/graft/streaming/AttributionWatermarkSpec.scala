package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** At-watermark emission: the one disorder emit-at-arrival cannot
  * repair is a touch arriving AFTER a purchase it should credit —
  * buffering purchases until the watermark finalizes them makes the
  * assignment exact for every admissible arrival order, and makes the
  * multi-touch U-shaped split (which needs the COMPLETE window)
  * streamable at all. */
class AttributionWatermarkSpec extends SparkSuite {

  private case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                        event_type: String, value: Double)
  private def at(minute: Long) = new java.sql.Timestamp(minute * 60000L)

  test("a touch arriving after its purchase still gets the credit (at-watermark)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = AttributionStream.attribute(src.toDF(), delay = "1 hour",
        emitAtWatermark = true)
      .writeStream.format("memory").queryName("attr_wm")
      .outputMode("append").start()
    try {
      // purchase first; its crediting view arrives one batch LATER
      src.addData(Ev(1L, at(640), 2L, "purchase", 5.0))
      q.processAllAvailable()
      src.addData(Ev(1L, at(630), 3L, "view", 1.0))
      q.processAllAvailable()
      // nothing final yet: wm = 640' − 60' = 580' < 640'
      assert(spark.table("attr_wm").isEmpty, "emitted before the watermark finalized")
      // sentinel advances the watermark past the purchase
      src.addData(Ev(99L, at(710), 9L, "view", 1.0))
      q.processAllAvailable()
      src.addData(Ev(99L, at(711), 10L, "view", 1.0))   // trigger the timeout batch
      q.processAllAvailable()
      val got = spark.table("attr_wm").collect()
        .map(r => (r.getLong(1), r.getString(3))).toMap
      assert(got == Map(2L -> "view"),
        s"late view must credit the earlier-arrived purchase: $got")
    } finally q.stop()
  }

  test("watermark-boundary semantics: strict hold at p_us == wm; boundary rows ARE late-filtered") {
    // Round-11 empirical pin of the boundary tie the round-10 review
    // raised. Two facts, both load-bearing:
    //  1. a purchase at exactly the watermark is HELD (strict ripen
    //     p_us < wm), finalizing only once the watermark moves past it;
    //  2. on this Spark build, flatMapGroupsWithState under
    //     EventTimeTimeout DROPS input rows with event time <= the
    //     watermark — so a same-microsecond boundary touch never
    //     reaches the operator, the admitted log excludes it, and the
    //     finalized credit ('direct' here) IS the batch result over
    //     the admitted rows. The strict ripen is defense-in-depth for
    //     a build whose late filter uses `<` instead; this test breaks
    //     loudly if that predicate ever changes (the touch would then
    //     be credited and got would read 'click').
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = AttributionStream.attribute(src.toDF(), delay = "1 hour",
        emitAtWatermark = true)
      .writeStream.format("memory").queryName("attr_wm_tie")
      .outputMode("append").start()
    try {
      // purchase at minute 600 (id 5); sentinel at 660 puts the
      // watermark at EXACTLY 600 after this batch
      src.addData(Ev(1L, at(600), 5L, "purchase", 5.0),
        Ev(99L, at(660), 9L, "view", 1.0))
      q.processAllAvailable()
      // boundary touch (same microsecond, smaller event_id) while
      // wm == 600; the purchase must still be HELD either way
      // (strict ripen: 600 < 600 is false)
      src.addData(Ev(1L, at(600), 3L, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("attr_wm_tie").isEmpty,
        "purchase at p_us == wm finalized prematurely (inclusive ripen)")
      // the watermark moves past the purchase → it finalizes
      src.addData(Ev(99L, at(720), 11L, "view", 1.0))
      q.processAllAvailable()
      src.addData(Ev(99L, at(721), 12L, "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("attr_wm_tie").collect()
        .map(r => (r.getLong(1), r.getString(3))).toMap
      assert(got == Map(5L -> "direct"),
        s"expected the admitted-log credit (boundary touch late-filtered); " +
          s"a 'click' here means Spark's late predicate became strict " +
          s"and the defense-in-depth path is now live: $got")
    } finally q.stop()
  }

  private def drainAndAggregate(model: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.Dataset[PositionCredit], sinkName: String): Set[(String, Long, Long, Long)] = {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
    val maxUs = ev.map(_.getLong(1)).max
    val in = java.nio.file.Files.createTempDirectory(s"graft-$sinkName-in")
    val scratch = java.nio.file.Files.createTempDirectory(s"graft-$sinkName-scr")
    def addParquet(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = scratch.resolve(name)
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val fixture = spark.read.parquet(s"$sf0001/events.parquet")
      val cutoffUs = ev.map(_.getLong(1)).sorted.apply(ev.length / 2)
      val stream = graft.Tables.loadStream(
        spark, in.toString, "events", s"$sf0001/events.parquet")
      val q = model(stream)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        addParquet(fixture.filter(
          org.apache.spark.sql.functions.expr(
            s"unix_micros(cast(ts as timestamp)) < ${cutoffUs}L")), "b1")
        q.processAllAvailable()
        addParquet(fixture.filter(
          org.apache.spark.sql.functions.expr(
            s"unix_micros(cast(ts as timestamp)) >= ${cutoffUs}L")), "b2")
        q.processAllAvailable()
        // sentinel: a view-only user far past max ts + delay flushes
        // every real purchase through the watermark (adds no credits)
        val sentinelTs = new java.sql.Timestamp((maxUs + 8L * 86400L * 1000000L) / 1000L)
        def sentinel(eid: Long, ts: java.sql.Timestamp) =
          Seq((eid, ts, 999999L, "view", 1.0, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        addParquet(sentinel(999999L, sentinelTs), "b3")
        q.processAllAvailable()
        addParquet(sentinel(999998L,
          new java.sql.Timestamp(sentinelTs.getTime + 60000L)), "b4")
        q.processAllAvailable()
      } finally q.stop()
      spark.table(sinkName).collect()
        .map(r => (r.getString(3), r.getLong(4), r.getLong(5)))
        .groupBy(_._1).map { case (ch, rows) =>
          (ch, rows.length.toLong, rows.map(_._2).sum,
            rows.map(r => r._3 * r._2).sum)
        }.toSet
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }

  private def batchRows(q: graft.operators.Q): Set[(String, Long, Long, Long)] =
    q.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("streamed U-shaped credits aggregate to the batch multi-touch result") {
    val got = drainAndAggregate(
      df => AttributionStream.attributePosition(df, delay = "1 hour"), "attr_pos")
    val expected = batchRows(graft.operators.Quality.eventsAttributionPosition)
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("streamed time-decay credits aggregate to the batch time-decay result") {
    val got = drainAndAggregate(
      df => AttributionStream.attributeTimeDecay(df, delay = "1 hour"), "attr_td")
    val expected = batchRows(graft.operators.Quality.eventsAttributionTimeDecay)
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }
}
