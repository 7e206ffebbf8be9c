package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream join coverage (the one join shape that is genuinely
  * streaming-only): watermarked event-time range join — clicks
  * attributed to the impression they followed within 10 seconds. Both
  * sides buffer in the state store bounded by their watermarks; the
  * range condition lets Spark evict state as event time advances — the
  * shape that holds up when both sides are unbounded at cluster scale. */
class StreamStreamJoinSpec extends SparkSuite {

  private def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)

  test("watermarked event-time range join attributes clicks to impressions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark
    import s.implicits._

    val impressions = MemoryStream[(java.sql.Timestamp, Long, String)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]

    val imp = impressions.toDF().toDF("imp_ts", "ad_id", "campaign")
      .withWatermark("imp_ts", "5 seconds")
    val clk = clicks.toDF().toDF("clk_ts", "ad_id2")
      .withWatermark("clk_ts", "5 seconds")

    val joined = imp.join(clk,
      expr("""ad_id = ad_id2 AND
              clk_ts >= imp_ts AND
              clk_ts <= imp_ts + interval 10 seconds"""))
      .select($"ad_id", $"campaign",
        unix_micros($"imp_ts").as("imp_us"), unix_micros($"clk_ts").as("clk_us"))

    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      impressions.addData((ts(0), 1L, "spring"), (ts(0), 2L, "summer"))
      clicks.addData((ts(3), 1L))              // within window → attributed
      q.processAllAvailable()
      clicks.addData((ts(20), 2L))             // 20s after impression → outside window
      impressions.addData((ts(30), 3L, "fall"))
      clicks.addData((ts(31), 3L))             // within window → attributed
      q.processAllAvailable()

      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(rows == Seq((1L, "spring"), (3L, "fall")), s"got $rows")
    } finally q.stop()
  }
}
