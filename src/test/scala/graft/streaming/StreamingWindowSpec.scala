package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming windows + watermarks (SURVEY.md §2.2 "streaming windows"
  * row): tumbling event-time aggregation that only finalizes when the
  * watermark passes, and streaming exact dedup within the watermark. */
class StreamingWindowSpec extends SparkSuite {

  private def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)

  test("tumbling window agg finalizes when the watermark passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "5 seconds")
      .groupBy(window($"ts", "10 seconds"))
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      input.addData((ts(1), 1.0), (ts(4), 2.0), (ts(11), 10.0))
      q.processAllAvailable()
      // watermark still at 11-5=6s: first window [0,10) not final yet
      assert(spark.table("win_out").count() == 0)
      input.addData((ts(20), 5.0))   // watermark → 15s: [0,10) finalizes
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select($"window.start".cast("long").as("s"), $"n", $"v").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(1) == 2 && rows.head.getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups late copies") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val dedup = input.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    try {
      input.addData((ts(1), 100L), (ts(2), 100L), (ts(3), 200L))
      q.processAllAvailable()
      input.addData((ts(4), 100L))   // duplicate within watermark
      q.processAllAvailable()
      val ids = spark.table("dd_out").select($"id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(100L, 200L))
    } finally q.stop()
  }
}
