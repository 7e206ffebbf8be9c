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

  test("streaming over the real events parquet: windowed counts match batch") {
    import spark.implicits._
    // FileStreamSource needs a directory: stage the fixture file, then
    // read it with the same vintage-normalization batch code uses
    val dir = java.nio.file.Files.createTempDirectory("graft-evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = graft.Tables.loadStream(spark, dir.toString, "events",
      s"$sf0001/events.parquet")
    val agg = raw
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "6 hours"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("ev_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_win")
        .select(unix_micros($"window.start").as("b"), $"n")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.Tables.load(spark, sf0001, "events")
        .groupBy(window($"ts", "6 hours"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros($"window.start").as("b"), $"n")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming session_window groups by inactivity gap") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "uid")
      .withWatermark("ts", "5 seconds")
      .groupBy(session_window($"ts", "4 seconds").as("sw"), $"uid")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // uid 1: events at 1,3,5s (one session), then 20s (new session)
      input.addData((ts(1), 1L), (ts(3), 1L), (ts(5), 1L), (ts(20), 1L))
      q.processAllAvailable()
      input.addData((ts(40), 1L))    // advance watermark; finalize both
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select($"n").as[Long].collect().sorted.toSeq
      assert(rows.containsSlice(Seq(1L, 3L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming session_window over the real fixture equals the batch q28 result") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sessstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = graft.Tables.loadStream(spark, dir.toString, "events",
      s"$sf0001/events.parquet")
    val agg = raw
      .withWatermark("ts", "1 hour")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", unix_micros($"w.start").as("start_us"),
        unix_micros($"w.end").as("end_us"), $"n_events")
    val q = agg.writeStream.format("memory").queryName("sess_q28")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_q28").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = graft.operators.Advanced.sessionWindow.run(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch, "stream and batch session assembly must agree")
      assert(batch.nonEmpty)
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
