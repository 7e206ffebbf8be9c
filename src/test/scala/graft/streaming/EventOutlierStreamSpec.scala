package graft.streaming

import graft.SparkSuite

/** The production anomaly-monitor shape of `events_outliers`: per-type
  * integer z-test stats are computed once, in batch, from the trailing
  * snapshot (the overflow-fenced collect) and broadcast as the static
  * side; arriving events are flagged IN FLIGHT by the stateless
  * stream-static join + exact decimal(38,0) filter. Driven across two
  * micro-batches; the streamed flag set must equal the oracled batch
  * operator's output exactly (same stats window on both sides). */
class EventOutlierStreamSpec extends SparkSuite {

  test("stream-static outlier flagging over two micro-batches equals the batch z-test") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val op = graft.operators.Pipeline
    val evB = op.outlierCents(graft.Tables.load(spark, sf0001, "events"))
    val st = op.outlierStatsFrame(spark, evB)
    val expected = op.eventOutliers.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(expected.nonEmpty, "fixture should contain 2-sigma outliers")

    val in = java.nio.file.Files.createTempDirectory("graft-outlierstream")
    val scratch = java.nio.file.Files.createTempDirectory("graft-outlierscratch")
    val events = graft.Tables.load(spark, sf0001, "events")
    val mid = events.agg(expr("percentile_approx(event_id, 0.5)")).head().get(0)
      .toString.toDouble.toLong
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = scratch.resolve(name)
      // stage from the RAW parquet (same vintage as the schema source)
      spark.read.parquet(s"$sf0001/events.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val stream = op.outlierCents(
        graft.Tables.loadStream(spark, in.toString, "events", s"$sf0001/events.parquet"))
      val q = op.outlierFlag(stream, st)
        .writeStream.format("memory").queryName("outlier_out")
        .outputMode("append").start()
      try {
        addFile(col("event_id") <= mid, "b1")
        q.processAllAvailable()
        val afterB1 = spark.table("outlier_out").count()
        addFile(col("event_id") > mid, "b2")
        q.processAllAvailable()
        assert(afterB1 > 0 && spark.table("outlier_out").count() > afterB1,
          "fixture: outliers should land in both micro-batches")
      } finally q.stop()
      val got = spark.table("outlier_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expected,
        s"stream/batch divergence: missing=${expected -- got} extra=${got -- expected}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(in.toFile); rm(scratch.toFile)
    }
  }
}
