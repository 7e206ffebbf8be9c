package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Streaming SCD2 must converge to the batch SCD2 table: every closed
  * interval emitted by the stream equals the non-current subset of
  * [[graft.operators.CdcBatch.scd2]], and the per-subject open versions
  * in state account for exactly the current rows. */
class Scd2StreamSpec extends SparkSuite {

  test("streamed closed intervals equal the batch scd2 non-current rows") {
    implicit val s = spark
    import s.implicits._
    // stage the fixture globally ts-sorted across 4 sequential files so
    // per-subject cross-batch arrival order matches the CDC source's
    // own ordering guarantee (the operator's documented contract)
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2stream")
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
      .orderBy($"ts_us", $"event_id").collect()
    val quarter = (ev.length + 3) / 4
    ev.grouped(quarter).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toDF("event_id", "user_id", "event_type", "ts_us")
        .coalesce(1).write.parquet(s"$dir/f$i")
      // FileStreamSource admits pending files in last-modified order;
      // fast sequential writes can tie at FS timestamp granularity and
      // flip chunk order, so pin a strictly monotonic mod time per chunk
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/f$i")).forEach { f =>
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      }
    }
    // one sequential-file stream, one file per trigger
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(s"$dir/f*")
      .as[Scd2Stream.EventIn]
    val q = Scd2Stream.closedIntervals(src)
      .writeStream.format("memory").queryName("scd2_closed")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()

    val streamed = spark.table("scd2_closed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
    val batch = graft.operators.CdcBatch.scd2.run(spark, sf0001).collect()
    val closed = batch.filter(!_.getBoolean(5))
      .map(r => (r.getLong(1), r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4))).toSet
    assert(streamed == closed,
      s"streamed ${streamed.size} closed intervals != batch ${closed.size}")
    // open versions in state == one current row per subject in the batch table
    val currents = batch.count(_.getBoolean(5))
    val subjects = batch.map(_.getLong(1)).distinct.length
    assert(currents == subjects, "batch: exactly one current row per subject")
    assert(streamed.size == batch.length - currents)
    assert(streamed.nonEmpty)
  }
}
