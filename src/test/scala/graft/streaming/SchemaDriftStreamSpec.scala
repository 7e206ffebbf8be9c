package graft.streaming

import graft.SparkSuite

/** The streaming schema-drift monitor against a driver-side
  * first-appearance recompute: one alert per (collection, key), stamped
  * with the introducing event, exactly once across micro-batches — and
  * batching-invariant (two different splits, same alerts). */
class SchemaDriftStreamSpec extends SparkSuite {

  private def expectedAlerts(): Set[(String, String, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"event_id", $"event_type", $"user_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    ev.sortBy(_._1).foldLeft((Map.empty[String, Set[String]],
        Set.empty[(String, String, Long)])) { case ((seen, alerts), (id, t, _)) =>
      val keys = (id % 3) match {
        case 1 => Seq("k", "tag"); case 2 => Seq("k", "meta"); case _ => Seq("k")
      }
      val already = seen.getOrElse(t, Set.empty)
      val fresh = keys.filterNot(already.contains)
      (seen.updated(t, already ++ fresh),
        alerts ++ fresh.map(k => (t, k, id)))
    }._2
  }

  private def runWithSplit(frac: Double, name: String): Set[(String, String, Long)] = {
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory(s"graft-drift-$name")
    val scratch = java.nio.file.Files.createTempDirectory(s"graft-driftscratch-$name")
    val events = graft.Tables.load(spark, sf0001, "events")
    val cut = events.agg(expr(s"percentile_approx(event_id, $frac)")).head().get(0)
      .toString.toDouble.toLong
    def addFile(pred: org.apache.spark.sql.Column, fn: String): Unit = {
      val tmp = scratch.resolve(fn)
      spark.read.parquet(s"$sf0001/events.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$fn.parquet"))
      ()
    }
    try {
      val src = graft.operators.CdcBatch.withHeterogeneousPayload(
        graft.Tables.loadStream(spark, in.toString, "events", s"$sf0001/events.parquet"))
      val q = SchemaDriftStream.alerts(src)
        .writeStream.format("memory").queryName(s"drift_$name")
        .outputMode("append").start()
      try {
        addFile(col("event_id") <= cut, "b1")
        q.processAllAvailable()
        val afterB1 = spark.table(s"drift_$name").count()
        addFile(col("event_id") > cut, "b2")
        q.processAllAvailable()
        // the monitor must not re-alert keys batch 2 re-presents
        assert(spark.table(s"drift_$name").count() >= afterB1)
      } finally q.stop()
      spark.table(s"drift_$name").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(in.toFile); rm(scratch.toFile)
    }
  }

  test("first-appearance alerts equal the driver recompute, exactly once, batching-invariant") {
    val want = expectedAlerts()
    assert(want.nonEmpty && want.size <= 5 * 3, "sane alert volume")
    val a = runWithSplit(0.5, "even")
    assert(a == want,
      s"stream/recompute divergence: missing=${want -- a} extra=${a -- want}")
    // exactly-once: one alert per (collection, key)
    assert(a.map(x => (x._1, x._2)).size == a.size, "duplicate alert for a key")
    // batching invariance: a very uneven split announces the same drift
    val b = runWithSplit(0.1, "uneven")
    assert(b == want, "alerts must not depend on the micro-batch split")
  }
}
