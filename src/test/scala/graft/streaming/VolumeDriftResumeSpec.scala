package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Restart-survival for the volume-drift monitor: kill between
  * micro-batches, restart from the checkpoint — per-stratum counts
  * must come back from the store (not reset), so the final reports
  * still equal the batch gate for arriving strata. */
class VolumeDriftResumeSpec extends SparkSuite {

  test("stratum counts survive a restart and accumulate to the batch gate") {
    import spark.implicits._
    val d = graft.Tables.load(spark, sf0001, "documents")
    val h = substring(md5($"doc_id".cast("string")), 1, 1)
    val baseline = d.filter(h =!= "f").groupBy($"source", $"lang")
      .agg(count(lit(1)).as("c1"))
    val v2 = d.filter(h =!= "0").select($"doc_id", $"source", $"lang")
    val expected = graft.operators.Quality.dqVolumeDrift.run(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getString(5)))
      .filter(_._4 > 0L)
      .toSet

    val root = java.nio.file.Files.createTempDirectory("graft-vdresume")
    val in = root.resolve("in"); java.nio.file.Files.createDirectory(in)
    val ckpt = root.resolve("ckpt").toString
    def addParquet(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = root.resolve(s"scratch-$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    VolumeDriftResumeSpec.sink.clear()
    def start() = {
      val stream = spark.readStream.schema("source STRING, lang STRING")
        .parquet(in.toString)
      VolumeDriftStream.monitor(stream, baseline)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[DriftReport], _: Long) =>
          b.collect().foreach(r => VolumeDriftResumeSpec.sink.add(r)); ()
        }
        .start()
    }
    try {
      val h2 = substring(md5($"doc_id".cast("string")), 2, 1)
      addParquet(v2.filter(h2 < "8").drop("doc_id"), "b1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()   // the "kill"
      assert(VolumeDriftResumeSpec.sink.size() > 0, "first run emitted nothing")

      addParquet(v2.filter(h2 >= "8").drop("doc_id"), "b2")
      val q2 = start()                                  // fresh query, same checkpoint
      try q2.processAllAvailable() finally q2.stop()

      val all = new java.util.ArrayList(VolumeDriftResumeSpec.sink)
        .toArray(Array.empty[DriftReport])
      // version continuity across the restart proves restored state
      assert(all.exists(_.version == 2L), "no stratum straddled the restart")
      val lastV = all.groupBy(r => (r.source, r.lang))
        .view.mapValues(_.map(_.version).max).toMap
      val got = all.filter(r => r.version == lastV((r.source, r.lang)))
        .map(r => (r.source, r.lang, r.c1, r.c2, r.drift_ppm, r.status)).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(4)} extra=${(got -- expected).take(4)}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }
}

object VolumeDriftResumeSpec {
  val sink = new java.util.concurrent.ConcurrentLinkedQueue[DriftReport]()
}
