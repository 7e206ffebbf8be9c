package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the volume-drift monitor: draining the v2
  * snapshot derivation across two micro-batches against the v1
  * baseline must end with exactly the batch `dq_volume_drift` rows
  * for every stratum that has arrivals ('gone' strata never invoke a
  * group — the documented read-time check), with cross-batch count
  * accumulation proven. */
class VolumeDriftStreamSpec extends SparkSuite {

  test("final streamed drift reports equal the batch gate for arriving strata") {
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
      .filter(_._4 > 0L)   // strata with arrivals only
      .toSet

    val in = java.nio.file.Files.createTempDirectory("graft-vdrift-in")
    val scratch = java.nio.file.Files.createTempDirectory("graft-vdrift-scr")
    def addParquet(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = scratch.resolve(name)
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val stream = spark.readStream.schema("source STRING, lang STRING")
        .parquet(in.toString)
      val q = VolumeDriftStream.monitor(stream, baseline)
        .writeStream.format("memory").queryName("vdrift_out")
        .outputMode("update").start()
      try {
        // split v2 by a content-addressed digit so strata straddle the
        // boundary (doc_id parity correlates with source in the fixture)
        val h2 = substring(md5($"doc_id".cast("string")), 2, 1)
        addParquet(v2.filter(h2 < "8").drop("doc_id"), "b1")
        q.processAllAvailable()
        addParquet(v2.filter(h2 >= "8").drop("doc_id"), "b2")
        q.processAllAvailable()
      } finally q.stop()
      val all = spark.table("vdrift_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
          r.getString(6)))
      // cross-batch accumulation really happened: some stratum emitted twice
      assert(all.exists(_._3 == 2L),
        s"no stratum straddled the batch boundary: n=${all.length} versions=${all.map(_._3).distinct.toSeq} sample=${all.take(3).toSeq}")
      val lastV = all.groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).max).toMap
      val got = all.filter(x => x._3 == lastV((x._1, x._2)))
        .map(x => (x._1, x._2, x._4, x._5, x._6, x._7)).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(4)} extra=${(got -- expected).take(4)}")
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }

  test("deadline form: silent strata fire 'gone' MID-INGEST; recovery re-reports") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L
    def ts(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000L)
    val baseline = Seq(("sA", "en", 2L), ("sB", "en", 2L), ("sC", "en", 3L))
      .toDF("source", "lang", "c1")
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val src = input.toDS().toDF("source", "lang", "ts")
      .withWatermark("ts", "1 second")
    val q = VolumeDriftStream.monitorWithDeadline(src, baseline, t0, 60000L)
      .writeStream.format("memory").queryName("vdrift_dl")
      .outputMode("update").start()
    def rows() = spark.table("vdrift_dl").collect().map(r =>
      (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getString(6)))
    try {
      // batch 1: sA and sB arrive; sC never will
      input.addData(("sA", "en", ts(10)), ("sA", "en", ts(10)),
        ("sB", "en", ts(10)), ("sB", "en", ts(11)))
      q.processAllAvailable()
      assert(!rows().exists(_._6 == "gone"), "nothing is past its deadline yet")
      // batch 2: only sA arrives, 2 minutes on — the watermark it
      // advances passes sB's and sC's 60 s deadlines while the stream
      // is still ingesting: both must fire WITHOUT any end-of-stream audit
      input.addData(("sA", "en", ts(120)))
      q.processAllAvailable()
      val gones = rows().filter(_._6 == "gone")
      assert(gones.exists(g => g._1 == "sB" && g._4 == 2L && g._5 == Some(0L)),
        s"stopped-arriving stratum must fire mid-ingest: ${gones.toSeq}")
      assert(gones.exists(g => g._1 == "sC" && g._4 == 0L && g._5 == Some(-1000000L)),
        s"never-arrived stratum must fire from its registration: ${gones.toSeq}")
      assert(!gones.exists(_._1 == "sA"), "the live stratum must not fire")
      // batch 3: sB resumes — an ordinary report at a higher version
      // (consumers keeping max-version see the recovery supersede 'gone')
      input.addData(("sB", "en", ts(200)))
      q.processAllAvailable()
      val b = rows().filter(_._1 == "sB")
      val goneV = b.filter(_._6 == "gone").map(_._2).max
      val after = b.filter(x => x._2 > goneV)
      assert(after.nonEmpty && after.forall(x => x._6 == "drift" && x._4 == 3L),
        s"recovery must re-report past the gone version: ${b.toSeq}")
    } finally q.stop()
  }
}
