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
}
