package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the live cohort-LTV tracker: the latest-version
  * curve per (cohort_day, age) must equal the oracled
  * `events_cohort_ltv` batch rows under an ARBITRARY event split
  * (state is a per-age map of commutative sums, so arrival order is
  * immaterial — asserted with an md5-keyed split that scatters every
  * cohort across both micro-batches), and across a kill/restart. */
class CohortLtvStreamSpec extends SparkSuite {

  private def latest(rows: Array[CohortLtvRow]) =
    rows.groupBy(r => (r.cohort_day, r.age))
      .map { case (_, rs) => rs.maxBy(_.version) }
      .map(r => (r.cohort_day, r.age, r.n_users, r.n_events, r.rev_cents,
        r.cum_rev_cents, r.ltv_micro_cents)).toSet

  private def expectedRows = graft.operators.Catalog.all
    .find(_.name == "events_cohort_ltv").get.run(spark, sf0001).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toSet

  test("latest-version curves equal the batch operator under an arbitrary split") {
    import spark.implicits._
    val events = graft.Tables.load(spark, sf0001, "events")
    val cohort = CohortLtvStream.cohortTable(spark, sf0001).localCheckpoint()
    val expected = expectedRows
    assert(expected.nonEmpty)
    val in = java.nio.file.Files.createTempDirectory("graft-ltvstream")
    val scratch = java.nio.file.Files.createTempDirectory("graft-ltvscratch")
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = scratch.resolve(name)
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
      ()
    }
    // md5-keyed split: every cohort's events straddle the two batches
    // (fixture columns correlate with id-parity splits; a digest split
    // does not), so cross-batch state continuation carries real weight
    val half = md5(concat_ws(":", $"user_id", $"ts")).substr(1, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7")
    try {
      val stream = spark.readStream.schema(events.schema).parquet(in.toString)
      val q = CohortLtvStream.track(stream, cohort)
        .writeStream.format("memory").queryName("ltv_out")
        .outputMode("update").start()
      try {
        addFile(events.filter(half), "b1")
        q.processAllAvailable()
        val afterB1 = spark.table("ltv_out").count()
        assert(afterB1 > 0, "first micro-batch emitted nothing")
        addFile(events.filter(!half), "b2")
        q.processAllAvailable()
        assert(spark.table("ltv_out").count() > afterB1)
      } finally q.stop()
      val got = latest(spark.table("ltv_out").as[CohortLtvRow].collect())
      assert(got == expected,
        s"stream/batch divergence: missing=${expected -- got} extra=${got -- expected}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(in.toFile); rm(scratch.toFile)
    }
  }

  test("cohort tallies survive a restart: post-restart revenue lands on pre-restart curves") {
    import spark.implicits._
    val events = graft.Tables.load(spark, sf0001, "events")
    val cohort = CohortLtvStream.cohortTable(spark, sf0001).localCheckpoint()
    val expected = expectedRows
    val root = java.nio.file.Files.createTempDirectory("graft-ltvresume")
    java.nio.file.Files.createDirectory(root.resolve("in"))
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = root.resolve(s"scr-$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, root.resolve(s"in/$name.parquet"))
      ()
    }
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[CohortLtvRow]()
    def start() = {
      val src = spark.readStream.schema(events.schema)
        .parquet(root.resolve("in").toString)
      CohortLtvStream.track(src, cohort)
        .writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[CohortLtvRow], _: Long) =>
          b.collect().foreach(emitted.add); ()
        }
        .start()
    }
    val half = md5(concat_ws(":", $"user_id", $"ts")).substr(1, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7")
    try {
      addFile(events.filter(half), "b1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      import scala.jdk.CollectionConverters._
      val v1 = emitted.asScala.map(_.version).max
      addFile(events.filter(!half), "b2")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val all = emitted.asScala.toArray
      // the restart proof: versions kept advancing (state restored, not
      // restarted at version 1 over empty tallies)...
      assert(all.exists(_.version > v1), "no post-restart emission")
      // ...and the final curves equal batch, which requires phase-1
      // revenue to still be inside the post-restart cumulative
      val got = latest(all)
      assert(got == expected,
        s"restart divergence: missing=${expected -- got} extra=${got -- expected}")
    } finally {
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
      ()
    }
  }
}
