package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the continuous constraint monitor: after
  * draining lineitem across two micro-batches, the LATEST running
  * totals per constraint must equal `dq_constraints`' row-local rows —
  * cross-batch counter accumulation is the thing under test. */
class DqStreamSpec extends SparkSuite {

  test("running constraint totals equal the batch audit after two batches") {
    import spark.implicits._
    val batch = graft.operators.Quality.dqConstraints.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
      .view.filterKeys(_ != "key_unique").toMap   // row-local rows only

    val in = java.nio.file.Files.createTempDirectory("graft-dqstream")
    val scratch = java.nio.file.Files.createTempDirectory("graft-dqscratch")
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = scratch.resolve(name)
      spark.read.parquet(s"$sf0001/lineitem.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "lineitem", s"$sf0001/lineitem.parquet")
      val q = DqStream.monitor(stream)
        .writeStream.format("memory").queryName("dq_out")
        .outputMode("update").start()
      try {
        addFile(col("l_orderkey") % 2 === 0, "b1")
        q.processAllAvailable()
        addFile(col("l_orderkey") % 2 =!= 0, "b2")
        q.processAllAvailable()
      } finally q.stop()
      // update mode appends a refreshed row per touched key per batch;
      // the LATEST (largest checked) per key is the maintained state
      val got = spark.table("dq_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .groupBy(_._1).map { case (k, rows) =>
          val last = rows.maxBy(_._2)
          k -> ((last._2, last._3, last._4))
        }
      assert(got == batch, s"stream $got\n != batch $batch")
      // both batches genuinely contributed to the totals
      val perBatchMax = spark.table("dq_out").collect()
        .map(_.getLong(1)).distinct.sorted
      assert(perBatchMax.length >= 2, "totals never accumulated across batches")
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }
}
