package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Index FRESHNESS semantics of the restricted serve path
  * ([[MmrServeStream.serveCorpus]]): the admitted manifest is the
  * STATIC side of a stream-static join, and a plain parquet relation
  * resolves its file listing when the DataFrame is CREATED — so a
  * long-lived serve query keeps answering from the admission snapshot
  * it started with, and documents admitted later are NOT servable
  * until the serve query is restarted over a re-read manifest. This
  * spec pins that behavior empirically (it would flip loudly if a
  * Spark upgrade re-listed static file relations per micro-batch) and
  * proves the refresh discipline: restart over a fresh read → the new
  * admissions serve. The 100 TB deployment consequence: serve-index
  * freshness is a RESTART-cadence dial (or an epoch-pointer swap, the
  * IndexSink pattern), not something the join refreshes for free. */
class ServeFreshnessSpec extends SparkSuite {

  test("admissions after serve start are invisible until restart over a re-read manifest") {
    import spark.implicits._
    val admitted = java.nio.file.Files.createTempDirectory("graft-servefresh-adm")
    val in = java.nio.file.Files.createTempDirectory("graft-servefresh-q")
    val scratch = java.nio.file.Files.createTempDirectory("graft-servefresh-scr")
    def admit(ids: Seq[Long], name: String): Unit = {
      val tmp = scratch.resolve(name)
      ids.toDF("doc_id").coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, admitted.resolve(s"$name.parquet"))
      ()
    }
    def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = scratch.resolve(name)
      spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
      ()
    }
    def admittedIds() = spark.read.parquet(admitted.toString)
      .select($"doc_id".as("vec_id"))
    def startServe(sinkName: String) = {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
      MmrServeStream.serveCorpus(stream, sf0001, admittedIds(), nprobe = 16)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
    }

    try {
      val setA = (100L until 120L)
      val setB = (200L until 300L)
      admit(setA, "a")

      val q1 = startServe("serve_fresh_1")
      try {
        addQueries(col("vec_id") < 4, "q1")
        q1.processAllAvailable()
        val hits1 = spark.table("serve_fresh_1").select($"vec_id").as[Long]
          .collect().toSet
        assert(hits1.nonEmpty && hits1.subsetOf(setA.toSet),
          s"pre-B hits must come from the admitted snapshot A, got $hits1")

        // B lands AFTER the serve query started: the static side's file
        // listing was resolved at DataFrame creation, so the running
        // query must keep serving from snapshot A only
        admit(setB, "b")
        addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "q2")
        q1.processAllAvailable()
        val hits2 = spark.table("serve_fresh_1").select($"vec_id").as[Long]
          .collect().toSet
        assert(hits2.subsetOf(setA.toSet),
          "a running serve query saw admissions newer than its start — " +
            s"Spark began re-listing static file relations per batch " +
            s"(revisit the serve refresh discipline!): ${hits2 -- setA.toSet}")
      } finally q1.stop()

      // the refresh discipline: restart over a RE-READ manifest — the
      // same queries now retrieve from A ∪ B (B is 5× A, so the MMR
      // top-5 picks B members for these fixtures)
      val q2 = startServe("serve_fresh_2")
      try {
        addQueries(col("vec_id") < 8, "q3")
        q2.processAllAvailable()
      } finally q2.stop()
      val hits3 = spark.table("serve_fresh_2").select($"vec_id").as[Long]
        .collect().toSet
      assert(hits3.subsetOf(setA.toSet ++ setB.toSet),
        s"post-restart hits outside the admitted union: ${hits3 -- setA.toSet -- setB.toSet}")
      assert(hits3.intersect(setB.toSet).nonEmpty,
        "restart over a re-read manifest must make the new admissions servable")
    } finally {
      Seq(admitted, in, scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }
}
