package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[ManagedServe]] — the serve-refresh discipline as a component:
  * admissions landing while the serve runs trigger a query bounce over
  * a re-read manifest, new queries then retrieve the new admissions,
  * and queries answered BEFORE the bounce are never re-served (the
  * one-checkpoint-across-bounces exactly-once contract). */
class ManagedServeSpec extends SparkSuite {

  test("admissions become servable after the automatic bounce; no re-serves") {
    import spark.implicits._
    val admitted = java.nio.file.Files.createTempDirectory("graft-mserve-adm")
    val in = java.nio.file.Files.createTempDirectory("graft-mserve-q")
    val scratch = java.nio.file.Files.createTempDirectory("graft-mserve-scr")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mserve-ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft-mserve-out")
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
    def served() = spark.read.parquet(out.toString)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()

    val setA = (100L until 120L)
    val setB = (200L until 300L)
    admit(setA, "a")
    val h = ManagedServe.start(spark, in.toString,
      s"$sf0001/embeddings.parquet", sf0001,
      admitted.toString, ckpt.toString, out.toString,
      nprobe = 16, pollMs = 300L)
    try {
      addQueries(col("vec_id") < 4, "q1")
      h.drain()
      val phase1 = served()
      assert(phase1.nonEmpty && phase1.map(_._2).toSet.subsetOf(setA.toSet),
        "pre-bounce hits must come from snapshot A")

      admit(setB, "b")
      assert(h.awaitBounces(1), "manager must bounce on manifest growth")
      addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "q2")
      h.drain()
      val phase2 = served()

      // q2 (post-bounce) retrieves from A ∪ B and actually reaches B
      val q2Hits = phase2.filter(p => p._1 >= 4 && p._1 < 8).map(_._2).toSet
      assert(q2Hits.subsetOf(setA.toSet ++ setB.toSet))
      assert(q2Hits.intersect(setB.toSet).nonEmpty,
        "post-bounce queries must retrieve the new admissions")
      // q1's answers are NOT re-served or changed by the bounce
      val q1Before = phase1.filter(_._1 < 4).sorted.toSeq
      val q1After = phase2.filter(_._1 < 4).sorted.toSeq
      assert(q1After == q1Before,
        s"bounce re-served or mutated pre-bounce answers: before=$q1Before after=$q1After")
    } finally {
      h.stop()
      Seq(admitted, in, scratch, ckpt, out).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("starts BEFORE the first admission: serves nothing, then bounces servable") {
    import spark.implicits._
    val admitted = java.nio.file.Files.createTempDirectory("graft-mserve0-adm")
    val in = java.nio.file.Files.createTempDirectory("graft-mserve0-q")
    val scratch = java.nio.file.Files.createTempDirectory("graft-mserve0-scr")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mserve0-ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft-mserve0-out")
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
    // explicit schema: before anything is served the sink dir has a
    // commit log but zero committed files — inference would fail
    def served() = spark.read
      .schema("qid LONG, step INT, vec_id LONG, mmr_score LONG")
      .parquet(out.toString)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()

    // the round-12/13 defect: start() over a pre-admission (empty)
    // manifest used to die on schema inference — the manager could
    // not be brought up before the first admission landed
    val h = ManagedServe.start(spark, in.toString,
      s"$sf0001/embeddings.parquet", sf0001,
      admitted.toString, ckpt.toString, out.toString,
      nprobe = 16, pollMs = 300L)
    try {
      // a query arriving pre-admission is answered with the empty
      // corpus: zero hits, by design (serve-nothing, not a crash)
      addQueries(col("vec_id") < 2, "q0")
      h.drain()
      assert(served().isEmpty, "pre-admission serve must emit no hits")

      val setA = (100L until 120L)
      admit(setA, "a")
      assert(h.awaitBounces(1), "first admission must bounce the cold manager")
      addQueries(col("vec_id") >= 2 && col("vec_id") < 4, "q1")
      h.drain()
      val hits = served().filter(p => p._1 >= 2 && p._1 < 4).map(_._2).toSet
      assert(hits.nonEmpty && hits.subsetOf(setA.toSet),
        "post-bounce queries must retrieve the first admission")
    } finally {
      h.stop()
      Seq(admitted, in, scratch, ckpt, out).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("a failed bounce holds drain() open until the retry succeeds") {
    import spark.implicits._
    val admitted = java.nio.file.Files.createTempDirectory("graft-mservef-adm")
    val in = java.nio.file.Files.createTempDirectory("graft-mservef-q")
    val scratch = java.nio.file.Files.createTempDirectory("graft-mservef-scr")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mservef-ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft-mservef-out")
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
    def served() = spark.read
      .schema("qid LONG, step INT, vec_id LONG, mmr_score LONG")
      .parquet(out.toString)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()

    val setA = (100L until 120L)
    val setB = (200L until 300L)
    admit(setA, "a")
    // start()'s own restart wiring, plus the fault injector: the
    // SECOND restart (the first BOUNCE) throws once — the transient
    // window where `current` is cleanly stopped and, pre-fix, drain()
    // returned a false "settled" with the serve down
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val failedOnce = new java.util.concurrent.CountDownLatch(1)
    def restart(): org.apache.spark.sql.streaming.StreamingQuery = {
      if (attempts.incrementAndGet() == 2) {
        failedOnce.countDown()
        sys.error("transient restart fault")
      }
      val queries = graft.Tables.loadStream(
        spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
      val adm = MmrServeStream.readAdmittedIds(spark, admitted.toString)
      MmrServeStream.serveCorpus(queries, sf0001, adm, nprobe = 16)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .format("parquet").option("path", out.toString)
        .start()
    }
    val h = ManagedServe.startWith(() => restart(),
      () => MmrServeStream.manifestVersion(spark, admitted.toString),
      pollMs = 300L)
    try {
      addQueries(col("vec_id") < 4, "q1")
      h.drain()
      assert(served().nonEmpty, "pre-bounce serve must answer")

      // trigger the bounce whose restart throws; wait for the fault
      admit(setB, "b")
      assert(failedOnce.await(15, java.util.concurrent.TimeUnit.SECONDS),
        "the injected restart fault must fire")
      // serve is DOWN here (stopped, restart failed). Queries landing
      // now must still be answered by the time drain() returns: the
      // bounceFailed flag holds drain open across the poll retry.
      addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "q2")
      h.drain()
      assert(h.bounces >= 1,
        "drain must not return before the retried bounce completed")
      val q2Hits = served().filter(p => p._1 >= 4 && p._1 < 8).map(_._2).toSet
      assert(q2Hits.nonEmpty, "queries landing in the failure window " +
        "must be served once the retry succeeds — drain returned with " +
        "the serve down")
      assert(q2Hits.intersect(setB.toSet).nonEmpty,
        "the retried bounce must serve against the refreshed manifest")
    } finally {
      h.stop()
      Seq(admitted, in, scratch, ckpt, out).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }
}
