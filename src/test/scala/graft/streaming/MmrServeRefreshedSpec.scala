package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The bounce-free refreshed serve ([[MmrServeStream.serveRefreshed]])
  * and its batch twin. Pins: (1) `serveBatch` at full probe equals the
  * catalog `vector_mmr_rerank` operator — the same kernel folded with
  * plain flatMapGroups; (2) a manifest growing while the refreshed
  * query RUNS becomes servable in the very next micro-batch, with no
  * restart and no change to earlier epochs. */
class MmrServeRefreshedSpec extends SparkSuite {

  test("serveBatch at full probe equals the batch vector_mmr_rerank operator") {
    import spark.implicits._
    val expected = graft.operators.VectorSearch.mmrRerank.run(spark, sf0001)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getInt(r.fieldIndex("step")),
        r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("mmr_score"))))
      .toSet
    val queries = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter($"vec_id" < 8)
    val got = MmrServeStream.serveBatch(queries, sf0001, None, nprobe = 16)
      .collect().map(h => (h.qid, h.step, h.vec_id, h.mmr_score)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("a growing manifest serves in the NEXT micro-batch, no restart") {
    import spark.implicits._
    val admitted = java.nio.file.Files.createTempDirectory("graft-refresh-adm")
    val in = java.nio.file.Files.createTempDirectory("graft-refresh-q")
    val scratch = java.nio.file.Files.createTempDirectory("graft-refresh-scr")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-refresh-ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft-refresh-out")
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
    def served() = spark.read.json(s"$out/serve/batch=*")
      .select($"data.qid".as("qid"), $"data.vec_id".as("vec_id"))
      .as[(Long, Long)].collect()

    val setA = (100L until 120L)
    val setB = (200L until 300L)
    admit(setA, "a")
    val stream = graft.Tables.loadStream(
      spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
    val q = MmrServeStream.serveRefreshed(stream, sf0001,
      admitted.toString, ckpt.toString, out.toString, nprobe = 16)
    try {
      addQueries(col("vec_id") < 4, "q1")
      q.processAllAvailable()
      val phase1 = served()
      assert(phase1.nonEmpty && phase1.map(_._2).toSet.subsetOf(setA.toSet),
        "phase-1 hits must come from snapshot A")

      // B lands while the query RUNS: the per-batch manifest re-read
      // makes it servable in the very next micro-batch
      admit(setB, "b")
      addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "q2")
      q.processAllAvailable()
      val phase2 = served()
      val q2Hits = phase2.filter(p => p._1 >= 4 && p._1 < 8).map(_._2).toSet
      assert(q2Hits.intersect(setB.toSet).nonEmpty,
        "the next micro-batch must serve the new admissions without a restart")
      // earlier epochs untouched
      val q1Before = phase1.filter(_._1 < 4).sorted.toSeq
      val q1After = phase2.filter(_._1 < 4).sorted.toSeq
      assert(q1After == q1Before, "an earlier serve epoch changed")
    } finally {
      q.stop()
      Seq(admitted, in, scratch, ckpt, out).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  // ----------------------------------------------------------------
  // readAdmittedIds unit coverage — the narrowed fallback's contract:
  // genuinely-empty layouts serve nothing, data layouts (flat AND
  // partitioned AND sink-committed) serve, faults propagate.
  // ----------------------------------------------------------------

  test("readAdmittedIds: empty layouts → empty frame; data layouts → ids; corrupt → throws") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-readadm")
    def ids(p: java.nio.file.Path): Set[Long] =
      MmrServeStream.readAdmittedIds(spark, p.toString)
        .as[Long].collect().toSet
    try {
      // missing dir: nothing admitted yet (the chain pre-creates the
      // handoff dir, but a manager may start even earlier)
      assert(ids(root.resolve("missing")).isEmpty)
      // pre-created empty dir: the live chain's pre-admission state
      assert(ids(java.nio.file.Files.createDirectories(root.resolve("empty"))).isEmpty)
      // dir holding only hidden entries (a bare _spark_metadata, no
      // committed files): the sink-log branch must yield an empty
      // frame, not a persistent schema-inference failure
      java.nio.file.Files.createDirectories(root.resolve("metaonly/_spark_metadata"))
      assert(ids(root.resolve("metaonly")).isEmpty)
      // flat layout
      Seq(1L, 2L, 3L).toDF("doc_id").write.parquet(root.resolve("flat").toString)
      assert(ids(root.resolve("flat")) == Set(1L, 2L, 3L))
      // PARTITIONED layout: data only under lang=... subdirs — a
      // depth-1 probe would silently serve nothing forever
      Seq((4L, "en"), (5L, "de")).toDF("doc_id", "lang")
        .write.partitionBy("lang").parquet(root.resolve("part").toString)
      assert(ids(root.resolve("part")) == Set(4L, 5L))
      // a corrupt .parquet PROPAGATES (fails the batch → replayed on
      // restart) instead of silently serving an empty corpus
      val corrupt = java.nio.file.Files.createDirectories(root.resolve("corrupt"))
      java.nio.file.Files.write(corrupt.resolve("x.parquet"),
        "not a parquet file".getBytes)
      intercept[Exception] { ids(corrupt) }
      ()
    } finally {
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
      ()
    }
  }

  test("readAdmittedIds on a sink-written dir: log-driven — orphans ignored, commits served") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-readadm-sink")
    try {
      val src = root.resolve("src")
      Seq(10L, 11L).toDF("doc_id").coalesce(1).write.parquet(src.toString)
      val target = root.resolve("adm").toString
      val q = spark.readStream.schema("doc_id LONG").parquet(src.toString)
        .writeStream.format("parquet").option("path", target)
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      def ids(): Set[Long] = MmrServeStream
        .readAdmittedIds(spark, target).as[Long].collect().toSet
      assert(ids() == Set(10L, 11L))
      // an ORPHANED (uncommitted) part file must NOT count: the read's
      // file index is the sink's commit log, and so is the emptiness
      // probe — a raw listing would disagree in both directions
      Seq(99L).toDF("doc_id").coalesce(1)
        .write.parquet(root.resolve("orphan").toString)
      val part = root.resolve("orphan").toFile.listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(target, "part-orphan.parquet"))
      assert(ids() == Set(10L, 11L),
        "an uncommitted orphan part file leaked into the served corpus")
      ()
    } finally {
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
      ()
    }
  }

  test("manifestVersion: stable when unchanged, moves on growth, log-driven under a sink") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-mver")
    try {
      val plain = root.resolve("plain")
      assert(MmrServeStream.manifestVersion(spark, plain.toString) == "")
      Seq(1L).toDF("doc_id").coalesce(1).write.parquet(plain.toString)
      val v1 = MmrServeStream.manifestVersion(spark, plain.toString)
      assert(v1.nonEmpty &&
        MmrServeStream.manifestVersion(spark, plain.toString) == v1)
      // growth under a SUBDIR moves the version too (layout tolerance)
      Seq((2L, "en")).toDF("doc_id", "lang").coalesce(1)
        .write.partitionBy("lang").mode("append").parquet(plain.toString)
      assert(MmrServeStream.manifestVersion(spark, plain.toString) != v1)

      // sink-written: the version is the commit log's file set — one
      // small-dir listing, and it moves exactly when an epoch commits
      val src = root.resolve("src")
      val target = root.resolve("adm").toString
      def commit(ids: Seq[Long], name: String): Unit = {
        val stage = root.resolve(s"stage-$name")
        ids.toDF("doc_id").coalesce(1).write.parquet(stage.toString)
        val part = stage.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.createDirectories(src)
        java.nio.file.Files.copy(part.toPath, src.resolve(s"$name.parquet"))
        val q = spark.readStream.schema("doc_id LONG").parquet(src.toString)
          .writeStream.format("parquet").option("path", target)
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      commit(Seq(20L), "a")
      val s1 = MmrServeStream.manifestVersion(spark, target)
      assert(s1.nonEmpty &&
        MmrServeStream.manifestVersion(spark, target) == s1)
      commit(Seq(21L), "b")
      assert(MmrServeStream.manifestVersion(spark, target) != s1,
        "a committed epoch must move the version pointer")
      ()
    } finally {
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
      ()
    }
  }

  test("epoch-pointer serve: growth serves next batch; unchanged epochs reuse the held plan") {
    import spark.implicits._
    val admitted = java.nio.file.Files.createTempDirectory("graft-epoch-adm")
    val in = java.nio.file.Files.createTempDirectory("graft-epoch-q")
    val scratch = java.nio.file.Files.createTempDirectory("graft-epoch-scr")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-epoch-ckpt")
    val out = java.nio.file.Files.createTempDirectory("graft-epoch-out")
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
    def served() = spark.read.json(s"$out/serve/batch=*")
      .select($"data.qid".as("qid"), $"data.vec_id".as("vec_id"))
      .as[(Long, Long)].collect()

    val setA = (100L until 120L)
    val setB = (200L until 300L)
    admit(setA, "a")
    val stream = graft.Tables.loadStream(
      spark, in.toString, "embeddings", s"$sf0001/embeddings.parquet")
    val q = MmrServeStream.serveEpochRefreshed(stream, sf0001,
      admitted.toString, ckpt.toString, out.toString, nprobe = 16)
    try {
      addQueries(col("vec_id") < 2, "q1")
      q.processAllAvailable()
      val phase1 = served()
      assert(phase1.nonEmpty && phase1.map(_._2).toSet.subsetOf(setA.toSet),
        "phase-1 hits must come from snapshot A")

      // UNCHANGED manifest: the next batch reuses the held plan (the
      // pointer didn't move) and must still answer correctly
      addQueries(col("vec_id") >= 2 && col("vec_id") < 4, "q1b")
      q.processAllAvailable()
      val phase1b = served()
      val q1bHits = phase1b.filter(p => p._1 >= 2 && p._1 < 4).map(_._2).toSet
      assert(q1bHits.nonEmpty && q1bHits.subsetOf(setA.toSet),
        "held-epoch reuse must keep serving the pinned manifest")

      // growth moves the pointer: servable in the very NEXT micro-batch
      admit(setB, "b")
      addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "q2")
      q.processAllAvailable()
      val phase2 = served()
      val q2Hits = phase2.filter(p => p._1 >= 4 && p._1 < 8).map(_._2).toSet
      assert(q2Hits.intersect(setB.toSet).nonEmpty,
        "the next micro-batch must serve the new admissions without a restart")
      val q1Before = phase1.filter(_._1 < 2).sorted.toSeq
      val q1After = phase2.filter(_._1 < 2).sorted.toSeq
      assert(q1After == q1Before, "an earlier serve epoch changed")
    } finally {
      q.stop()
      Seq(admitted, in, scratch, ckpt, out).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }
}
