package graft.tools

import org.apache.spark.sql.functions._

/** Prices [[graft.streaming.ManagedServe]]'s freshness dial: the wall
  * time from an ADMISSION landing to the first answer that retrieves
  * it. Protocol per round: queries stream steadily (one file per
  * second, pre-bounce corpus A already warm), a new admission set B
  * lands, and the clock stops at the first served hit with a B vec_id.
  * The measured number decomposes as poll-detection (≤ pollMs) +
  * serve-query cold restart + one micro-batch — the restart being the
  * dominant term is the expected read, and the reason a deployment
  * sizes pollMs well under its freshness SLA and keeps the serve
  * query's static side small (the admitted manifest, not the corpus).
  *
  * Usage: `runMain graft.tools.ServeRefreshProbe [rounds]
  * [live|epoch|managed] [frag=N]`
  * (default 5 bounce-mode rounds; `live` switches to
  * [[graft.streaming.MmrServeStream.serveRefreshed]], the bounce-free
  * per-batch-manifest form, same protocol — the delta between the two
  * numbers IS the bounce fee; `epoch` switches to
  * [[graft.streaming.MmrServeStream.serveEpochRefreshed]], the
  * pointer-swap form — same freshness, and the `steady_cycle_sec`
  * delta vs `live` IS the per-batch re-list+re-plan fee the pointer
  * removes). Every round also reports `steady_cycle_sec`: the mean
  * wall time of a query→drain cycle with NO admission in flight
  * (steady state), the number a per-batch overhead actually shows
  * up in.
  */
object ServeRefreshProbe {

  def main(args: Array[String]): Unit = {
    val live = args.contains("live")
    val epoch = args.contains("epoch")
    // managed: the full snapshot topology — ManagedIndex watches the
    // manifest (embedding-carrying rows), publishes versions behind
    // the pointer, and a serveIndexedPointer serve answers; freshness
    // = poll + one map-only reindex + pointer pickup next batch
    val managed = args.contains("managed")
    // frag=N: pre-admit the warm corpus as N single-id manifest files
    // — the "many small epochs" layout a long-running chain produces,
    // where the per-batch re-list+re-plan fee actually lives (at 1-2
    // manifest files it is below host noise; see SCALING.md)
    val frag = args.collectFirst { case a if a.startsWith("frag=") =>
      a.stripPrefix("frag=").toInt }.getOrElse(1)
    val rounds = args.filterNot(a =>
        a == "live" || a == "epoch" || a == "managed" || a.startsWith("frag="))
      .headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    (1 to rounds).foreach { round =>
      val admitted = java.nio.file.Files.createTempDirectory(s"graft-srp-adm$round")
      val in = java.nio.file.Files.createTempDirectory(s"graft-srp-q$round")
      val scratch = java.nio.file.Files.createTempDirectory(s"graft-srp-scr$round")
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-srp-ck$round")
      val out = java.nio.file.Files.createTempDirectory(s"graft-srp-out$round")
      def admit(ids: Seq[Long], name: String): Unit = {
        val tmp = scratch.resolve(name)
        // the managed mode's manifest rows carry the embedding (the
        // admit-time-indexed shape ManagedIndex re-indexes from)
        val df =
          if (managed)
            spark.read.parquet(s"$sfDir/embeddings.parquet")
              .filter(col("vec_id").isin(ids.map(Long.box): _*))
              .select(col("vec_id").as("doc_id"), lit("en").as("lang"),
                lit(10L).as("n_tokens"), lit(0L).as("rank_key"),
                lit(0L).as("cum_tokens"),
                expr("transform(embedding, x -> cast(x as double))")
                  .as("embedding"))
          else ids.toDF("doc_id")
        df.coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath, admitted.resolve(s"$name.parquet"))
        ()
      }
      def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
        val tmp = scratch.resolve(name)
        spark.read.parquet(s"$sfDir/embeddings.parquet").filter(pred)
          .coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
        ()
      }
      val setA = (100L until 120L)
      val setB = (200L until 300L)
      if (frag <= 1) admit(setA, "a")
      else {
        // fragmented warm manifest: extra single-id files beyond setA
        admit(setA, "a")
        (0 until (frag - 1)).foreach(i => admit(Seq(400L + i), f"fa$i%04d"))
      }
      // two serve forms, one protocol: bounce (ManagedServe) vs
      // per-batch manifest re-read (serveRefreshed)
      val (drain, servedHasB, stop, bounces) =
        if (managed) {
          val cb = graft.streaming.VectorServeStream.codebookFrom(
            spark, s"$sfDir/embeddings.parquet")
          val versions = scratch.resolve("versions").toString
          val pointer = scratch.resolve("POINTER").toString
          val h = graft.streaming.ManagedIndex.start(spark,
            admitted.toString, versions, pointer, cb, pollMs = 250L)
          val stream = graft.Tables.loadStream(
            spark, in.toString, "embeddings", s"$sfDir/embeddings.parquet")
          val q = graft.streaming.MmrServeStream.serveIndexedPointer(
            stream, pointer, ckpt.toString, out.toString, nprobe = 16)
          (() => q.processAllAvailable(),
            () => scala.util.Try {
              spark.read.json(s"$out/serve/batch=*")
                .filter(col("data.vec_id").isin(setB: _*)).limit(1).count() > 0
            }.getOrElse(false),
            () => { q.stop(); h.stop() }, () => h.versions)
        } else if (live || epoch) {
          val stream = graft.Tables.loadStream(
            spark, in.toString, "embeddings", s"$sfDir/embeddings.parquet")
          val q =
            if (epoch)
              graft.streaming.MmrServeStream.serveEpochRefreshed(stream, sfDir,
                admitted.toString, ckpt.toString, out.toString, nprobe = 16)
            else
              graft.streaming.MmrServeStream.serveRefreshed(stream, sfDir,
                admitted.toString, ckpt.toString, out.toString, nprobe = 16)
          (() => q.processAllAvailable(),
            () => scala.util.Try {
              spark.read.json(s"$out/serve/batch=*")
                .filter(col("data.vec_id").isin(setB: _*)).limit(1).count() > 0
            }.getOrElse(false),
            () => q.stop(), () => 0)
        } else {
          val h = graft.streaming.ManagedServe.start(spark, in.toString,
            s"$sfDir/embeddings.parquet", sfDir,
            admitted.toString, ckpt.toString, out.toString,
            nprobe = 16, pollMs = 250L)
          (() => h.drain(),
            () => scala.util.Try {
              spark.read.parquet(out.toString)
                .filter($"vec_id".isin(setB: _*)).limit(1).count() > 0
            }.getOrElse(false),
            () => h.stop(), () => h.bounces)
        }
      try {
        // warm: one answered query against snapshot A
        addQueries(col("vec_id") < 2, "q1")
        drain()
        // the measured event: B lands, queries keep arriving, clock
        // stops at the first B hit in the output
        val t0 = System.nanoTime()
        admit(setB, "b")
        var servedB = false
        var qn = 0
        while (!servedB && (System.nanoTime() - t0) < 120L * 1000000000L) {
          qn += 1
          addQueries(col("vec_id") === (1 + qn % 7).toLong, s"qb$qn")
          drain()
          servedB = servedHasB()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // steady state: query→drain cycles with NO admission in
        // flight — where a per-batch re-list/re-plan fee lives
        val steadyN = 10
        val tS = System.nanoTime()
        (1 to steadyN).foreach { i =>
          addQueries(col("vec_id") === (1 + i % 7).toLong, s"qs$i")
          drain()
        }
        val steadySec = (System.nanoTime() - tS) / 1e9 / steadyN
        val mode =
          if (managed) "managed"
          else if (epoch) "epoch" else if (live) "refreshed" else "bounce"
        println(f"""{"probe":"serve_refresh","mode":"$mode","round":$round,"admit_to_served_sec":$sec%.2f,"steady_cycle_sec":$steadySec%.3f,"bounces":${bounces()},"probe_queries":$qn}""")
      } finally {
        stop()
        Seq(admitted, in, scratch, ckpt, out).foreach(d =>
          new scala.reflect.io.Directory(d.toFile).deleteRecursively())
      }
    }
    spark.stop()
  }
}
