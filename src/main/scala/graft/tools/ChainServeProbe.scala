package graft.tools

import org.apache.spark.sql.functions._

/** Prices the two chain-serve static-side disciplines against corpus
  * size — the measurement behind §2.12's "assign the cell at
  * admission" scale claim:
  *
  *  - `chain` ([[graft.streaming.MmrServeStream.serveChainRefreshed]]):
  *    per admitted EPOCH the serve re-scans the curated store,
  *    semi-joins the admitted ids, derives the codebook and assigns
  *    every corpus vector's cell — the self-contained form, whose
  *    epoch-build cost grows with the admitted corpus;
  *  - `indexed` ([[graft.streaming.MmrServeStream.serveIndexedRefreshed]]):
  *    cells were assigned AT ADMISSION, the manifest IS the index —
  *    the epoch build is a pinned listing, no computation.
  *
  * Protocol per (mode, n): corpus = the sf embeddings replicated to n
  * rows with distinct ids; one admitted epoch covering everything;
  * the FIRST query drain pays the epoch build (`build_cycle_sec`),
  * five more drains measure steady state (`steady_cycle_sec`, min —
  * both modes serve identical answers, so the delta is pure static-
  * side machinery). nprobe = 2 (production).
  *
  * Usage: `runMain graft.tools.ChainServeProbe [n...]` (default
  * 20000 80000 320000; sf dir from SPARK_GRAFT_SF_DIR, default
  * sf0.01).
  *
  * `segments` mode — the MERGE-ON-READ FEE vs segment count (the
  * [[graft.streaming.ManagedIndex]] `maxSegments` dial measured, not
  * defaulted): `runMain graft.tools.ChainServeProbe segments [n]
  * [counts...]` (default 320000 at 1 2 4 8 16). Fixed corpus, one
  * version built as S merge-on-read segments (1 seal + S−1 delta
  * reindexes), the indexed serve drained over it — build cycle +
  * 5 steady cycles per S. The fee a segment adds is the union leg in
  * the static-side plan; the saving is the delta cycle the seal
  * avoids — this prints both sides' serve term. */
object ChainServeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if (args.headOption.contains("segments")) { segmentsMain(args.drop(1), sfDir); return }
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(20000, 80000, 320000)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select($"vec_id",
          expr("transform(embedding, x -> cast(x as double))").as("embedding"))
        .localCheckpoint()
      val baseN = base.count()
      // silent warmup at base size: the first serve of the JVM pays
      // codegen + state-store init, which would otherwise ride the
      // first printed build_cycle_sec
      runOne(spark, sfDir, base, "chain", warm = true)
      runOne(spark, sfDir, base, "indexed", warm = true)
      sizes.foreach { n =>
        val copies = (n + baseN - 1) / baseN
        val corpus = base
          .crossJoin(broadcast((0L until copies).toDF("k")))
          .select(($"vec_id" + $"k" * 1000000L).as("doc_id"), $"embedding")
          .localCheckpoint()
        runOne(spark, sfDir, corpus, "chain", warm = false)
        runOne(spark, sfDir, corpus, "indexed", warm = false)
        corpus.unpersist()
        ()
      }
    } finally spark.stop()
  }

  private def runOne(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      corpus0: org.apache.spark.sql.DataFrame, mode: String,
      warm: Boolean): Unit = {
    import spark.implicits._
    val corpus =
      if (corpus0.columns.contains("doc_id")) corpus0
      else corpus0.select($"vec_id".as("doc_id"), $"embedding")
    val n = corpus.count()
    val root = java.nio.file.Files
      .createTempDirectory(s"graft-csp-$mode-$n").toFile.getAbsolutePath
    try {
      // the chain's stores, laid down directly (the serve legs only
      // ever READ these dirs; the full CDC chain's cost is the
      // sustain probe's subject, not this one's)
      corpus.write.parquet(s"$root/curated")
      corpus.select($"doc_id").write.parquet(s"$root/admitted")
      val cb = graft.streaming.VectorServeStream.codebookFrom(
        spark, s"$sfDir/embeddings.parquet")
      if (mode == "indexed") {
        // admit-time assignment, offline form: one map-only pass
        corpus.select($"doc_id", lit("en").as("lang"),
            lit(10L).as("n_tokens"), lit(0L).as("rank_key"),
            lit(0L).as("cum_tokens"), $"embedding")
          .write.parquet(s"$root/raw")
        graft.streaming.MmrServeStream.reindexAdmitted(
          spark, s"$root/raw", cb, s"$root/index")
        ()
      }
      val in = s"$root/queries"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      def addQueries(name: String): Unit = {
        val tmp = java.nio.file.Paths.get(root, s"stage-$name")
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .filter($"vec_id" < 4).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(in, s"$name.parquet"))
        ()
      }
      val stream = graft.Tables.loadStream(
        spark, in, "embeddings", s"$sfDir/embeddings.parquet")
      val q =
        if (mode == "chain")
          graft.streaming.MmrServeStream.serveChainRefreshed(stream,
            s"$root/curated", s"$root/admitted", s"$root/ckpt", root,
            nprobe = 2)
        else
          graft.streaming.MmrServeStream.serveIndexedRefreshed(stream,
            s"$root/index", cb, s"$root/ckpt", root, nprobe = 2)
      try {
        val t0 = System.nanoTime()
        addQueries("q0")
        q.processAllAvailable()
        val build = (System.nanoTime() - t0) / 1e9
        val steady = (1 to 5).map { i =>
          val t = System.nanoTime()
          addQueries(s"q$i")
          q.processAllAvailable()
          (System.nanoTime() - t) / 1e9
        }
        // indexed mode: price one FULL maintenance cycle vs one DELTA
        // cycle at this corpus size — the incremental-compaction
        // claim as a number (full reads the whole manifest; delta
        // reads only the fresh files)
        val cycleCosts =
          if (mode == "indexed" && !warm) {
            val cb = graft.streaming.VectorServeStream.codebookFrom(
              spark, s"$sfDir/embeddings.parquet")
            val tF = System.nanoTime()
            graft.streaming.MmrServeStream.reindexAdmitted(
              spark, s"$root/raw", cb, s"$root/vfull")
            val full = (System.nanoTime() - tF) / 1e9
            // a 500-row fresh admission file
            spark.read.parquet(s"$sfDir/embeddings.parquet")
              .select(($"vec_id" + 900000000L).as("doc_id"),
                lit("en").as("lang"), lit(10L).as("n_tokens"),
                lit(0L).as("rank_key"), lit(0L).as("cum_tokens"),
                expr("transform(embedding, x -> cast(x as double))")
                  .as("embedding"))
              .coalesce(1).write.parquet(s"$root/freshdir")
            val freshFiles = graft.streaming.MmrServeStream
              .dataFiles(spark, s"$root/freshdir")
            val tD = System.nanoTime()
            graft.streaming.MmrServeStream.reindexDelta(
              spark, freshFiles, cb, s"$root/vdelta", Seq(s"$root/vfull"))
            val delta = (System.nanoTime() - tD) / 1e9
            f""","full_reindex_sec":$full%.2f,"delta_reindex_sec":$delta%.2f"""
          } else ""
        if (!warm)
          println(f"""{"probe":"chain_serve","mode":"$mode","n":$n,"build_cycle_sec":$build%.2f,"steady_cycle_min_sec":${steady.min}%.2f,"steady_cycle_med_sec":${steady.sorted.apply(2)}%.2f$cycleCosts}""")
      } finally q.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      ()
    }
  }

  private def segmentsMain(args: Array[String], sfDir: String): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(320000)
    val counts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                 else Seq(1, 2, 4, 8, 16)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select($"vec_id",
          expr("transform(embedding, x -> cast(x as double))").as("embedding"))
        .localCheckpoint()
      val baseN = base.count()
      val copies = (n + baseN - 1) / baseN
      val corpus = base
        .crossJoin(broadcast((0L until copies).toDF("k")))
        .select(($"vec_id" + $"k" * 1000000L).as("doc_id"), lit("en").as("lang"),
          lit(10L).as("n_tokens"), lit(0L).as("rank_key"),
          lit(0L).as("cum_tokens"), $"embedding")
        .localCheckpoint()
      val total = corpus.count()
      val cb = graft.streaming.VectorServeStream.codebookFrom(
        spark, s"$sfDir/embeddings.parquet")
      // JVM warmup (codegen + state init off the first printed row)
      segmentsOnce(spark, sfDir, corpus, cb, 1, warm = true)
      counts.foreach(s => segmentsOnce(spark, sfDir, corpus, cb, s,
        warm = false, total = total))
    } finally spark.stop()
  }

  /** one sweep point: the corpus as `segs` merge-on-read segments
    * (equal slices: one seal + segs−1 deltas), indexed serve drained
    * over the final version. */
  private def segmentsOnce(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, corpus: org.apache.spark.sql.DataFrame,
      cb: Array[(Int, Array[Double])], segs: Int, warm: Boolean,
      total: Long = 0L): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory(s"graft-segsweep-$segs").toFile.getAbsolutePath
    try {
      // slice the corpus into `segs` raw admission tranches
      (0 until segs).foreach { k =>
        corpus.filter(pmod($"doc_id", lit(segs.toLong)) === k)
          .write.parquet(s"$root/raw$k")
      }
      val tB = System.nanoTime()
      graft.streaming.MmrServeStream.reindexAdmitted(
        spark, s"$root/raw0", cb, s"$root/v1")
      var segments = Seq(s"$root/v1")
      (1 until segs).foreach { k =>
        val files = graft.streaming.MmrServeStream
          .dataFiles(spark, s"$root/raw$k")
        graft.streaming.MmrServeStream.reindexDelta(
          spark, files, cb, s"$root/v${k + 1}", segments)
        segments = segments :+ s"$root/v${k + 1}"
      }
      val buildSec = (System.nanoTime() - tB) / 1e9
      val vDir = s"$root/v$segs"
      val in = s"$root/queries"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      def addQueries(name: String): Unit = {
        val tmp = java.nio.file.Paths.get(root, s"stage-$name")
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .filter($"vec_id" < 4).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(in, s"$name.parquet"))
        ()
      }
      val stream = graft.Tables.loadStream(
        spark, in, "embeddings", s"$sfDir/embeddings.parquet")
      val q = graft.streaming.MmrServeStream.serveIndexedRefreshed(
        stream, vDir, cb, s"$root/ckpt", root, nprobe = 2)
      try {
        val t0 = System.nanoTime()
        addQueries("q0")
        q.processAllAvailable()
        val first = (System.nanoTime() - t0) / 1e9
        val steady = (1 to 5).map { i =>
          val t = System.nanoTime()
          addQueries(s"q$i")
          q.processAllAvailable()
          (System.nanoTime() - t) / 1e9
        }
        if (!warm)
          println(f"""{"probe":"segment_sweep","segments":$segs,"n":$total,"index_build_sec":$buildSec%.2f,"first_cycle_sec":$first%.2f,"steady_cycle_min_sec":${steady.min}%.2f,"steady_cycle_med_sec":${steady.sorted.apply(2)}%.2f}""")
      } finally q.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      ()
    }
  }
}
