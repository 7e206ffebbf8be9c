package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures streaming ANN serve throughput: N query vectors staged as
  * parquet files (8 micro-batches), drained through
  * `VectorServeStream.serve` against the sf corpus, reporting
  * queries/s end to end (decode → probe → cell join → top-k).
  * Usage: sbt "runMain graft.tools.ServeProbe [sfDir] [nQueries]"
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nQ = if (args.length > 1) args(1).toInt else 4000
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-serveprobe"), 32)
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-serveprobe")
    val in = root.resolve("in"); java.nio.file.Files.createDirectory(in)
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val total = emb.count()
    // recycle corpus vectors as queries, content-addressed slice
    val queries = emb.filter($"vec_id" % (total / nQ max 1) === 0)
    val nStaged = queries.count()
    (0 until 8).foreach { i =>
      val tmp = root.resolve(s"scratch-$i")
      queries.filter($"vec_id" % 8 === i).coalesce(1).write.parquet(tmp.toString)
      tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.copy(f.toPath, in.resolve(s"b$i.parquet"))
      }
    }
    val stream = spark.readStream.schema(emb.schema).parquet(in.toString)
    val t0 = System.nanoTime()
    val q = graft.streaming.VectorServeStream.serve(stream, sfDir)
      .writeStream.format("memory").queryName("serve_probe")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val served = spark.table("serve_probe").count()
    println(f"[serveprobe] corpus=$total%d queries=$nStaged%d hits=$served%d " +
      f"elapsed=$sec%.1f s qps=${nStaged / sec}%.0f")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(root.toFile)
    spark.stop()
  }
}
