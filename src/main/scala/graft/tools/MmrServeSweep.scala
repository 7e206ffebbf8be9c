package graft.tools

import org.apache.spark.sql.SparkSession

/** SCALING.md sweep for the serve-path bench (round-11 verdict item 6):
  * [[graft.streaming.StreamBench.benchServe]] — the retrieve→MMR chain
  * under a paced query stream — across the two dials that matter at
  * scale: `statePartitions` (the serve shuffle: stream-static join +
  * per-query group exchange — the CDC meter's state-store lesson
  * applies here too) and `nprobe` (the recall/cost dial: candidates
  * scanned per query grow with nprobe/C of the static side).
  * Usage: sbt "runMain graft.tools.MmrServeSweep [sfDir]"
  */
object MmrServeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-mmrsweep"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((parts, nprobe) <- Seq((4, 2), (8, 2), (16, 2), (8, 4), (8, 8))) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val scratch = java.nio.file.Files.createTempDirectory("graft-mmrsweep")
        .toFile.getAbsolutePath
      val r = graft.streaming.StreamBench.benchServe(
        spark, sfDir, scratch, statePartitions = parts, nprobe = nprobe)
      println(f"[mmrsweep] parts=$parts%2d nprobe=$nprobe%d " +
        f"qps=${r.rowsPerSec}%.0f queries=${r.inputRows} batches=${r.batches} " +
        f"p50=${r.batchMsP50}ms max=${r.batchMsMax}ms elapsed=${r.elapsedSec}%.1f s")
      scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
    }
    spark.stop()
  }
}
