package graft.tools

import org.apache.spark.sql.SparkSession

/** Knob sweep for the streaming bench: shuffle/state partition count,
  * state store provider, and admission rate — to find where the
  * per-micro-batch overhead (state commit latency vs task work) sits
  * on this box. Usage:
  *   runMain graft.tools.StreamProbe <sfDir> [partitions] [mfpt] [provider]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1).toInt else 32
    val mfpt = if (args.length > 2) args(2).toInt else 8
    val provider = if (args.length > 3) args(3) else "hdfs"
    val b = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-streamprobe"), 32)
    val withStore =
      if (provider == "rocksdb")
        b.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else b
    val spark = withStore.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scratch = java.nio.file.Files.createTempDirectory("graft-sprobe")
      .toFile.getAbsolutePath
    try {
      val (r, ops) = graft.streaming.StreamBench.bench(
        spark, sfDir, scratch, maxFilesPerTrigger = mfpt, statePartitions = parts)
      println(f"[streamprobe] parts=$parts mfpt=$mfpt provider=$provider " +
        f"rows_s=${r.rowsPerSec}%.0f input=${r.inputRows} ops=$ops applied=${r.appliedRows} " +
        f"batches=${r.batches} p50=${r.batchMsP50}ms max=${r.batchMsMax}ms " +
        f"elapsed=${r.elapsedSec}%.1f s")
    } finally {
      scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
      spark.stop()
    }
  }
}
