package graft.tools

/** State-partition sweep for the live near-dup gate
  * ([[graft.streaming.StreamBench.benchNearDup]]) — prices the one
  * dial the operator exposes, the (band, band-hash) keyed-exchange
  * width, the same protocol as `MmrServeSweep`. One JSON line per
  * setting; SCALING.md records the table.
  *
  * Usage: `runMain graft.tools.NearDupSweep [partitions...]`
  * (default 4 8 16 32), sf dir from SPARK_GRAFT_SF_DIR
  * (default sf0.1).
  */
object NearDupSweep {
  def main(args: Array[String]): Unit = {
    val parts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 8, 16, 32)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    try parts.foreach { p =>
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-ndsweep-$p").toFile.getAbsolutePath
      try {
        val r = graft.streaming.StreamBench.benchNearDup(
          spark, sfDir, scratch, statePartitions = p)
        println(f"""{"probe":"neardup_sweep","state_partitions":$p,"docs_per_sec":${r.rowsPerSec}%.0f,"flagged":${r.appliedRows},"batch_ms_p50":${r.batchMsP50},"batch_ms_max":${r.batchMsMax},"elapsed_sec":${r.elapsedSec}%.3f}""")
      } finally {
        scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
        ()
      }
    } finally spark.stop()
  }
}
