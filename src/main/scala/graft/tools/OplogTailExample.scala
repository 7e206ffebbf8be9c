package graft.tools

import org.apache.spark.sql.SparkSession

/** O13: the standalone synchronous-tail example — the engine analog of
  * the reference's 5-line driver loop
  * (`reference:src/main/java/org/flinkmon/main/SimpleOplogTailExample.java:44-54`):
  * open a tailable cursor on the oplog, print each op as it arrives.
  *
  * Usage:
  *   runMain graft.tools.OplogTailExample <oplogRoot> <topology> [checkpointDir]
  * e.g. topology "s0/r1:27018,r2:27019,r3:27020". Ctrl-C to stop; with a
  * checkpointDir the next run resumes from the last consumed file.
  */
object OplogTailExample {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OplogTailExample <oplogRoot> <topology> [checkpointDir]")
    val Array(root, topology) = args.take(2)
    val spark = graft.GraftSession.local(4)
    val q = graft.streaming.OplogPipeline.connectorSource(spark, root, topology)
      .writeStream.format("console").outputMode("append")
      .option("truncate", "false")
      .option("checkpointLocation",
        args.lift(2).getOrElse(java.nio.file.Files.createTempDirectory("tail-ckpt").toString))
      .start()
    q.awaitTermination()
  }
}
