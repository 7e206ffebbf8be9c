package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession

/** scratch driver: exercise the DSv2 oplog connector through its public
  * format string (batch + filter pushdown), printing what a user sees. */
object DriveConnector {
  def main(args: Array[String]): Unit = {
    val Array(root, topology) = args
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.format("graft.sources.OplogSourceProvider")
      .option("topology", topology).load(root)
      .filter(col("op") =!= "n" && col("fromMigrate").isNull)
    println(s"partitions=${df.rdd.getNumPartitions}")
    df.show(truncate = false)
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("pushed=")).mkString("\n"))
    spark.stop()
  }
}
