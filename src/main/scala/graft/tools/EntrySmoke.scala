package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** driver-contract smoke: SparkEntry.entry must return rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0)
    spark.stop()
  }
}
