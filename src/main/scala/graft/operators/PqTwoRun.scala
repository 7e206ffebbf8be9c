package graft.operators

import org.apache.spark.sql.SparkSession

/** two timed end-to-end runs of vector_ann_ivfpq in one JVM, with the
  * VectorScaleProbe inter-run cleanup — isolates whether the slow
  * first run is JVM warmup (run 2 fast) or per-run work (run 2 slow). */
object PqTwoRun {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-pq2"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      VectorSearch.annIvfPq.run(spark, dir).collect()
      println(f"[pq2] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
