package graft.tools
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-benchone"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCHONE_RUNS", "2").toInt
    args.drop(1).foreach { name =>
      val ts = (1 to runs).map { i =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val t = (System.nanoTime()-t0)/1e9
        println(f"[benchone] $name run$i $t%.2f s")
        t
      }
      val warm = ts.drop(1).sorted
      // true median: average the two middle elements for even sizes
      // (indexing size/2 alone reported the upper-middle — round-19
      // ADVICE: biased for SPARK_GRAFT_BENCHONE_RUNS-driven even counts)
      val median =
        if (warm.isEmpty) 0.0
        else if (warm.size % 2 == 1) warm(warm.size / 2)
        else (warm(warm.size / 2 - 1) + warm(warm.size / 2)) / 2.0
      if (warm.nonEmpty) println(f"[benchone] $name warm_median=$median%.3f warm_min=${warm.min}%.3f")
    }
    spark.stop()
  }
}
