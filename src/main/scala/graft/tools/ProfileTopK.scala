package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** time vector_topk and dedup_minhash_lsh in isolation with full logs. */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    time("warmup cdc_offsets")(graft.SparkEntry.queries("cdc_offsets")(spark, sfDir).count())
    time("vector_topk run1")(graft.SparkEntry.queries("vector_topk")(spark, sfDir).count())
    time("vector_topk run2")(graft.SparkEntry.queries("vector_topk")(spark, sfDir).count())
    time("dedup_minhash run1")(graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count())
    time("dedup_minhash run2")(graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count())
    spark.stop()
  }
}
