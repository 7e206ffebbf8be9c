package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** isolated timings for the non-headline heavy queries. */
object ProfileMisc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_simhash", "dedup_embedding", "vector_ann_lsh", "dedup_ngram_jaccard")
    names.foreach { n =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[prof] $n: ${(System.nanoTime() - t0) / 1e9}%.2fs ($rows rows)")
    }
    spark.stop()
  }
}
