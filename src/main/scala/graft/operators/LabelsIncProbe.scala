package graft.operators
import org.apache.spark.sql.{SparkSession, functions => F}

/** Stage profiler for the incremental label refresh — where do its
  * warm seconds go (fresh banding vs candidate join vs verify vs
  * CC/final joins)? Run after any change to the refresh path. */
object LabelsIncProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("labelsinc-probe"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    t("artifacts (first build)") { Dedup.v1LabelArtifacts(spark, dir) }
    t("full refresh warm1") { Dedup.labelsIncremental.run(spark, dir).count() }
    t("full refresh warm2") { Dedup.labelsIncremental.run(spark, dir).count() }
    spark.stop()
  }
}
