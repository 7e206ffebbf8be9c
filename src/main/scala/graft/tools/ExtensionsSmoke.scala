package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end proof of the `spark.sql.extensions=graft.GraftExtensions`
  * packaging: a fresh session created with ONLY the conf (no register()
  * call) can use `dot_product` from SQL text. Must run in its own JVM
  * (extensions apply at session creation). */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[2]").appName("graft-ext-smoke"), 2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val v = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v == 11.0, s"dot_product via extensions returned $v")
    println(s"[extensions-smoke] OK dot_product=$v")
    spark.stop()
  }
}
