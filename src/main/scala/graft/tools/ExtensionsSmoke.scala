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
    // bloom_might_contain from SQL text: build a tiny sketch, pass it
    // as a binary literal — present key true, absent key can be false
    val bf = org.apache.spark.util.sketch.BloomFilter.create(16, 0.01)
    bf.putString("present")
    val hex = org.apache.spark.sql.graftexpr.BloomFunctions.toBytes(bf)
      .map("%02X".format(_)).mkString
    val Array(hit, miss) = spark.sql(
      s"SELECT bloom_might_contain('present', X'$hex'), " +
        s"bloom_might_contain('absent-key', X'$hex')")
      .head().toSeq.map(_.asInstanceOf[Boolean]).toArray
    assert(hit, "sketch must contain the inserted key (no false negatives)")
    assert(!miss, "16-key sketch at 1% fpp should reject the probe key")
    println(s"[extensions-smoke] OK dot_product=$v bloom hit=$hit miss=$miss")
    spark.stop()
  }
}
