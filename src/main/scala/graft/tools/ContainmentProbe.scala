package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost probe for dedup_containment on the ScaleProbe
  * synthetic corpus: enlarged-prefix rows, index postings, raw join
  * volume, count-filtered candidate pairs, and verify time — the
  * numbers that decide whether candidate volume or array-shipping
  * dominates on a hub-heavy (closed-vocab) corpus.
  *
  * Usage: runMain graft.tools.ContainmentProbe <mult> <workDir>
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val mult = args(0).toInt
    val dir = args(1)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-containprobe"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (!new java.io.File(s"$dir/documents.parquet").exists())
      ScaleProbe.generate(spark, mult, dir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[containprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val k = 3
    val sh = graft.Tables.load(spark, dir, "documents")
      .repartition($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, tx) =>
        graft.operators.Dedup.shingleHashes(tx).map(a => (id, a))
      })
      .toDF("doc_id", "sh")
      .filter(size($"sh") >= 10)
      .localCheckpoint()
    println(s"[containprobe] docs=${sh.count()}")

    val pos = time("cms positioned")(graft.operators.Dedup.cmsPositioned(spark, sh))
    println(s"[containprobe] index_rows=${pos.count()}")
    val pre = pos.filter(($"n" + k - $"pos") * 5 >= $"n" * 4)
    println(s"[containprobe] prefix_rows=${pre.count()}")

    val raw = pre.as("a")
      .join(pos.as("b"), $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id"
        && $"b.n" * 5 >= $"a.n" * 4)
      .select($"a.doc_id".as("d_in"), $"b.doc_id".as("d_out"))
    val nRaw = time("raw candidate join")(raw.count())
    println(s"[containprobe] raw_cand_rows=$nRaw")

    val cand = time("count filter") {
      raw.groupBy($"d_in", $"d_out").agg(count(lit(1)).as("m"))
        .filter($"m" >= k).select($"d_in", $"d_out").localCheckpoint()
    }
    println(s"[containprobe] count_filtered_pairs=${cand.count()}")

    val s1 = sh.select($"doc_id".as("d_in"), $"sh".as("sh1"))
    val s2 = sh.select($"doc_id".as("d_out"), $"sh".as("sh2"))
    val out = time("array verify") {
      cand.join(s1, "d_in").join(s2, "d_out")
        .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
        .withColumn("n1", size($"sh1"))
        .filter($"inter" * 5 >= $"n1" * 4)
        .count()
    }
    println(s"[containprobe] out_rows=$out")
    spark.stop()
  }
}
