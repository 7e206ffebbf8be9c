package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures prefix-filter candidate volume for dedup_ngram_jaccard
  * under the two rarity rankings (exact global df vs the broadcast
  * count-min sketch) — the number that decides which ranking the
  * operator should default to at a given corpus shape.
  *
  * Usage: runMain graft.tools.JaccardProbe <sfDir> [cmsWidth]
  * (cmsWidth must be a power of two — CountMin masks with width-1
  * and rejects anything else)
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val width = if (args.length > 1) args(1).toInt else 65536
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-jaccardprobe"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t = 0.5
    val sh = graft.Tables.load(spark, sfDir, "documents")
      .repartition($"doc_id")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, tx) =>
        graft.operators.Dedup.shingleHashes(tx).map(a => (id, a))
      })
      .toDF("doc_id", "sh")
      .localCheckpoint()

    def candCount(ranked: org.apache.spark.sql.DataFrame): Long =
      ranked.as("a")
        .join(ranked.as("b"), $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id"
          && $"a.n" <= $"b.n" * 2 && $"b.n" <= $"a.n" * 2)
        .select($"a.doc_id", $"b.doc_id").distinct().count()

    // exact global df ranking
    val ex = sh.select($"doc_id", explode($"sh").as("h"), size($"sh").as("n"))
    val freq = ex.groupBy($"h").agg(count(lit(1)).as("f"))
    val exactRanked = ex.join(freq, "h")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"f", $"h")))
      .filter($"rk" <= $"n" - ceil(lit(t) * $"n") + 1)
      .select($"doc_id", $"h", $"n").localCheckpoint()
    val nExact = candCount(exactRanked)

    // CMS ranking — THE operator's own stage (Dedup.cmsPrefixRanked),
    // not a copy, so these numbers always describe the shipped code path
    val tR = System.nanoTime()
    // cmsPrefixRanked ends in an EAGER localCheckpoint, so returning
    // IS materialization — no extra count() inside the timed region
    val cmsRanked = graft.operators.Dedup.cmsPrefixRanked(spark, sh, t, width = width)
    println(f"[jaccardprobe] cms_build_rank_s=${(System.nanoTime() - tR) / 1e9}%.2f")
    val tC = System.nanoTime()
    val nCms = candCount(cmsRanked)
    println(f"[jaccardprobe] cms_cand_s=${(System.nanoTime() - tC) / 1e9}%.2f")

    val nDocs = sh.count()
    println(s"[jaccardprobe] sf=$sfDir docs=$nDocs cmsWidth=$width " +
      s"cand_exact=$nExact cand_cms=$nCms ratio=${nCms.toDouble / math.max(1, nExact)}")
    spark.stop()
  }
}
