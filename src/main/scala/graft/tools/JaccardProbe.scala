package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures prefix-filter candidate volume for dedup_ngram_jaccard
  * under the two rarity rankings (exact global df vs the broadcast
  * count-min sketch) — the number that decides which ranking the
  * operator should default to at a given corpus shape.
  *
  * Usage: runMain graft.tools.JaccardProbe <sfDir> [cmsWidth]
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

    // CMS ranking
    val tS = System.nanoTime()
    val sketch = sh.select($"sh").as[Seq[Long]].rdd
      .mapPartitions { it =>
        val c = new graft.operators.Dedup.CountMin(4, width)
        it.foreach(_.foreach(c.add))
        Iterator.single(c)
      }
      .fold(new graft.operators.Dedup.CountMin(4, width))(_.mergeInPlace(_))
    println(f"[jaccardprobe] sketch_build_s=${(System.nanoTime() - tS) / 1e9}%.2f")
    val bc = spark.sparkContext.broadcast(sketch)
    val tR = System.nanoTime()
    val cmsRanked = sh.select($"doc_id", $"sh").as[(Long, Seq[Long])]
      .mapPartitions { it =>
        val c = bc.value
        it.flatMap { case (doc, set) =>
          val n = set.size
          val keep = n - math.ceil(t * n).toInt + 1
          if (keep <= 0) Iterator.empty
          else set.map(h => (c.estimate(h), h)).sorted.iterator
            .take(keep).map { case (_, h) => (doc, h, n) }
        }
      }
      .toDF("doc_id", "h", "n").localCheckpoint()
    println(f"[jaccardprobe] cms_rank_s=${(System.nanoTime() - tR) / 1e9}%.2f")
    val tC = System.nanoTime()
    val nCms = candCount(cmsRanked)
    println(f"[jaccardprobe] cms_cand_s=${(System.nanoTime() - tC) / 1e9}%.2f")

    val nDocs = sh.count()
    println(s"[jaccardprobe] sf=$sfDir docs=$nDocs cmsWidth=$width " +
      s"cand_exact=$nExact cand_cms=$nCms ratio=${nCms.toDouble / math.max(1, nExact)}")
    spark.stop()
  }
}
