package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decontamination scale probe: the benchmark gram set is FIXED (real
  * eval sets don't grow with the corpus) while the train corpus fans
  * out N× — the claim under test is that probe cost is one linear scan
  * of the train side against a constant-size broadcast, i.e. seconds
  * grow ~N while the broadcast side and per-row cost stay flat.
  *
  * Fan-out re-ids each copy (doc_id + k·maxId) so the content-addressed
  * split re-buckets it, and runs the operator's OWN stages
  * ([[graft.operators.Dedup.contaminationShingles]] /
  * [[graft.operators.Dedup.contaminationProbe]]), not a copy.
  *
  * Usage: runMain graft.tools.ContaminationScaleProbe [sfDir] [mult...]
  */
object ContaminationScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 40)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-contamprobe"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val bench = graft.operators.Dedup.contaminationShingles(docs)
      .filter($"bucket" >= "f0").select($"g").distinct()
      .localCheckpoint()
    val nBench = bench.count()
    val maxId = docs.agg(max($"doc_id")).first().getLong(0) + 1

    mults.foreach { mult =>
      // persist(), not localCheckpoint(): Dataset.unpersist only frees
      // CacheManager entries, so checkpoint blocks would accumulate
      // across multipliers (~51× the corpus held at once on a 1/10/40
      // sweep) while persist+unpersist actually releases each corpus
      val fanned = (0 until mult)
        .map(k => docs.select(($"doc_id" + k * maxId).as("doc_id"), $"text"))
        .reduce(_ union _)
        .repartition(32)
        .persist()
      val nDocs = fanned.count()
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val flagged = graft.operators.Dedup.contaminationProbe(
          graft.operators.Dedup.contaminationShingles(fanned)
            .filter($"bucket" < "f0"),
          bench).count()
        ((System.nanoTime() - t0) / 1e9, flagged)
      }
      val (s1, flagged) = once()
      val (s2, _) = once()
      val sec = math.min(s1, s2)
      println(f"[contamprobe] mult=$mult docs=$nDocs bench_grams=$nBench " +
        f"flagged=$flagged sec=$sec%.2f us_per_doc=${sec * 1e6 / nDocs}%.1f")
      fanned.unpersist(blocking = true)
    }
    spark.stop()
  }
}
