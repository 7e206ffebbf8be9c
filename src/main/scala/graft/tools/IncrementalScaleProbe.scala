package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-ingest dedup scale probe: the DAILY BATCH is fixed (an
  * ingest day doesn't grow because the archive did) while the
  * historical fingerprint set fans out N× — the claim under test is
  * that the exact form pays for history EVERY run (its full
  * fingerprint set is exchanged into the anti join, so cost grows ~N)
  * while the Bloom form's join-side input stays flat: history is
  * scanned once into a sketch whose size grows ~N but stays
  * task-broadcastable, and only the batch's might-contain slice —
  * true dups + the fpp tail, both independent of N — reaches the join.
  *
  * Fan-out derives N distinct fingerprint generations from the same
  * text (`md5(concat(text, k))`), so the history set genuinely grows;
  * the probe drives the operator's OWN admission cores
  * ([[graft.operators.Dedup.admitNew]] /
  * [[graft.operators.Dedup.admitNewBloom]]), not a copy.
  *
  * Usage: runMain graft.tools.IncrementalScaleProbe [sfDir] [mult...]
  */
object IncrementalScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 5, 20)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-incprobe"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    // fixed daily batch: generation-0 fingerprints, ~half the docs dup
    // against history (bucket < '8' of gen-0 is IN history below)
    val fresh = docs
      .select($"doc_id", md5($"text").as("content_md5"))
      .localCheckpoint()
    val nFresh = fresh.count()

    mults.foreach { mult =>
      // history = the even-doc_id half of the batch's own fingerprints
      // (real cross-batch dups, so the candidate path carries rows)
      // plus mult-1 generations of distinct archive mass — the part
      // the exact form must re-shuffle every run and the sketch absorbs
      val histBase = docs.filter($"doc_id" % 2 === 0)
        .select(md5($"text").as("content_md5"))
      val hist = (histBase +: (1 until mult)
        .map(k => docs.select(md5(concat($"text", lit(k.toString))).as("content_md5"))))
        .reduce(_ union _)
        .repartition(32)
        .persist()
      val nHist = hist.count()

      def timed[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime()
        val a = f
        ((System.nanoTime() - t0) / 1e9, a)
      }
      def best2(f: => Long): (Double, Long) = {
        val (s1, v) = timed(f); val (s2, _) = timed(f); (math.min(s1, s2), v)
      }

      val (secExact, admittedE) =
        best2(graft.operators.Dedup.admitNew(fresh, hist).count())
      val (secSketch, bloom) = timed(
        graft.operators.Dedup.bloomOf(spark, hist, expected = nHist, fpp = 0.01))
      val (secBloom, admittedB) =
        best2(graft.operators.Dedup.admitNewBloom(fresh, hist, bloom).count())
      val candRows = fresh.filter(
        org.apache.spark.sql.graftexpr.BloomFunctions
          .bloom_might_contain($"content_md5", bloom)).count()
      require(admittedE == admittedB,
        s"forms disagree: exact=$admittedE bloom=$admittedB")

      println(f"[incprobe] mult=$mult hist=$nHist batch=$nFresh " +
        f"admitted=$admittedE join_rows_exact=$nHist join_rows_bloom=$candRows " +
        f"bloom_kb=${bloom.length / 1024} sec_exact=$secExact%.2f " +
        f"sec_sketch=$secSketch%.2f sec_bloom=$secBloom%.2f")
      hist.unpersist()
    }
    spark.stop()
  }
}
