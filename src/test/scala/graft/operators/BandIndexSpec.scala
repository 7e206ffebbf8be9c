package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Executable proof of the claim SCALING.md makes for every
  * incremental near-dup op: "production persists the history band
  * table once, bucketed by (b, bh), so a daily run sketches ONLY the
  * batch and equi-joins against the stored index". This spec actually
  * persists the index bucketed on the band key, joins a fresh batch's
  * bands against it, and pins the plan: the INDEX side is a bucketed
  * scan with no exchange — the only hash shuffle in the candidate join
  * is the small fresh side being routed to the index's bucket layout.
  * At 100 TB that is the whole point: the ~16·|history| band rows are
  * never re-shuffled, only the day's ~16·|batch| rows move.
  *
  * The cascade then verifies candidates exactly and must reproduce
  * [[Dedup.incrementalMinhash]]'s pair set bit-for-bit — same
  * semantics, index-backed plan.
  */
class BandIndexSpec extends SparkSuite {

  test("persisted (b,bh)-bucketed band index: index side joins shuffle-free, pairs identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bandindex").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = graft.Tables.load(spark, sf0001, "documents")
      val bk = substring(md5($"doc_id".cast("string")), 1, 1)
      val hist = docs.filter(bk < "8")
      val fresh = docs.filter(bk >= "8")

      // once-per-corpus-version: persist history's bands bucketed by the
      // band key (the layout every later refresh/ingest joins against)
      Dedup.minhashBandRows(spark, hist.select($"doc_id", $"text"))
        .select($"doc_id".as("hist_id"), $"b", $"bh")
        .write.bucketBy(8, "b", "bh").sortBy("b", "bh")
        .option("path", s"$dir/bands").saveAsTable("graft_band_index")

      // daily run: sketch ONLY the fresh batch, join against the index
      val fb = Dedup.minhashBandRows(spark, fresh.select($"doc_id", $"text"))
        .select($"doc_id".as("fresh_id"), $"b", $"bh")
      val cand = spark.table("graft_band_index")
        .join(fb, Seq("b", "bh"))
        .select($"hist_id", $"fresh_id").distinct()

      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"index side must be a bucketed scan:\n${plan.take(1500)}")
      // join-side shuffles: the fresh side's routing into the bucket
      // layout is the ONLY one; the index side must contribute none.
      // (The distinct() above re-keys to (hist_id, fresh_id) — count
      // only exchanges keyed on the band join key.)
      val bandExchanges = "Exchange hashpartitioning\\(b#".r.findAllIn(plan).length
      assert(bandExchanges == 1,
        s"expected exactly ONE band-key exchange (the fresh side); got $bandExchanges:\n$plan")

      // the index-backed cascade reproduces the self-contained op exactly
      val candDocs = cand
        .select(explode(array($"hist_id", $"fresh_id")).as("doc_id")).distinct()
      val sh = docs.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select($"doc_id", TextFns.shingleSet($"text").as("sh"))
        .localCheckpoint()
      val got = cand
        .join(sh.select($"doc_id".as("hist_id"), $"sh".as("sh1")), "hist_id")
        .join(sh.select($"doc_id".as("fresh_id"), $"sh".as("sh2")), "fresh_id")
        .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
        .withColumn("n1", size($"sh1")).withColumn("n2", size($"sh2"))
        .filter($"inter" * 3 >= $"n1" + $"n2")
        .select($"hist_id", $"fresh_id", $"inter".cast("long"),
          ($"n1" + $"n2" - $"inter").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = Dedup.incrementalMinhash.run(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(got.nonEmpty, "fixture must contain cross-split near-dups")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_band_index")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
