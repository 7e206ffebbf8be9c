package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-ingest dedup over a document STREAM — the production
  * shape of `dedup_incremental_bloom`: history is a static frame whose
  * fingerprints were tree-reduced into one Bloom filter before the
  * stream starts; arriving documents split inside the stateless filter
  * stage (bloom-reject ⇒ provably new, bypasses the join; bloom-accept
  * ⇒ stream-static LEFT ANTI join removes the false positives). Only
  * the per-fingerprint admission count is stateful. Complete-mode
  * output must equal the batch operator row-for-row — same corpus,
  * same split, same sketch.
  */
class IncrementalDedupStreamSpec extends SparkSuite {

  test("streamed ingest through the bloom prefilter matches the batch operator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-incstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    try {
      val docs = graft.Tables.load(spark, sf0001, "documents")
      def fingerprints(df: DataFrame): DataFrame =
        df.select($"doc_id", md5($"text").as("content_md5"),
          substring(md5($"doc_id".cast("string")), 1, 1).as("b"))
      // static side: historical fingerprint set + its Bloom sketch,
      // both built in batch before the stream starts
      val hist = fingerprints(docs).filter($"b" < "8")
        .select($"content_md5").distinct()
      val bloom = graft.operators.Dedup.bloomOf(
        spark, hist, expected = 1L << 16, fpp = 0.01)

      val stream = spark.readStream.schema(docs.schema).parquet(dir.toString)
      val fresh = fingerprints(stream).filter($"b" >= "8").drop("b")
      val mightBeDup = org.apache.spark.sql.graftexpr.BloomFunctions
        .bloom_might_contain($"content_md5", bloom)
      val admitted = fresh.filter(!mightBeDup)
        .unionByName(
          fresh.filter(mightBeDup).join(hist, Seq("content_md5"), "left_anti"))
        .groupBy($"content_md5")
        .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_batch_copies"))

      val q = admitted.writeStream.format("memory").queryName("inc_out")
        .outputMode("complete").start()
      try q.processAllAvailable()
      finally q.stop()

      val got = spark.table("inc_out").collect()
        .map(r => (r.getLong(1), r.getString(0), r.getLong(2))).toSet
      val want = graft.operators.Dedup.incremental.run(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(got.nonEmpty)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
