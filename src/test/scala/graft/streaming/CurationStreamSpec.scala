package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** The LLM-curation operators compose with Structured Streaming: a
  * document stream flows through the text-analysis projections
  * (tokens, quality ratio, content fingerprint — all stateless) into a
  * stateful exact content dedup (`dropDuplicates` on the fingerprint),
  * and the surviving set equals the batch computation on the same
  * corpus. This is the streaming form of the ingest-side curation
  * pipeline: at scale the same query runs with a watermark +
  * `dropDuplicatesWithinWatermark` (covered in StreamingWindowSpec) so
  * dedup state is bounded by the lateness horizon instead of corpus
  * size.
  */
class CurationStreamSpec extends SparkSuite {

  test("streaming doc curation (quality + fingerprint + content dedup) matches batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-docstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    try {
      val schema = graft.Tables.load(spark, sf0001, "documents").schema
      def curate(df: org.apache.spark.sql.DataFrame) = {
        val toks = TextFns.tokens($"text")
        df.select($"doc_id", TextFns.fingerprint($"text").as("fp"),
            size(toks).as("n_tokens"),
            (size(array_distinct(toks)) / size(toks)).as("diversity"))
          .filter($"n_tokens" > 0)
          .dropDuplicates("fp")
      }
      val q = curate(spark.readStream.schema(schema).parquet(dir.toString))
        .writeStream.format("memory").queryName("curation_out")
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()

      val got = spark.table("curation_out").collect()
        .map(r => (r.getString(1), r.getInt(2), r.getDouble(3)))
      val batch = curate(graft.Tables.load(spark, sf0001, "documents")).collect()
        .map(r => (r.getString(1), r.getInt(2), r.getDouble(3)))
      assert(got.length == batch.length, "streaming dedup kept a different survivor count")
      assert(got.map(_._1).toSet == batch.map(_._1).toSet, "fingerprint sets differ")
      // the fingerprint is token-SET-addressed, so same-fp docs can have
      // different (n_tokens, diversity) and dropDuplicates keeps an
      // arbitrary survivor — assert each survivor's stats belong to SOME
      // corpus doc with that fingerprint, not survivor equality
      val validTriples = graft.Tables.load(spark, sf0001, "documents")
        .select($"doc_id", TextFns.fingerprint($"text").as("fp"),
          size(TextFns.tokens($"text")).as("n_tokens"),
          (size(array_distinct(TextFns.tokens($"text"))) / size(TextFns.tokens($"text"))).as("diversity"))
        .filter($"n_tokens" > 0)
        .collect().map(r => (r.getString(1), r.getInt(2), r.getDouble(3))).toSet
      got.foreach(t => assert(validTriples.contains(t),
        s"survivor stats $t match no corpus document"))
    } finally {
      dir.toFile.listFiles.foreach(_.delete()); dir.toFile.delete()
    }
  }
}
