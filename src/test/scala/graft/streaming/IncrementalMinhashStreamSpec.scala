package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Incremental NEAR-dup over a document STREAM — the production shape
  * of `dedup_incremental_minhash`: history's band index is a static
  * frame built once in batch; arriving documents are sketched and
  * banded by the same stateless kernel and stream-static equi-joined
  * against the index. The candidate-pair stage is the incremental
  * part (the only stage that touches history); the exact-Jaccard
  * verify then runs per micro-batch on the tiny candidate set.
  *
  * Asserts (a) the streamed candidate set contains every pair the
  * batch operator emits (banding sees the same collisions regardless
  * of arrival batching), and (b) exact verification of the streamed
  * candidates reproduces the batch operator's pair set exactly.
  */
class IncrementalMinhashStreamSpec extends SparkSuite {

  test("streamed banding against the static history index reproduces the batch pairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mhstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    try {
      val docsB = graft.Tables.load(spark, sf0001, "documents")
      val bk = substring(md5($"doc_id".cast("string")), 1, 1)
      // static side, built before the stream starts: history band index
      val hist = graft.operators.Dedup
        .minhashBandRows(spark, docsB.filter(bk < "8").select($"doc_id", $"text"))
        .select($"doc_id".as("hist_id"), $"b", $"bh")
        .localCheckpoint()

      val stream = spark.readStream.schema(docsB.schema).parquet(dir.toString)
      val freshBands = graft.operators.Dedup
        .minhashBandRows(spark, stream.filter(bk >= "8").select($"doc_id", $"text"))
        .select($"doc_id".as("fresh_id"), $"b", $"bh")
      // stream-static inner equi-join (stateless append); the complete-mode
      // count dedups band-collision multiplicity into one row per pair
      val cand = freshBands.join(hist, Seq("b", "bh"))
        .groupBy($"hist_id", $"fresh_id")
        .agg(count(lit(1)).as("n_bands"))
      val q = cand.writeStream.format("memory").queryName("mh_cand")
        .outputMode("complete").start()
      try q.processAllAvailable()
      finally q.stop()
      val gotCand = spark.table("mh_cand").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotCand.nonEmpty)

      // exact verify of the streamed candidates, pure Scala
      def shingleSet(text: String): Set[String] = {
        val toks = text.split(' ').filter(_.nonEmpty)
        toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
      val texts = docsB.select($"doc_id", $"text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val verified = gotCand.filter { case (h, f) =>
        val (s1, s2) = (shingleSet(texts(h)), shingleSet(texts(f)))
        val inter = (s1 & s2).size
        3 * inter >= s1.size + s2.size
      }

      val want = graft.operators.Dedup.incrementalMinhash.run(spark, sf0001)
        .select($"hist_id", $"fresh_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.subsetOf(gotCand),
        s"batch pairs missing from streamed candidates: ${(want -- gotCand).take(3)}")
      assert(verified == want,
        s"missing=${(want -- verified).take(3)} extra=${(verified -- want).take(3)}")
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
