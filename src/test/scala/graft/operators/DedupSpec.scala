package graft.operators

import graft.SparkSuite

/** Extension-op dedup family: the probabilistic variants must agree
  * with the exact ground truth on the planted near-dups. */
class DedupSpec extends SparkSuite {

  private def pairs(name: String): Set[(Long, Long)] =
    Catalog.all.find(_.name == name).get
      .run(spark, sf0001)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH (verified) equals exact ngram-jaccard pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash finds the planted high-jaccard pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val sim = pairs("dedup_simhash")
    // simhash (hamming<=3) is a different similarity; require it to
    // recover most of the j>=0.9 planted pairs and stay plausible in size
    val recall = exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.6, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("exact dedup canonicalizes by content hash") {
    val df = Dedup.exact.run(spark, sf0001)
    val total = df.selectExpr("sum(n_copies)").head().getLong(0)
    val docs = graft.Tables.load(spark, sf0001, "documents").count()
    assert(total == docs)                       // partition of the corpus
    assert(df.count() <= docs)
  }

  test("embedding cosine near-dup pairs are symmetric-free and thresholded") {
    val df = Dedup.embeddingCosine.run(spark, sf0001)
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.45))
  }
}
