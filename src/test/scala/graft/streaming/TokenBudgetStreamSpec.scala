package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the token-budget admission gate: the streaming
  * form (`TokenBudgetStream.admit` — broadcast histogram/cut static
  * side + one-Long-per-group stateful admission) must reproduce the
  * oracled batch selection (`corpus_token_budget`) exactly — same
  * admitted set, same bit-identical `cum_tokens` positions — when
  * arrival order respects per-group doc_id order, driven across TWO
  * micro-batches so cross-batch state continuation is exercised (the
  * boundary group's residual must carry over, not reset). */
class TokenBudgetStreamSpec extends SparkSuite {

  test("streaming budget admission over two micro-batches equals the batch selection") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val base = graft.operators.Pipeline.budgetBase(spark, sf0001).localCheckpoint()
    val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, 2000L)
    val histB = hist.localCheckpoint()
    val cutsB = cuts.localCheckpoint()

    def tuples(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("lang")),
        r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("rank_key")),
        r.getLong(r.fieldIndex("cum_tokens")))).toSet
    val expected = tuples(
      graft.operators.Catalog.all.find(_.name == "corpus_token_budget").get
        .run(spark, sf0001).collect())
    assert(expected.nonEmpty)
    // the fixture must straddle the batch split below, or the
    // cross-batch state continuation this spec exists for is untested
    val splitId = 250L
    assert(expected.exists(_._1 < splitId) && expected.exists(_._1 >= splitId),
      "fixture: admissions should land in both micro-batches")

    val in = java.nio.file.Files.createTempDirectory("graft-budgetstream")
    val scratch = java.nio.file.Files.createTempDirectory("graft-budgetscratch")
    // the file source lists only the top-level dir: write each batch's
    // single part file aside, then drop it into `in` as one new file
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = scratch.resolve(name)
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val stream = spark.readStream.schema(docs.schema).parquet(in.toString)
      val q = TokenBudgetStream.admit(stream, histB, cutsB)
        .writeStream.format("memory").queryName("budget_out")
        .outputMode("append").start()
      try {
        // batch 1: low doc_ids, batch 2: the rest — per-(lang, rank_key)
        // arrival order respects doc_id order, the documented premise
        addFile(docs.filter($"doc_id" < splitId), "b1")
        q.processAllAvailable()
        val afterB1 = spark.table("budget_out").count()
        assert(afterB1 > 0, "first micro-batch admitted nothing")
        addFile(docs.filter($"doc_id" >= splitId), "b2")
        q.processAllAvailable()
        assert(spark.table("budget_out").count() > afterB1,
          "second micro-batch admitted nothing")
      } finally q.stop()
      val got = tuples(spark.table("budget_out").collect())
      assert(got == expected,
        s"stream/batch divergence: missing=${expected -- got} extra=${got -- expected}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(in.toFile); rm(scratch.toFile)
    }
  }
}
