package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Benchmark decontamination over a document STREAM: the benchmark
  * shingle set is a static (batch) frame — fixed eval data — and the
  * arriving corpus probes it through a stream-static broadcast join,
  * exactly the production shape: the 100 TB side flows, the eval set
  * sits broadcast on every executor. The shingling stage is stateless
  * and the hit count is a streaming aggregation (plain `count`; the
  * operator's shingles are per-doc distinct before the explode), so
  * the complete-mode output must equal the batch operator row-for-row.
  */
class ContaminationStreamSpec extends SparkSuite {

  test("stream-static contamination probe matches the batch operator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-contamstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    try {
      val docs = graft.Tables.load(spark, sf0001, "documents")
      // static side: benchmark grams derived once, in batch
      val bench = graft.operators.Dedup.contaminationShingles(docs)
        .filter($"bucket" >= "f0").select($"g").distinct()

      val schema = docs.schema
      val stream = spark.readStream.schema(schema).parquet(dir.toString)
      val probed = graft.operators.Dedup.contaminationProbe(
        graft.operators.Dedup.contaminationShingles(stream)
          .filter($"bucket" < "f0"),
        bench)
      val q = probed.writeStream.format("memory").queryName("contam_out")
        .outputMode("complete").start()
      try q.processAllAvailable()
      finally q.stop()

      val got = spark.table("contam_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = graft.operators.Dedup.contamination.run(spark, sf0001).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"stream=$got batch=$want")
      assert(got.nonEmpty)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
