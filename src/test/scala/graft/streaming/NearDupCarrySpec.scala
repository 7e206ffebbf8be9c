package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The carry-payload gate forms ([[NearDupStream.flagCarry]] /
  * `flagExpiringCarry`) against the non-carry kernels at UNIT level
  * (the chain specs pin them end to end): over the real corpus driven
  * as the same two-batch stream,
  *
  *  1. verdicts are IDENTICAL — the carried payload never enters the
  *     kernel, so every (doc_id, b, dup_of, sim64) matches `flag`'s
  *     exactly;
  *  2. the payload rides ONLY the band-0 row (15 of 16 band rows per
  *     doc carry null — the exchange pays the payload once per doc);
  *  3. the band-0 payload round-trips: `from_json` over the carried
  *     string reproduces every input row bit-for-bit, so the survivor
  *     publish needs no store access.
  */
class NearDupCarrySpec extends SparkSuite {

  test("flagCarry: verdicts equal flag's; payload rides band 0 and round-trips") {
    import spark.implicits._
    val corpus = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft-ndcarry")
    try {
      java.nio.file.Files.createDirectory(root.resolve("in"))
      val ids = corpus.select($"doc_id").as[Long].collect().sorted
      val split = ids(ids.length / 2)
      def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
        val tmp = root.resolve(s"scr-$name")
        corpus.filter(pred).coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath, root.resolve(s"in/$name.parquet"))
        ()
      }
      // drive BOTH forms over the same two-batch arrival (separate
      // checkpoints/state; same input files in the same order)
      def drive(form: String): Seq[NearDupStream.NearDupBandP] = {
        val out = new java.util.concurrent.ConcurrentLinkedQueue[NearDupStream.NearDupBandP]()
        val src = spark.readStream.schema(corpus.schema)
          .parquet(root.resolve("in").toString)
        val ds =
          if (form == "carry") NearDupStream.flagCarry(src)
          else NearDupStream.flag(src.select($"doc_id", $"text"))
            .map(r => NearDupStream.NearDupBandP(r.doc_id, r.b, r.dup_of, r.sim64, None))(
              org.apache.spark.sql.Encoders.product[NearDupStream.NearDupBandP])
        val q = ds.writeStream
          .option("checkpointLocation", root.resolve(s"ckpt-$form").toString)
          .outputMode("append")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[NearDupStream.NearDupBandP], _: Long) =>
              b.collect().foreach(out.add)
              ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        import scala.jdk.CollectionConverters._
        out.asScala.toSeq
      }
      addFile(col("doc_id") < split, "w1")
      val plain1 = drive("plain")
      val carry1 = drive("carry")
      addFile(col("doc_id") >= split, "w2")
      val plain = plain1 ++ drive("plain").filterNot(plain1.contains)
      val carry = carry1 ++ drive("carry").filterNot(carry1.contains)

      // 1. identical verdicts
      def verdicts(rs: Seq[NearDupStream.NearDupBandP]) =
        rs.map(r => (r.doc_id, r.b, r.dup_of, r.sim64)).toSet
      assert(verdicts(carry) == verdicts(plain),
        s"carry verdicts diverged: missing=${(verdicts(plain) -- verdicts(carry)).take(5)} " +
          s"extra=${(verdicts(carry) -- verdicts(plain)).take(5)}")

      // 2. payload on band 0 only, exactly once per doc
      assert(carry.filter(_.b != 0).forall(_.payload.isEmpty),
        "a non-band-0 row carried a payload")
      val carriers = carry.filter(_.b == 0)
      assert(carriers.nonEmpty && carriers.forall(_.payload.nonEmpty),
        "a band-0 row lost its payload")

      // 3. round-trip: from_json over the carried strings reproduces
      // the input rows bit-for-bit
      val rebuilt = carriers.map(_.payload.get).toDF("payload")
        .select(from_json($"payload",
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id LONG, source STRING, lang STRING, text STRING")).as("d"))
        .select($"d.*")
      val want = corpus
      assert(rebuilt.exceptAll(want).isEmpty && want.exceptAll(rebuilt).isEmpty,
        "carried payload did not round-trip to the input rows")
    } finally {
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }
}
