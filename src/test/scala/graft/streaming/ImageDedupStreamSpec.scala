package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for ingest-time image near-dup: docs arriving across
  * two micro-batches must flag EXACTLY the corpus canonicals a driver
  * replay finds within hamming ≤ 2 of their phash (self-canonical
  * excluded) — and the fixture's repeated images guarantee real
  * matches. */
class ImageDedupStreamSpec extends SparkSuite {

  test("streamed image matches equal a driver hamming replay across two batches") {
    import spark.implicits._
    val sig = graft.multimodal.Multimodal.phashFrame(
      spark, graft.Tables.load(spark, sf0001, "documents"))
      .select("doc_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byHash = sig.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val nDocs = sig.length
    val streamed = sig.filter(_._1 >= nDocs / 2)
    val expected = streamed.flatMap { case (doc, ph) =>
      byHash.toSeq.collect {
        case (iph, dmin) if java.lang.Long.bitCount(ph ^ iph) <= 2 && dmin != doc =>
          (doc, dmin, java.lang.Long.bitCount(ph ^ iph))
      }
    }.toSet
    assert(expected.nonEmpty, "fixture should plant image near-dups")
    assert(expected.exists(_._3 == 0), "repeated images should match at hamming 0")

    val in = java.nio.file.Files.createTempDirectory("graft-imgstream")
    val scratch = java.nio.file.Files.createTempDirectory("graft-imgscratch")
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = scratch.resolve(name)
      spark.read.parquet(s"$sf0001/documents.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "documents", s"$sf0001/documents.parquet")
      val q = ImageDedupStream.flagArrivals(stream, sf0001)
        .writeStream.format("memory").queryName("img_out")
        .outputMode("append").start()
      try {
        addFile(col("doc_id") >= nDocs / 2 && col("doc_id") < 3 * nDocs / 4, "b1")
        q.processAllAvailable()
        addFile(col("doc_id") >= 3 * nDocs / 4, "b2")
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("img_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected,
        s"stream ${got.size} matches != replay ${expected.size}")
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }
}
