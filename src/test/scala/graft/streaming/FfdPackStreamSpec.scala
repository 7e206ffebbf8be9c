package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the online first-fit packing admission
  * (`FfdPackStream.pack`): when per-language arrival order equals the
  * batch fold order (in-cap docs by tokens desc then doc_id), the
  * emitted assignment table is row-identical to the oracled
  * `pack_ffd_layout` — including across a kill/restart, because the
  * open-bin remainders live in the state store. Plus the oversized
  * dedicated-run path, absent from the fixtures (max 99 tokens). */
class FfdPackStreamSpec extends SparkSuite {

  private def tuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(r.fieldIndex("doc_id")),
      r.getString(r.fieldIndex("lang")),
      r.getLong(r.fieldIndex("n_tokens")),
      r.getLong(r.fieldIndex("bin_first")),
      r.getLong(r.fieldIndex("bin_last")))).toSet

  private def expectedLayout = tuples(
    graft.operators.Catalog.all.find(_.name == "pack_ffd_layout").get
      .run(spark, sf0001).collect())

  test("streaming FFD over two micro-batches equals the batch layout") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val expected = expectedLayout
    assert(expected.nonEmpty)
    val in = java.nio.file.Files.createTempDirectory("graft-ffdstream")
    val scratch = java.nio.file.Files.createTempDirectory("graft-ffdscratch")
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = scratch.resolve(name)
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
      ()
    }
    // the split is strict on n_tokens, so per-lang arrival order across
    // batches respects the fold's (tokens desc, doc_id) order; equal
    // sizes never straddle the boundary
    val nTok = size(graft.functions.TextFns.tokens($"text"))
    try {
      val stream = spark.readStream.schema(docs.schema).parquet(in.toString)
      val q = FfdPackStream.pack(stream)
        .writeStream.format("memory").queryName("ffd_out")
        .outputMode("append").start()
      try {
        addFile(docs.filter(nTok > 40), "b1")
        q.processAllAvailable()
        val afterB1 = spark.table("ffd_out").count()
        assert(afterB1 > 0, "first micro-batch assigned nothing")
        addFile(docs.filter(nTok <= 40), "b2")
        q.processAllAvailable()
        assert(spark.table("ffd_out").count() > afterB1,
          "second micro-batch assigned nothing")
      } finally q.stop()
      val got = tuples(spark.table("ffd_out").collect())
      assert(got == expected,
        s"stream/batch divergence: missing=${expected -- got} extra=${got -- expected}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(in.toFile); rm(scratch.toFile)
    }
  }

  test("open-bin remainders survive a restart: post-restart docs fill pre-restart bins") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val expected = expectedLayout
    val root = java.nio.file.Files.createTempDirectory("graft-ffdresume")
    java.nio.file.Files.createDirectory(root.resolve("in"))
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = root.resolve(s"scr-$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, root.resolve(s"in/$name.parquet"))
      ()
    }
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[FfdAssign]()
    def start() = {
      val src = spark.readStream.schema(docs.schema)
        .parquet(root.resolve("in").toString)
      FfdPackStream.pack(src)
        .writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FfdAssign], _: Long) =>
          b.collect().foreach(emitted.add); ()
        }
        .start()
    }
    val nTok = size(graft.functions.TextFns.tokens($"text"))
    try {
      addFile(docs.filter(nTok > 40), "b1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      import scala.jdk.CollectionConverters._
      val phase1Bins = emitted.asScala.map(_.bin_first).toSet
      assert(phase1Bins.nonEmpty)
      addFile(docs.filter(nTok <= 40), "b2")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val all = emitted.asScala.toArray
      // the restart proof: small post-restart docs landed in bins
      // OPENED BEFORE the restart (state carried the remainders over)
      val p1Max = all.filter(_.n_tokens > 40).map(_.bin_first).max
      assert(all.exists(a => a.n_tokens <= 40 && a.bin_first <= p1Max),
        "no post-restart doc reused a pre-restart open bin")
      val got = all.map(a =>
        (a.doc_id, a.lang, a.n_tokens, a.bin_first, a.bin_last)).toSet
      assert(got == expected,
        s"restart divergence: missing=${expected -- got} extra=${got -- expected}")
    } finally {
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
      ()
    }
  }

  test("oversized docs claim dedicated runs; later smalls still first-fit open bins") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def doc(id: Long, n: Int): (Long, String, String) =
      (id, "xx", Seq.fill(n)("w").mkString(" "))
    val input = MemoryStream[(Long, String, String)]
    val q = FfdPackStream.pack(input.toDF().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName("ffd_big_out")
      .outputMode("append").start()
    def byId = spark.table("ffd_big_out").as[FfdAssign].collect()
      .map(a => a.doc_id -> a).toMap
    try {
      // fold order in one trigger: smalls desc (500, 200, 12) then the
      // 1300-token doc as a 3-bin dedicated run
      input.addData(doc(1, 500), doc(2, 200), doc(3, 1300), doc(4, 12))
      q.processAllAvailable()
      assert(byId(1L).bin_first == 0 && byId(1L).bin_last == 0)
      assert(byId(2L).bin_first == 1 && byId(2L).bin_last == 1)
      // 12 fits bin 0's remainder (512-500) exactly
      assert(byId(4L).bin_first == 0 && byId(4L).bin_last == 0)
      // the big doc: bins 2..4, severed by necessity, never reused
      assert(byId(3L).bin_first == 2 && byId(3L).bin_last == 4)
      // next trigger, folded desc: 300 first-fits bin 1 (312 left),
      // then 100 exceeds every remainder (bin 1 is down to 12) and
      // opens the next dense index PAST the dedicated run
      input.addData(doc(5, 300), doc(6, 100))
      q.processAllAvailable()
      assert(byId(5L).bin_first == 1, s"300 first-fits bin 1: ${byId(5L)}")
      assert(byId(6L).bin_first == 5,
        s"100 exceeds every remainder (bin1 has 12 left) -> fresh bin 5: ${byId(6L)}")
    } finally q.stop()
  }
}
