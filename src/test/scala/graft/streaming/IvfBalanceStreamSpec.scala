package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The live IVF cell-balance monitor: streamed per-cell populations
  * must equal the batch `vector_cell_profile` exactly once the corpus
  * has drained, and a skewed ingest burst must raise `breached`
  * MID-INGEST — at the burst's own micro-batch, not at an end-of-load
  * profile. */
class IvfBalanceStreamSpec extends SparkSuite {

  private def stage(df: org.apache.spark.sql.DataFrame,
      in: java.nio.file.Path, scratch: java.nio.file.Path, name: String): Unit = {
    val tmp = scratch.resolve(name)
    df.coalesce(1).write.parquet(tmp.toString)
    val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
  }

  test("drained monitor equals the batch cell profile; a skewed burst breaches at its own batch") {
    import spark.implicits._
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding")
    val expected = graft.operators.VectorSearch.cellProfile.run(spark, sf0001)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val in = java.nio.file.Files.createTempDirectory("graft-ivfbal-in")
    val scratch = java.nio.file.Files.createTempDirectory("graft-ivfbal-scr")
    try {
      // two content-addressed halves of the corpus, then the hot burst
      val h = substring(md5($"vec_id".cast("string")), 1, 1)
      stage(emb.filter(h < "8"), in, scratch, "b0")
      val src = spark.readStream.schema(emb.schema).parquet(in.toString)
      val q = IvfBalanceStream.monitor(src, sf0001)
        .writeStream.format("memory").queryName("ivfbal_out")
        .outputMode("update").start()
      def rows() = spark.table("ivfbal_out")
        .as[CellLoad].collect()
      try {
        q.processAllAvailable()
        stage(emb.filter(h >= "8"), in, scratch, "b1")
        q.processAllAvailable()
        // corpus fully drained: the latest version IS the batch profile
        // (same codebook, bit-identical assignment scores)
        val vMax = rows().map(_.version).max
        val got = rows().filter(_.version == vMax)
          .map(r => r.cell -> ((r.n, r.share_ppm, r.load_factor_pct))).toMap
        assert(got == expected,
          s"diff=${expected.collect { case (c, v) if got.get(c).exists(_ != v) => (c, v, got.get(c)) }.take(3)}")
        assert(rows().forall(!_.breached),
          "the fixture is balanced (max load 134) — nothing may breach yet")
        // burst: 200 copies of codebook vector 0 crowd its cell
        val v0 = emb.filter($"vec_id" === 0L).collect()(0).getSeq[Float](1)
        stage(spark.range(10000, 10200)
          .select($"id".as("vec_id"), typedLit(v0).as("embedding")),
          in, scratch, "b2")
        q.processAllAvailable()
        val v3 = rows().map(_.version).max
        assert(v3 > vMax, "burst batch must emit a new version")
        val breachRows = rows().filter(r => r.version == v3 && r.breached)
        assert(breachRows.map(_.cell).toSeq == Seq(0),
          s"exactly the crowded cell must breach: ${breachRows.toSeq}")
        assert(breachRows.head.n >= 200L, breachRows.head.toString)
      } finally q.stop()
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }

  test("cell counters survive a restart and keep accumulating") {
    import spark.implicits._
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-ivfbal-resume")
    java.nio.file.Files.createDirectory(root.resolve("in"))
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[CellLoad]()
    def start() = {
      val src = spark.readStream.schema(emb.schema)
        .parquet(root.resolve("in").toString)
      IvfBalanceStream.monitor(src, sf0001)
        .writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[CellLoad], _: Long) =>
          b.collect().foreach(emitted.add); ()
        }
        .start()
    }
    try {
      val h = substring(md5($"vec_id".cast("string")), 1, 1)
      stage(emb.filter(h < "8"), root.resolve("in"), root, "b0")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      stage(emb.filter(h >= "8"), root.resolve("in"), root, "b1")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      import scala.jdk.CollectionConverters._
      val all = emitted.asScala.toArray
      // version continuity proves the counters were RESTORED, not reset
      assert(all.map(_.version).max == 2L, all.map(_.version).distinct.toSeq.toString)
      val finalCounts = all.filter(_.version == 2L).map(r => r.cell -> r.n).toMap
      val expected = graft.operators.VectorSearch.cellProfile.run(spark, sf0001)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(finalCounts == expected,
        s"restored accumulation must equal the batch profile: $finalCounts")
    } finally {
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
      ()
    }
  }
}
