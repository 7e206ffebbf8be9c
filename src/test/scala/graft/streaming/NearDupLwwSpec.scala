package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** The UPDATE-AWARE gate ([[NearDupStream.registerLww]] →
  * [[NearDupStream.applyLww]], two stateful queries joined by the
  * chain's exactly-once epoch handoff):
  *
  *  1. the planted update-then-near-copy timeline — a near-copy of a
  *     SUPERSEDED text is NOT flagged (the old version's band claims
  *     retired), a near-copy of the CURRENT text still is; a stale
  *     replay of the old version is dropped whole; versions
  *     co-arriving in one trigger collapse LWW (only the newest
  *     claims);
  *  2. unit parity — on a NO-update corpus (the real sf0.001
  *     documents, ver ≡ 1, two-wave arrival) the two-kernel
  *     composition's verdicts equal [[NearDupStream.flag]]'s
  *     row-for-row, so the LWW form costs nothing semantically when
  *     nothing updates.
  */
class NearDupLwwSpec extends SparkSuite {

  private val SrcDdl = "doc_id LONG, ver LONG, lang STRING, text STRING"

  /** 40 distinct tokens with prefix `p`; near-copies swap one middle
    * token (j ≈ 0.92 on 3-gram shingles — the planted-pair band). */
  private def toks(p: String): String =
    (0 until 40).map(i => s"$p$i").mkString(" ")
  private def nearCopy(p: String, marker: String): String =
    (0 until 40).map(i => if (i == 20) marker else s"$p$i").mkString(" ")

  /** one registry + one bucket query over a file-fed source dir, kept
    * running across waves — the chain's exact two-query wiring in
    * miniature. */
  private final class Gate(root: java.nio.file.Path) {
    import spark.implicits._
    java.nio.file.Files.createDirectory(root.resolve("in"))
    new java.io.File(s"$root/dedup/bands/batch=0").mkdirs()
    val out = new java.util.concurrent.ConcurrentLinkedQueue[NearDupStream.NearDupBandP]()
    private val reg = NearDupStream.registerLww(
        spark.readStream.schema(StructType.fromDDL(SrcDdl))
          .parquet(root.resolve("in").toString))
      .writeStream.outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt-reg").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupStream.BandMsg], id: Long) =>
        OplogPipeline.writeIndexBatch(b.toDF(), s"$root/dedup", id, "bands")
        ()
      }
      .start()
    private val bandLineSchema = StructType(Seq(StructField("data",
      StructType.fromDDL(NearDupStream.BandMsgDdl))))
    private val buckets = NearDupStream.applyLww(
        spark.readStream.schema(bandLineSchema)
          .json(s"$root/dedup/bands/batch=*").select("data.*"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt-buk").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[NearDupStream.NearDupBandP], _: Long) =>
          b.collect().foreach(out.add)
          ()
      }
      .start()
    private var n = 0
    def wave(rows: Seq[(Long, Long, String, String)]): Unit = {
      n += 1
      val tmp = root.resolve(s"scr-$n")
      rows.toDF("doc_id", "ver", "lang", "text")
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, root.resolve(s"in/w$n.parquet"))
      reg.processAllAvailable()
      buckets.processAllAvailable()
      ()
    }
    def rows: Seq[NearDupStream.NearDupBandP] = {
      import scala.jdk.CollectionConverters._
      out.asScala.toSeq
    }
    /** per-doc verdict over everything emitted so far: canonical of
      * the doc's LAST generation (updates re-adjudicate — band rows of
      * the newest forwarding win; within one generation the fold is
      * [[NearDupStream.fold]]'s min-over-matched-claimants). */
    def verdict(doc: Long): Option[Long] =
      rows.filter(_.doc_id == doc).flatMap(_.dup_of).sorted.headOption
    def stop(): Unit = { buckets.stop(); reg.stop() }
  }

  test("update retires the old version's claims: planted timeline") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndlww")
    val g = new Gate(root)
    try {
      // w1: doc 1 claims textA's buckets; doc 2 claims textC's (the
      // pre-update witness family — SEPARATE from A, so the witness
      // copy never claims any textA bucket itself and w4's
      // adjudication sees only doc 1's retired claims)
      g.wave(Seq((1L, 1L, "en", toks("a")), (2L, 1L, "en", toks("c"))))
      assert(g.verdict(1L).isEmpty && g.verdict(2L).isEmpty)

      // w2: a near-copy against a LIVE claim flags — the gate's
      // ordinary behavior, unchanged by the LWW machinery
      g.wave(Seq((9L, 1L, "en", nearCopy("c", "qq"))))
      assert(g.verdict(9L).contains(2L),
        "near-copy of a live claim must flag")

      // w3: doc 1 UPDATES to textB — v1's claims retire, v2 claims fresh
      g.wave(Seq((1L, 2L, "en", toks("b"))))
      assert(g.rows.count(_.doc_id == 1L) == 32,
        "the update must re-adjudicate (16 more band rows)")
      assert(g.verdict(1L).isEmpty, "the new text is novel — no flag")

      // w4: THE case — a near-copy of the SUPERSEDED text is NOT
      // flagged (stale claims gone), a near-copy of the CURRENT text is
      g.wave(Seq(
        (11L, 1L, "en", nearCopy("a", "zz")),
        (12L, 1L, "en", nearCopy("b", "zz"))))
      assert(g.verdict(11L).isEmpty,
        "near-copy of a superseded version was flagged — stale claims resident")
      assert(g.verdict(12L).contains(1L),
        "near-copy of the current text must still flag")

      // w5: stale replay of v1 is dropped whole — no new band rows
      val before = g.rows.size
      g.wave(Seq((1L, 1L, "en", toks("a"))))
      assert(g.rows.size == before, "a stale replay re-entered the buckets")

      // carry discipline: payload rides band 0 only; doc 1's carriers
      // round-trip both versions' texts
      assert(g.rows.filter(_.b != 0).forall(_.payload.isEmpty))
      val carried = g.rows.filter(r => r.doc_id == 1L && r.b == 0)
        .flatMap(_.payload)
      assert(carried.size == 2)
      val texts = carried.map(p =>
        com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
          .readTree(p).get("text").asText()).toSet
      assert(texts == Set(toks("a"), toks("b")))
    } finally {
      g.stop()
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("no-update corpus: LWW gate verdicts equal flag's (unit parity)") {
    import spark.implicits._
    val corpus = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), lit(1L).as("ver"), col("lang"), col("text"))
      .localCheckpoint()
    val ids = corpus.select($"doc_id").as[Long].collect().sorted
    val split = ids(ids.length / 2)
    def rowsOf(pred: org.apache.spark.sql.Column) = corpus.filter(pred)
      .select($"doc_id", $"ver", $"lang", $"text")
      .as[(Long, Long, String, String)].collect().toSeq

    // the LWW composition, two waves
    val root = java.nio.file.Files.createTempDirectory("graft-ndlww-par")
    val g = new Gate(root)
    val lww =
      try {
        g.wave(rowsOf($"doc_id" < split))
        g.wave(rowsOf($"doc_id" >= split))
        g.rows
      } finally {
        g.stop()
        new scala.reflect.io.Directory(root.toFile).deleteRecursively()
      }

    // plain flag over the same two-wave arrival
    val root2 = java.nio.file.Files.createTempDirectory("graft-ndlww-plain")
    val plain =
      try {
        java.nio.file.Files.createDirectory(root2.resolve("in"))
        val out = new java.util.concurrent.ConcurrentLinkedQueue[NearDupBand]()
        def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
          val tmp = root2.resolve(s"scr-$name")
          corpus.filter(pred).coalesce(1).write.parquet(tmp.toString)
          val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.copy(part.toPath, root2.resolve(s"in/$name.parquet"))
          ()
        }
        val q = NearDupStream.flag(
            spark.readStream.schema(StructType.fromDDL(SrcDdl))
              .parquet(root2.resolve("in").toString)
              .select($"doc_id", $"text"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", root2.resolve("ckpt").toString)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupBand], _: Long) =>
            b.collect().foreach(out.add)
            ()
          }
          .start()
        try {
          addFile($"doc_id" < split, "w1")
          q.processAllAvailable()
          addFile($"doc_id" >= split, "w2")
          q.processAllAvailable()
        } finally q.stop()
        import scala.jdk.CollectionConverters._
        out.asScala.toSeq
      } finally {
        new scala.reflect.io.Directory(root2.toFile).deleteRecursively()
      }

    def v(rs: Seq[(Long, Int, Option[Long], Int)]) = rs.toSet
    val lwwV = v(lww.map(r => (r.doc_id, r.b, r.dup_of, r.sim64)))
    val plainV = v(plain.map(r => (r.doc_id, r.b, r.dup_of, r.sim64)))
    assert(lwwV == plainV,
      s"LWW gate diverged on a no-update corpus: missing=${(plainV -- lwwV).take(5)} " +
        s"extra=${(lwwV -- plainV).take(5)}")
  }
}
