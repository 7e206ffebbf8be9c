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
    * miniature. `ttl` swaps the registry for its TTL'd form
    * ([[NearDupStream.registerExpiringLww]] — the ONE ager); the bucket
    * query is [[NearDupStream.applyLww]] either way. `bucketsDeferred`
    * leaves the bucket consumer UNSTARTED so registry epochs pile up —
    * [[startBuckets]] then opens it against the backlog, forcing the
    * catch-up shape where ONE bucket trigger bundles many epochs. */
  private final class Gate(root: java.nio.file.Path, ttl: Option[Long] = None,
      tag: String = "w", delay: String = "10 seconds",
      bucketsDeferred: Boolean = false) {
    import spark.implicits._
    java.nio.file.Files.createDirectories(root.resolve("in"))
    new java.io.File(s"$root/dedup/bands/batch=0").mkdirs()
    val out = new java.util.concurrent.ConcurrentLinkedQueue[NearDupStream.NearDupBandP]()
    private val reg = (ttl match {
      case Some(t) => NearDupStream.registerExpiringLww(
        spark.readStream.schema(StructType.fromDDL(SrcDdl + ", ets TIMESTAMP"))
          .parquet(root.resolve("in").toString), t, delay = delay)
      case None => NearDupStream.registerLww(
        spark.readStream.schema(StructType.fromDDL(SrcDdl))
          .parquet(root.resolve("in").toString))
    })
      .writeStream.outputMode("append")
      .option("checkpointLocation", root.resolve("ckpt-reg").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupStream.RegMsg], id: Long) =>
        OplogPipeline.writeIndexBatch(
          b.toDF().withColumn("epoch", lit(id)), s"$root/dedup", id, "bands")
        ()
      }
      .start()
    private val bandLineSchema = StructType(Seq(StructField("data",
      StructType.fromDDL(NearDupStream.RegMsgDdl))))
    private def startBucketsQuery() = NearDupStream.applyLww(
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
    private var buckets: Option[org.apache.spark.sql.streaming.StreamingQuery] =
      if (bucketsDeferred) None else Some(startBucketsQuery())
    /** open the deferred bucket consumer against the accumulated epoch
      * backlog and drain it — the first trigger bundles everything. */
    def startBuckets(): Unit = {
      val q = startBucketsQuery()
      buckets = Some(q)
      q.processAllAvailable()
    }
    private var n = 0
    /** `etsSec` is the wave's event time for the TTL'd form (offset
      * +86400 s off epoch — the initial watermark IS the epoch and
      * rows at/below it vanish, AttributionWatermarkSpec's pin);
      * ignored when `ttl` is None. */
    def wave(rows: Seq[(Long, Long, String, String)], etsSec: Long = 0L): Unit = {
      n += 1
      val tmp = root.resolve(s"scr-$tag-$n")
      val df0 = rows.toDF("doc_id", "ver", "lang", "text")
      val df = if (ttl.isDefined)
        df0.withColumn("ets", timestamp_seconds(lit(etsSec + 86400L)))
      else df0
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, root.resolve(s"in/$tag$n.parquet"))
      reg.processAllAvailable()
      buckets.foreach(_.processAllAvailable())
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
    def stop(): Unit = { buckets.foreach(_.stop()); reg.stop() }
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

  /** the composed form costs nothing semantically while nothing
    * expires: the full update timeline (claims, update-retirement,
    * stale replay, both adjudications) through the TTL'd registry with
    * a never-firing horizon must emit EXACTLY registerLww's rows. */
  test("TTL'd LWW registry ≡ registerLww within the horizon") {
    def drive(ttl: Option[Long], tag: String): Set[(Long, Int, Option[Long], Int, Option[String])] = {
      val root = java.nio.file.Files.createTempDirectory(s"graft-ndlww-$tag")
      val g = new Gate(root, ttl)
      try {
        g.wave(Seq((1L, 1L, "en", toks("a")), (2L, 1L, "en", toks("c"))), etsSec = 0L)
        g.wave(Seq((9L, 1L, "en", nearCopy("c", "qq"))), etsSec = 10L)
        g.wave(Seq((1L, 2L, "en", toks("b"))), etsSec = 20L)
        g.wave(Seq(
          (11L, 1L, "en", nearCopy("a", "zz")),
          (12L, 1L, "en", nearCopy("b", "zz"))), etsSec = 30L)
        g.wave(Seq((1L, 1L, "en", toks("a"))), etsSec = 40L)   // stale replay
        g.rows.map(r => (r.doc_id, r.b, r.dup_of, r.sim64, r.payload)).toSet
      } finally {
        g.stop()
        new scala.reflect.io.Directory(root.toFile).deleteRecursively()
      }
    }
    val bounded = drive(Some(10L * 365 * 86400 * 1000L), "ttl")
    val unbounded = drive(None, "nottl")
    assert(bounded == unbounded,
      s"TTL'd registry diverged inside the horizon: " +
        s"missing=${(unbounded -- bounded).take(5)} extra=${(bounded -- unbounded).take(5)}")
  }

  /** the recall horizon is PER-DOC and measured on arrivals of the doc
    * itself: an idle doc's timeout retires its claims everywhere (even
    * out of buckets other traffic touched — the contrast with
    * [[NearDupStream.flagExpiring]]'s per-bucket granularity), a stale
    * REPLAY re-arms its doc's clock without claiming anything, and a
    * post-expiry near-copy is ADMITTED and gates again. ttl = 600 s of
    * event time; watermark clock driven by pusher docs (timeouts fire
    * in the batch after the watermark advances — event-time TTL
    * discipline, same as the flagExpiring spec). */
  test("idle doc's claims retire at the horizon; stale replays extend life") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndlww-exp")
    val g = new Gate(root, ttl = Some(600000L))
    try {
      // w1 t=0: doc 1 claims textA, doc 2 claims textC
      g.wave(Seq((1L, 1L, "en", toks("a")), (2L, 1L, "en", toks("c"))), etsSec = 0L)
      // w2 t=10: in-horizon near-copy flags — the gate's ordinary verdict
      g.wave(Seq((3L, 1L, "en", nearCopy("a", "qq"))), etsSec = 10L)
      assert(g.verdict(3L).contains(1L), "in-horizon near-copy must flag")
      // w3 t=1900: doc 2 STALE-replays (ver unchanged — re-arms its
      // idle clock, claims nothing, emits nothing). doc 1 stays idle
      // since t=0; so does doc 3 — deliberately NOT replayed, because
      // a flagged doc still CLAIMS its distinctive bands (the ones its
      // marker shingles shifted off the original's hashes), so keeping
      // doc 3 alive would legitimately keep those claims adjudicating
      // later near-copies of the same family. The per-doc horizon is
      // measured per CLAIMANT, flagged or not.
      val before = g.rows.size
      g.wave(Seq((2L, 1L, "en", toks("c"))), etsSec = 1900L)
      assert(g.rows.size == before, "a stale replay re-entered the buckets")
      // w4 t=2000: pusher advances the watermark past doc 1's and
      // doc 3's deadlines (600, 610 < 1890) — their timeouts fire IN
      // this batch, the retires ride this epoch, the bucket strips
      // every textA-family claim. doc 2's deadline moved to 2500 by
      // the replay.
      g.wave(Seq((50L, 1L, "en", toks("d"))), etsSec = 2000L)
      // w5 t=2010: THE case — a near-copy of the EXPIRED doc 1 is
      // ADMITTED (claims fresh), a near-copy of the replay-extended
      // doc 2 still FLAGS (stale replays extend life), and the pusher
      // (well within horizon) still gates
      g.wave(Seq(
        (6L, 1L, "en", nearCopy("a", "yy")),
        (9L, 1L, "en", nearCopy("c", "pp")),
        (7L, 1L, "en", nearCopy("d", "kk"))), etsSec = 2010L)
      assert(g.verdict(6L).isEmpty,
        "near-copy of an expired doc was flagged — claims outlived the horizon")
      assert(g.verdict(9L).contains(2L),
        "stale replay must extend its doc's idle clock (doc 2 expired early)")
      assert(g.verdict(7L).contains(50L), "in-horizon pusher claim must gate")
      // w6 t=2020: the post-expiry re-claimer gates
      g.wave(Seq((8L, 1L, "en", nearCopy("a", "ww"))), etsSec = 2020L)
      assert(g.verdict(8L).contains(6L), "post-expiry re-claim did not gate")
    } finally {
      g.stop()
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  /** THE catch-up case (round-17 ADVICE): the bucket consumer opens
    * against a BACKLOG, so its first trigger bundles every registry
    * epoch. The kernel must replay them in stamped-epoch order —
    * claim order follows ARRIVAL order across the bundle (not doc_id),
    * and an update bundled with its own previous version must not
    * flag against the not-yet-retired v1 claim. */
  test("catch-up bundling: epochs replay in order inside one bucket trigger") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndlww-cup")
    val g = new Gate(root, bucketsDeferred = true)
    try {
      // four registry epochs land with NO bucket consumer running
      g.wave(Seq((5L, 1L, "en", toks("e"))))             // epoch: doc 5 claims textE
      g.wave(Seq((3L, 1L, "en", nearCopy("e", "qq"))))   // later arrival, SMALLER doc_id
      g.wave(Seq((1L, 1L, "en", toks("a"))))             // doc 1 v1
      g.wave(Seq((1L, 2L, "en", nearCopy("a", "vv"))))   // v2 = near-copy of its OWN v1
      g.startBuckets()                                   // ONE trigger, four epochs
      // arrival order wins across the bundle: doc 5 claimed first, the
      // later (smaller-id) near-copy flags against it — a flat
      // doc_id-sorted fold would invert the claim
      assert(g.verdict(5L).isEmpty, "first arrival must keep its claim")
      assert(g.verdict(3L).contains(5L),
        "bundled epochs adjudicated out of arrival order")
      // the bundled update re-adjudicates (32 band rows) and must NOT
      // flag against its own superseded v1 — the retire in v2's epoch
      // applies before v2's arrival, after v1's epoch already folded
      assert(g.rows.count(_.doc_id == 1L) == 32,
        "both generations of doc 1 must emit")
      assert(g.verdict(1L).isEmpty,
        "an update flagged against its own superseded version's claim")
    } finally {
      g.stop()
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  /** round-17 ADVICE: a pre-upgrade handoff directory (per-band rows,
    * or epochs without the publish-time epoch stamp) parses under the
    * current [[NearDupStream.RegMsgDdl]] with null arrays/epoch; the
    * generator would silently emit zero rows for it — the gate must
    * fail FAST instead of dropping every message. */
  test("pre-upgrade handoff format fails fast instead of silently dropping") {
    import spark.implicits._
    val oldFormatLine =
      """{"data":{"doc_id":1,"ver":1,"b":0,"bh":123,"retire":false,"mh":[1,2],"payload":null}}"""
    val parsed = spark.read
      .schema(StructType(Seq(StructField("data",
        StructType.fromDDL(NearDupStream.RegMsgDdl)))))
      .json(Seq(oldFormatLine).toDS()).select("data.*")
    val e = intercept[Exception] { NearDupStream.applyLww(parsed).count() }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("handoff"))),
      s"expected the loud format-mismatch error, got: $e")
  }

  /** round-17 ADVICE: an out-of-order STALE replay carrying an event
    * time OLDER than the doc's stored last arrival (legal up to the
    * full watermark delay — hours under the chain's curationDelay)
    * must not REWIND the idle deadline: the clock re-arms forward
    * only, off the stored max. */
  test("out-of-order stale replay must not rewind the idle deadline") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndlww-rwd")
    // ttl 600 s, watermark delay 1 h — the rewind window the chain's
    // long-lateness config actually opens
    val g = new Gate(root, ttl = Some(600000L), delay = "1 hour")
    try {
      // doc 1 claims at t=4500 → deadline 5100
      g.wave(Seq((1L, 1L, "en", toks("a"))), etsSec = 4500L)
      // stale replay rides in OUT OF ORDER at t=1000 (above the 900
      // watermark): emits nothing, and must NOT pull the deadline
      // back to 1600
      val before = g.rows.size
      g.wave(Seq((1L, 1L, "en", toks("a"))), etsSec = 1000L)
      assert(g.rows.size == before, "a stale replay re-entered the buckets")
      // pusher advances the watermark to 1700 — past the REWOUND
      // deadline (1600) but well before the true one (5100); a
      // rewound clock expires doc 1 here
      g.wave(Seq((50L, 1L, "en", toks("d"))), etsSec = 5300L)
      // the witness: an in-horizon near-copy of doc 1 must still flag
      g.wave(Seq((6L, 1L, "en", nearCopy("a", "yy"))), etsSec = 5400L)
      assert(g.verdict(6L).contains(1L),
        "idle deadline rewound by an out-of-order stale replay — doc expired early")
    } finally {
      g.stop()
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("LWW gate plans: one exchange per stage, single-scan explode, no joins") {
    import org.apache.spark.sql.functions.lit
    // batch execution exposes the physical shape the streaming planner
    // inherits (the flag-plan pin's discipline, applied to the pair)
    val corpus = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), lit(1L).as("ver"), col("lang"), col("text"))
    // stage 1: sketch + band hashes are narrow; the ONLY shuffle is the
    // doc_id-keyed exchange into the registry, and one row per doc
    // comes out — never ×16 on either side
    val reg = NearDupStream.registerLww(corpus)
    val pReg = reg.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(pReg).size == 1,
      s"registry: expected exactly 1 keyed exchange, plan:\n${pReg.take(600)}")
    assert(!pReg.contains("Join"), s"registry must not join:\n${pReg.take(600)}")
    assert(!pReg.contains("Generate"),
      s"registry must not fan out to band rows:\n${pReg.take(600)}")
    // stage 2 in isolation (localCheckpoint truncates the registry's
    // lineage): ONE generator does the 16× fan-out (a per-kind
    // projection union would scan the handoff twice), then the single
    // (band, band-hash) keyed exchange into the bucket kernel
    val msgs = reg.toDF().localCheckpoint()
    val pBuk = NearDupStream.applyLww(msgs).queryExecution.executedPlan.toString
    assert("Generate".r.findAllIn(pBuk).size == 1,
      s"buckets: expected exactly 1 generator, plan:\n${pBuk.take(600)}")
    assert("Exchange hashpartitioning".r.findAllIn(pBuk).size == 1,
      s"buckets: expected exactly 1 keyed exchange, plan:\n${pBuk.take(600)}")
    assert(!pBuk.contains("Join") && !pBuk.contains("Union"),
      s"buckets must neither join nor double-scan:\n${pBuk.take(600)}")
  }

  /** kill/restart across the idle horizon: the registry's armed
    * event-time timers, its version registers, the watermark, AND the
    * bucket claims all live in the two checkpoints — a second Gate on
    * the same root must (a) adjudicate against PRE-restart claims,
    * (b) honor a pre-restart doc's idle deadline (the restored timer
    * fires and retires), and (c) extend a doc's life on a
    * post-restart stale replay. */
  test("TTL'd registry survives restart: checkpointed timers still fire") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndlww-rst")
    val ttl = Some(600000L)
    val g1 = new Gate(root, ttl, tag = "a")
    try {
      // generation 1: docs 1 and 2 claim at t=0, then the gate dies
      g1.wave(Seq((1L, 1L, "en", toks("a")), (2L, 1L, "en", toks("c"))), etsSec = 0L)
      assert(g1.verdict(1L).isEmpty && g1.verdict(2L).isEmpty)
    } finally g1.stop()
    val g2 = new Gate(root, ttl, tag = "b")
    try {
      // generation 2, same checkpoints: doc 2 stale-replays (re-arms
      // its RESTORED register's clock); doc 1 stays idle since t=0
      g2.wave(Seq((2L, 1L, "en", toks("c"))), etsSec = 1900L)
      // the pusher advances the restored watermark past doc 1's
      // pre-restart deadline (600) — the checkpointed timer fires
      // post-restart and retires claims made by the PREVIOUS process
      g2.wave(Seq((50L, 1L, "en", toks("d"))), etsSec = 2000L)
      g2.wave(Seq(
        (6L, 1L, "en", nearCopy("a", "yy")),
        (9L, 1L, "en", nearCopy("c", "pp"))), etsSec = 2010L)
      assert(g2.verdict(6L).isEmpty,
        "pre-restart doc's idle deadline lost in restart — claims survived")
      assert(g2.verdict(9L).contains(2L),
        "either pre-restart bucket claims or the replay re-arm were lost")
    } finally {
      g2.stop()
      new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }
}
