package graft.streaming

import graft.SparkSuite
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** The live chain WITH the near-dup admission stage
  * ([[PipelineE2E.startLive]] `nearDup = true`): curation's exact
  * content dedup passes fp-distinct near-duplicates through — the
  * fixture carries 18 such pairs among its fp-unique docs — and the
  * gate stage collapses each class to its canonical before budget
  * admission ever sees it. Pinned end to end: the deduped manifest
  * equals the batch curation replay MINUS the batch
  * `dedup_minhash_lsh` components' non-canonicals (restricted to the
  * curated corpus), and the admitted manifest equals the batch
  * two-phase budget selection over that DEDUPED corpus. */
class PipelineE2ENearDupSpec extends SparkSuite {

  private val Budget = 2000L

  private def uniqueDocs: DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.Tables.load(spark, sf0001, "documents")
      .withColumn("rk", row_number().over(
        Window.partitionBy(TextFns.fingerprint(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
  }

  test("near-dup classes collapse to canonicals before budget admission") {
    runCase(ttlMs = None)
  }

  test("TTL-bounded gate form: identical terminals within the horizon") {
    // a ttl far beyond the corpus's event span (~500 s) never expires a
    // bucket, and within the horizon flagExpiring's verdicts are
    // flag's ([[NearDupStream.flagExpiring]] scaladoc, kernel-spec'd in
    // NearDupStreamSpec) — so the WHOLE ttl-gated chain must produce
    // the same terminals the unbounded gate does
    runCase(ttlMs = Some(30L * 86400L * 1000L))
  }

  test("nearDupLww chain: a near-copy of a superseded version is admitted") {
    runLwwCase(ttlMs = None)
  }

  test("nearDupLww + ttl chain: identical update semantics within the horizon") {
    // the composed gate (TTL'd registry + version-stamped buckets) on a
    // never-firing horizon must run the full update timeline exactly as
    // the unbounded LWW gate does — the chain-level twin of
    // NearDupLwwSpec's within-horizon parity
    runLwwCase(ttlMs = Some(30L * 86400L * 1000L))
  }

  test("epoch-pointer handoffs + docs retention: identical update semantics, bounded namespaces") {
    // every raw-listed handoff consumed through the epoch-pointer
    // source (ingest index → apply, bands rendezvous, survivor epochs
    // → budget) with consumed-epoch retention on, plus the docs store
    // under cleanSource archive + empty-epoch sweep — the full
    // update-aware timeline must come out IDENTICAL (round-19 verdict
    // ask 1: results hash-unchanged), and the hot handoff namespaces
    // must actually shrink
    runLwwCase(ttlMs = None, epochHandoffs = true)
  }

  private def runLwwCase(ttlMs: Option[Long],
      epochHandoffs: Boolean = false): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-ndlww")
      .toFile.getAbsolutePath
    try {
      def toks(p: String): String = (0 until 40).map(i => s"$p$i").mkString(" ")
      def nearCopy(p: String, m: String): String =
        (0 until 40).map(i => if (i == 20) m else s"$p$i").mkString(" ")
      // base corpus WITH embeddings (serveFromChain carries them) plus
      // the planted doc X — synthetic token families, disjoint from the
      // corpus's English-ish text, so only X's own claims adjudicate
      // the later near-copies
      val vecs = graft.Tables.load(spark, sf0001, "embeddings")
        .select($"vec_id".as("doc_id"),
          expr("transform(embedding, x -> cast(x as double))").as("embedding"))
      val base = uniqueDocs.filter($"doc_id" < 200).join(vecs, "doc_id")
      def planted(id: Long, text: String, seed: Int) =
        Seq((id, "planted", "en", text)).toDF("doc_id", "source", "lang", "text")
          .withColumn("embedding",
            expr(s"transform(sequence(1, 64), i -> cast(i * $seed as double))"))
      // doc 9100 is a CLOCK PUSHER: the fixture's op identity is
      // h = doc_id, so the quorum kernel absorbs a same-doc update as
      // a replica replay until the watermark reaps the doc's state —
      // a wave-1 doc ABOVE X on the event clock pushes the ingest
      // watermark past X's op time, so X's state reaps and the update
      // wave reads as a NEW op (deployment-true: a real oplog stamps
      // each op a unique hash; only the synthetic fixture overloads
      // doc_id)
      val docs = base
        .unionByName(planted(9001L, toks("xa"), 3))
        .unionByName(planted(9100L, toks("wc"), 11))
        .localCheckpoint()
      val cap = Int.MaxValue / 2
      val gated = docs.filter(
        size(TextFns.tokens($"text")) >= CurationStream.QualityMinTokens)
      val b = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(b, Budget)
      val topo = Seq(ShardTopology.parseDescriptor("s0/h1:27017,h2:27017,h3:27017"))
      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        topology = topo,
        applyLateness = "6 hours", curationDelay = "6 hours",
        nearDup = true, nearDupLww = true, nearDupTtlMs = ttlMs,
        serveFromChain = Some(s"$sf0001/embeddings.parquet"),
        // exercise the gate-only partition dial on the same run — the
        // two gate queries get their own state-store count while the
        // rest of the chain keeps the session default
        gateShufflePartitions = Some(4),
        epochHandoffs = epochHandoffs, docsRetention = epochHandoffs)
      try {
        PipelineE2E.writeOplogWave(spark, docs, root, topo, "w1")
        chain.drain()
        // UPDATE X: fresh text family, later op clock — the registry
        // must retire textXA's claims when the wave lands
        PipelineE2E.writeOplogWave(spark, planted(9001L, toks("xb"), 3),
          root, topo, "wu", tsOffsetSec = 5000L)
        chain.drain()
        // the adjudicated wave: Y near-copies the SUPERSEDED text
        // (must be admitted), Z near-copies the CURRENT text (flagged).
        // ts offset ABOVE the update wave's — the ingest watermark sits
        // 10 s behind the update's op clock and would drop an
        // earlier-stamped wave as late
        PipelineE2E.writeOplogWave(spark,
          planted(9010L, nearCopy("xa", "zz"), 5)
            .unionByName(planted(9020L, nearCopy("xb", "zz"), 7)),
          root, topo, "w3", tsOffsetSec = 15000L)
        chain.drain()

        val lineSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("data",
            PipelineE2E.curatedFullSchemaE)))
        // under retention the consumed survivor epochs live in the
        // archive twin — the post-hoc manifest is the union
        val dedupGlobs = Seq(s"$root/dedup/neardup/batch=*",
          s"$root/dedup/neardup_archive/batch=*")
          .filter(g => new java.io.File(g.stripSuffix("/batch=*")).isDirectory)
        val deduped = spark.read.schema(lineSchema)
          .json(dedupGlobs: _*)
          .select($"data.doc_id".as("doc_id"), $"data.ver".as("ver"),
            $"data.text".as("text"))
        if (epochHandoffs) {
          // the retention evidence: consumed epochs LEFT the hot
          // namespaces — the ingest index and survivor manifests into
          // their archive twins, the bands rendezvous deleted outright,
          // the docs store's consumed part files into the cold tier
          // with their emptied epoch dirs swept
          def liveEpochs(d: String): Int =
            Option(new java.io.File(d).listFiles).getOrElse(Array.empty)
              .count(_.getName.startsWith("batch="))
          assert(liveEpochs(s"$root/index/s0/oplog_archive") > 0,
            "consumed ingest-index epochs must be archived")
          assert(liveEpochs(s"$root/dedup/neardup_archive") > 0,
            "consumed survivor epochs must be archived")
          assert(new java.io.File(
            s"${PipelineE2E.docsArchiveBase(root)}$root/docs").isDirectory,
            "consumed docs part files must move to the cold tier")
          val liveDocsEpochs = liveEpochs(s"$root/docs")
          assert(liveDocsEpochs <= 6,
            s"emptied docs epochs must be swept (live: $liveDocsEpochs)")
          // the corpus is PRESERVED across the two tiers: every doc
          // the chain materialized is readable via docsAllGlobs
          val allDocs = spark.read.schema(PipelineE2E.docSchemaEV)
            .parquet(PipelineE2E.docsAllGlobs(root): _*)
          assert(allDocs.select($"doc_id").distinct().count() >=
            docs.select($"doc_id").distinct().count(),
            "retention must never lose corpus rows, only move them")
        }
        val x = deduped.filter($"doc_id" === 9001L)
          .select($"ver", $"text").as[(Long, String)].collect().sortBy(_._1)
        assert(x.length == 2 && x(0)._2 == toks("xa") && x(1)._2 == toks("xb"),
          "both of X's versions must publish (append-only manifest, LWW " +
            "re-adjudication on update)")
        assert(deduped.filter($"doc_id" === 9010L).count() == 1,
          "near-copy of the SUPERSEDED text was flagged — stale band " +
            "claims survived the update")
        assert(deduped.filter($"doc_id" === 9020L).count() == 0,
          "near-copy of the CURRENT text leaked past the gate")
      } finally chain.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }

  test("nearDupLww + ttl chain: an idle doc's claims expire end to end") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-ndlww-exp")
      .toFile.getAbsolutePath
    try {
      def toks(p: String): String = (0 until 40).map(i => s"$p$i").mkString(" ")
      def nearCopy(p: String, m: String): String =
        (0 until 40).map(i => if (i == 20) m else s"$p$i").mkString(" ")
      val vecs = graft.Tables.load(spark, sf0001, "embeddings")
        .select($"vec_id".as("doc_id"),
          expr("transform(embedding, x -> cast(x as double))").as("embedding"))
      val base = uniqueDocs.filter($"doc_id" < 200).join(vecs, "doc_id")
      def planted(id: Long, text: String, seed: Int) =
        Seq((id, "planted", "en", text)).toDF("doc_id", "source", "lang", "text")
          .withColumn("embedding",
            expr(s"transform(sequence(1, 64), i -> cast(i * $seed as double))"))
      // the gate's event clock is doc_id seconds (+86400): X = doc 9001
      // claims at ets 95401 s; ttl = 600 s; curationDelay (= the gate's
      // lateness horizon) is 6 h, so the PUSHER must sit 6 h + ttl of
      // doc_id clock above X's deadline — doc 35000 puts the registry
      // watermark at 99800 s > 96001 s, firing X's timeout in the batch
      // AFTER the pusher lands (i.e. the copy wave's batch, whose epoch
      // then carries X's retires ahead of the copies: retires apply
      // first within a bucket trigger, so the admission is safe even
      // same-epoch)
      val docs = base.unionByName(planted(9001L, toks("xa"), 13)).localCheckpoint()
      val cap = Int.MaxValue / 2
      val gated = docs.filter(
        size(TextFns.tokens($"text")) >= CurationStream.QualityMinTokens)
      val b = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(b, Budget)
      val topo = Seq(ShardTopology.parseDescriptor("s0/h1:27017,h2:27017,h3:27017"))
      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        topology = topo,
        applyLateness = "6 hours", curationDelay = "6 hours",
        nearDup = true, nearDupLww = true, nearDupTtlMs = Some(600000L),
        serveFromChain = Some(s"$sf0001/embeddings.parquet"))
      try {
        PipelineE2E.writeOplogWave(spark, docs, root, topo, "w1")
        chain.drain()
        // the watermark pusher (novel text — claims its own buckets)
        PipelineE2E.writeOplogWave(spark, planted(35000L, toks("pq"), 17),
          root, topo, "w2", tsOffsetSec = 5000L)
        chain.drain()
        // the adjudicated wave: a near-copy of the EXPIRED X must be
        // ADMITTED; a near-copy of the in-horizon pusher still flags
        PipelineE2E.writeOplogWave(spark,
          planted(36000L, nearCopy("xa", "zz"), 19)
            .unionByName(planted(36001L, nearCopy("pq", "zz"), 23)),
          root, topo, "w3", tsOffsetSec = 15000L)
        chain.drain()

        val lineSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("data",
            PipelineE2E.curatedFullSchemaE)))
        val deduped = spark.read.schema(lineSchema)
          .json(s"$root/dedup/neardup/batch=*")
          .select($"data.doc_id".as("doc_id"))
        assert(deduped.filter($"doc_id" === 9001L).count() == 1,
          "X itself must have been admitted in wave 1")
        assert(deduped.filter($"doc_id" === 36000L).count() == 1,
          "near-copy of an idle-expired doc was flagged — claims " +
            "outlived the ttl horizon end to end")
        assert(deduped.filter($"doc_id" === 36001L).count() == 0,
          "near-copy of an in-horizon claim leaked past the gate")
      } finally chain.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }

  private def runCase(ttlMs: Option[Long]): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-neardup")
      .toFile.getAbsolutePath
    try {
      val docs = uniqueDocs.localCheckpoint()
      val cap = docs.groupBy($"source").count().agg(max($"count"))
        .head().getLong(0).toInt + 1
      // batch replay of curation under the uncapping cap: gate + split
      val gated = docs.select($"doc_id", $"source", $"lang", $"text",
          size(TextFns.tokens($"text")).cast("long").as("n_tokens"),
          md5($"doc_id".cast("string")).as("mh"))
        .filter($"n_tokens" >= CurationStream.QualityMinTokens)
        .withColumn("h2", substring($"mh", 1, 2))
        .withColumn("split", when($"h2" < "cd", "train")
          .when($"h2" < "e6", "val").otherwise("test"))
        .localCheckpoint()
      val curatedIds = gated.select($"doc_id").as[Long].collect().toSet

      // expected survivors: union-find over the batch operator's
      // verified pairs, RESTRICTED to the curated corpus (the gate only
      // ever sees curated rows)
      val pairs = graft.operators.Dedup.minhashLsh.run(spark, sf0001)
        .select($"d1", $"d2").as[(Long, Long)].collect()
        .filter(p => curatedIds(p._1) && curatedIds(p._2))
      assert(pairs.nonEmpty, "fixture lost its fp-distinct near-dup pairs")
      val parent = mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nonCanonical = pairs.flatMap(p => Seq(p._1, p._2)).toSet
        .filter(d => find(d) != d)
      val dedupedGated = gated.filter(!$"doc_id".isin(nonCanonical.toSeq: _*))

      // admission statics from the DEDUPED snapshot — what a deployed
      // previous-corpus snapshot would contain once the gate runs
      val base = graft.operators.Pipeline.budgetBaseFrom(
        dedupedGated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, Budget)

      // SINGLE-shard topology: the planted near-dup classes cross
      // LANGUAGES, so any sharding splits a class across shards and the
      // claim order (hence which member survives) becomes whichever
      // shard's epoch lands first — the documented cross-publisher
      // arrival caveat, a property of the shard key, not the gate. One
      // shard ⇒ one epoch ⇒ claim order is doc_id order ⇒ canonical =
      // the class minimum, the batch operator's choice.
      val topo = Seq(ShardTopology.parseDescriptor("s0/h1:27017,h2:27017,h3:27017"))
      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        topology = topo,
        applyLateness = "6 hours", curationDelay = "6 hours",
        nearDup = true, nearDupTtlMs = ttlMs)
      try {
        PipelineE2E.writeOplogWave(spark, docs, root, topo, "w1")
        chain.drain()
      } finally chain.stop()

      // ---- deduped manifest == batch curation minus non-canonicals ----
      val lineSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("data", PipelineE2E.curatedFullSchema)))
      val deduped = spark.read.schema(lineSchema)
        .json(s"$root/dedup/neardup/batch=*")
        .select($"data.doc_id".as("doc_id"), $"data.source".as("source"),
          $"data.lang".as("lang"), $"data.n_tokens".as("n_tokens"),
          $"data.split".as("split"), $"data.text".as("text"))
      val wantDeduped = dedupedGated.select($"doc_id", $"source", $"lang",
        $"n_tokens", $"split", $"text")
      assert(deduped.exceptAll(wantDeduped).isEmpty &&
        wantDeduped.exceptAll(deduped).isEmpty,
        "deduped manifest != batch curation minus non-canonicals")
      // the stage actually dropped something
      assert(nonCanonical.nonEmpty &&
        deduped.count() == gated.count() - nonCanonical.size)

      // ---- admitted == batch 2-phase selection over the DEDUPED corpus ----
      val admitted = spark.read.schema(PipelineE2E.admitSchema)
        .parquet(s"$root/admitted")
      val wantAdmit = graft.operators.Pipeline.budgetSelect2Phase(base, Budget)
      assert(admitted.exceptAll(wantAdmit).isEmpty &&
        wantAdmit.exceptAll(admitted).isEmpty,
        "admitted manifest != batch budgetSelect2Phase over the deduped corpus")
      // no non-canonical leaked past the gate into admission
      assert(admitted.filter($"doc_id".isin(nonCanonical.toSeq: _*)).isEmpty)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }
}
