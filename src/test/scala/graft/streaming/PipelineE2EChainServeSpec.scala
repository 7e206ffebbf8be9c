package graft.streaming

import graft.SparkSuite
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SERVE-FROM-CHAIN, live in one concurrent run
  * ([[PipelineE2E.startLive]] `serveFromChain`): the embedding rides
  * the OPLOG PAYLOAD through ingest, the apply stage materializes it,
  * curation carries it through the manifest
  * ([[CurationStream.curateWithEmbedding]]), and the serve stage's
  * candidate corpus is the chain's own curated store restricted to the
  * admitted manifest ([[MmrServeStream.serveChainRefreshed]]) — NO
  * fixture vector table anywhere in the serve path, closing the
  * round-13 gap "chain-derived embeddings are not servable".
  *
  * Pinned: (1) between-wave queries serve EXACTLY a driver kernel
  * replay over the wave-1 admitted ids using the ORIGINAL embedding
  * table values — which simultaneously proves the carried vectors
  * survived the JSON payload round-trip bit-exactly (a single ULP of
  * drift would flip cosines and change picks); (2) post-wave-2
  * queries serve exactly the grown corpus (epoch-pointer rebuild, no
  * restart); (3) wave-1 serve epochs are immutable. */
class PipelineE2EChainServeSpec extends SparkSuite {

  private val Budget = 2000L
  private val WaveSplit = 250L

  /** fp-unique docs JOINED with their embeddings (cast to double —
    * the payload carries doubles end to end). */
  private def uniqueDocsE: DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .withColumn("rk", row_number().over(
        Window.partitionBy(TextFns.fingerprint(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val vecs = graft.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as("doc_id"),
        expr("transform(embedding, x -> cast(x as double))").as("embedding"))
    docs.join(vecs, "doc_id")
  }

  /** brute-force replay of the exact streamed kernel over one admitted
    * snapshot (nprobe = nCells in the chain ⇒ probes cover every
    * cell ⇒ candidates are ALL admitted vectors). */
  private def replay(qids: Seq[Long], admittedIds: Set[Long],
      vecs: Map[Long, Array[Double]]): Set[(Long, Int, Long, Long)] = {
    def nrm(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    qids.flatMap { qid =>
      val qv = vecs(qid); val qn = nrm(qv)
      val cands = admittedIds.toSeq.filter(_ != qid).sorted.map { id =>
        val v = vecs(id); val n = nrm(v)
        var s = 0.0; var i = 0
        while (i < v.length) { s += qv(i) * v(i); i += 1 }
        MmrCand(qid, id, s / (qn * n), v, n)
      }
      MmrServeStream.rerank(qid, cands.iterator, 20, 5)
    }.map(h => (h.qid, h.step, h.vec_id, h.mmr_score)).toSet
  }

  test("the chain serves the vectors it produced: exact vs replay, fresh per epoch") {
    runChainServe(indexed = false)
  }

  test("admit-time-indexed: the manifest IS the index, same exact serve") {
    runChainServe(indexed = true)
  }

  test("an updated document serves its NEWEST embedding (LWW through the chain)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-lwwserve")
      .toFile.getAbsolutePath
    val scratch = java.nio.file.Files.createTempDirectory("graft-e2e-lwq")
    try {
      val docs = uniqueDocsE.localCheckpoint()
      // cap HEADROOM: the update wave re-curates ~20 docs (new fp per
      // version), and the spec needs every updated version to survive
      // the per-source cap deterministically
      val cap = docs.groupBy($"source").count().agg(max($"count"))
        .head().getLong(0).toInt + 50
      val gated = docs.filter(
        size(TextFns.tokens($"text")) >= CurationStream.QualityMinTokens)
      val base = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, Budget)
      val vecs: Map[Long, Array[Double]] =
        graft.Tables.load(spark, sf0001, "embeddings")
          .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
          .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
      def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
        val tmp = scratch.resolve(name)
        spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
          .coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath,
          java.nio.file.Paths.get(s"$root/queries/$name.parquet"))
        ()
      }
      def served() = spark.read.json(s"$root/serve/batch=*")
        .select($"data.qid".as("qid"), $"data.step".cast("int").as("step"),
          $"data.vec_id".as("vec_id"), $"data.mmr_score".as("mmr_score"))
        .as[(Long, Int, Long, Long)].collect()
      def admittedIds() = spark.read.schema(PipelineE2E.admitSchema)
        .parquet(s"$root/admitted").select($"doc_id").as[Long].collect().toSet

      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours",
        serveNprobe = 16, serveFromChain = Some(s"$sf0001/embeddings.parquet"))
      try {
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" < WaveSplit),
          root, PipelineE2E.defaultTopology, "w1",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val admitW1 = admittedIds()
        assert(admitW1.nonEmpty)
        addQueries(col("vec_id") < 4, "qa")
        chain.drain()
        val phase1 = served()
        assert(phase1.map(t => (t._1, t._2, t._3, t._4)).toSet ==
          replay(0L until 4L, admitW1, vecs))

        // UPDATE a slice of wave-1 docs: new text (new fp — re-passes
        // content dedup), new embedding (a vector the corpus never
        // ingested), LATER op clock — the apply stage's LWW replaces
        // the doc, the curated store gains the new version at a higher
        // ver, and the serve must answer with the NEW vectors for
        // every updated doc that is admitted, with no restart
        val updIds = (100L until 120L)
        val updDocs = docs.filter($"doc_id" >= 100 && $"doc_id" < 120)
          .select($"doc_id", $"source", $"lang",
            concat($"text", lit(" revised edition of this document")).as("text"))
          .join(
            spark.read.parquet(s"$sf0001/embeddings.parquet")
              .filter($"vec_id" >= 400 && $"vec_id" < 420)
              .select(($"vec_id" - 300L).as("doc_id"),
                expr("transform(embedding, x -> cast(x as double))").as("embedding")),
            "doc_id")
        PipelineE2E.writeOplogWave(spark, updDocs,
          root, PipelineE2E.defaultTopology, "wu",
          shardKey = Some(PipelineE2E.shardByLang(2)), tsOffsetSec = 5000L)
        chain.drain()
        val admitW2 = admittedIds()
        val newest = vecs ++ updIds.map(id => id -> vecs(id + 300L))
        addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "qb")
        chain.drain()
        val phase2 = served()
        val bHits = phase2.filter(t => t._1 >= 4 && t._1 < 8)
          .map(t => (t._1, t._2, t._3, t._4)).toSet
        assert(bHits == replay(4L until 8L, admitW2, newest),
          "post-update queries must serve the NEWEST embedding of every " +
            "updated admitted doc")

        // the DETERMINISTIC newest-wins witness: querying with an
        // updated doc's NEW vector itself must retrieve that doc at
        // step 1 (cos = 1.0, unbeatable on a fixture of distinct
        // vectors) — impossible under its stale embedding
        addQueries(col("vec_id") >= 400 && col("vec_id") < 420, "qc")
        chain.drain()
        val phase3 = served()
        val cHits = phase3.filter(t => t._1 >= 400 && t._1 < 420)
          .map(t => (t._1, t._2, t._3, t._4)).toSet
        assert(cHits == replay(400L until 420L, admitW2, newest))
        val updAdmitted = updIds.filter(admitW2)
        assert(updAdmitted.nonEmpty, "fixture must admit some updated doc")
        updAdmitted.foreach { id =>
          assert(cHits.exists(t => t._1 == id + 300L && t._2 == 1 && t._3 == id),
            s"query ${id + 300L} (doc $id's new vector) must retrieve doc " +
              s"$id at step 1 — stale embedding served")
        }
        // pre-update epochs immutable
        val aBefore = phase1.filter(_._1 < 4).sorted.toSeq
        val aAfter = phase2.filter(_._1 < 4).sorted.toSeq
        assert(aAfter == aBefore, "a pre-update serve epoch changed")
      } finally chain.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }

  test("update-aware budget (budgetLww): an updated doc consumes the budget once") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-lwwbudget")
      .toFile.getAbsolutePath
    try {
      val docs = uniqueDocsE.localCheckpoint()
      val cap = docs.groupBy($"source").count().agg(max($"count"))
        .head().getLong(0).toInt + 50
      val gated = docs.filter(
        size(TextFns.tokens($"text")) >= CurationStream.QualityMinTokens)
      val base = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, Budget)
      val cutRows = cuts.select($"lang", $"cut_key", $"residual")
        .as[(String, Long, Long)].collect()
      // the admitted manifest in budgetLww mode carries ver + tokens
      def admitted() = spark.read
        .schema("doc_id LONG, lang STRING, n_tokens LONG, rank_key LONG, " +
          "cum_tokens LONG, ver LONG")
        .parquet(s"$root/admitted")
        .select($"doc_id", $"lang", $"n_tokens", $"rank_key", $"ver")
        .as[(Long, String, Long, Long, Long)].collect()
      // conservation at the binding constraint: per lang, the NEWEST
      // admitted version of every doc in the BOUNDARY group must fit
      // the residual — the once-per-doc charge, observable from the
      // manifest alone (above-cut groups admit unboundedly by design)
      def assertConserved(rows: Seq[(Long, String, Long, Long, Long)],
          when: String): Unit = {
        val newest = rows.groupBy(_._1).map(_._2.maxBy(_._5)).toSeq
        cutRows.foreach { case (lang, cutKey, residual) =>
          val charged = newest
            .filter(r => r._2 == lang && r._4 == cutKey).map(_._3).sum
          assert(charged <= residual,
            s"$when: boundary group $lang/$cutKey charges $charged > " +
              s"residual $residual — an update was double-charged")
        }
      }

      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours",
        serveNprobe = 16, serveFromChain = Some(s"$sf0001/embeddings.parquet"),
        budgetLww = true)
      try {
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" < WaveSplit),
          root, PipelineE2E.defaultTopology, "w1",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val w1 = admitted()
        assert(w1.nonEmpty)
        assertConserved(w1.toSeq, "wave 1")

        // update a slice: new text (bigger — the refund must cover the
        // growth), new embedding, later op clock
        val updDocs = docs.filter($"doc_id" >= 100 && $"doc_id" < 120)
          .select($"doc_id", $"source", $"lang",
            concat($"text", lit(" revised edition of this document")).as("text"))
          .join(
            spark.read.parquet(s"$sf0001/embeddings.parquet")
              .filter($"vec_id" >= 400 && $"vec_id" < 420)
              .select(($"vec_id" - 300L).as("doc_id"),
                expr("transform(embedding, x -> cast(x as double))").as("embedding")),
            "doc_id")
        PipelineE2E.writeOplogWave(spark, updDocs,
          root, PipelineE2E.defaultTopology, "wu",
          shardKey = Some(PipelineE2E.shardByLang(2)), tsOffsetSec = 5000L)
        chain.drain()
        val w2 = admitted()
        // the manifest stays append-only: wave-1 rows are immutable,
        // updates land as HIGHER-ver rows for re-admitted docs
        assert(w1.toSet.subsetOf(w2.toSet), "an admitted epoch was rewritten")
        val updV2 = w2.filter(r => r._1 >= 100 && r._1 < 120 && r._5 > w1
          .filter(_._1 == r._1).map(_._5).maxOption.getOrElse(0L))
        assert(updV2.nonEmpty,
          "fixture must re-admit some updated doc at its new version")
        // once-per-doc accounting survives the update wave
        assertConserved(w2.toSeq, "post-update")
        // and each re-admitted doc is charged for its NEW text: the
        // update appends 5 words, so the newest version's n_tokens
        // must exceed the wave-1 charge it refunded
        updV2.foreach { r =>
          val old = w1.filter(_._1 == r._1)
          old.foreach(o => assert(r._3 > o._3,
            s"doc ${r._1}: updated charge ${r._3} not the new text (v1 ${o._3})"))
        }
      } finally chain.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }

  /** THE FULL UPDATE-AWARE CHAIN — every LWW dial on at once
    * (nearDup + nearDupLww + nearDupTtlMs + budgetLww): the two
    * update-aware stages NEED each other, and this is the case that
    * proves the composition rather than each in isolation. An updated
    * doc's new text is a near-copy of its own old text (appended
    * words, shared shingles), so WITHOUT the gate's claim retirement
    * the update would be flagged as a near-dup of its own superseded
    * version and never reach the budget stage — budgetLww's refund
    * path could never fire through the gated chain. With retirement,
    * the update re-adjudicates clean, republishes at its new version,
    * and the budget refunds the old charge and charges the new text —
    * conservation holding end to end through BOTH ledgers. */
  test("full update-aware chain: gate retirement feeds the budget refund") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-alllww")
      .toFile.getAbsolutePath
    try {
      val docs = uniqueDocsE.localCheckpoint()
      val cap = docs.groupBy($"source").count().agg(max($"count"))
        .head().getLong(0).toInt + 50
      val gated = docs.filter(
        size(TextFns.tokens($"text")) >= CurationStream.QualityMinTokens)
      val base = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, Budget)
      val cutRows = cuts.select($"lang", $"cut_key", $"residual")
        .as[(String, Long, Long)].collect()
      def admitted() = spark.read
        .schema("doc_id LONG, lang STRING, n_tokens LONG, rank_key LONG, " +
          "cum_tokens LONG, ver LONG")
        .parquet(s"$root/admitted")
        .select($"doc_id", $"lang", $"n_tokens", $"rank_key", $"ver")
        .as[(Long, String, Long, Long, Long)].collect()
      def assertConserved(rows: Seq[(Long, String, Long, Long, Long)],
          when: String): Unit = {
        val newest = rows.groupBy(_._1).map(_._2.maxBy(_._5)).toSeq
        cutRows.foreach { case (lang, cutKey, residual) =>
          val charged = newest
            .filter(r => r._2 == lang && r._4 == cutKey).map(_._3).sum
          assert(charged <= residual,
            s"$when: boundary group $lang/$cutKey charges $charged > " +
              s"residual $residual — an update was double-charged")
        }
      }

      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours",
        serveNprobe = 16, serveFromChain = Some(s"$sf0001/embeddings.parquet"),
        nearDup = true, nearDupLww = true,
        nearDupTtlMs = Some(30L * 86400L * 1000L),
        budgetLww = true)
      try {
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" < WaveSplit),
          root, PipelineE2E.defaultTopology, "w1",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val w1 = admitted()
        assert(w1.nonEmpty)
        assertConserved(w1.toSeq, "wave 1")

        val updDocs = docs.filter($"doc_id" >= 100 && $"doc_id" < 120)
          .select($"doc_id", $"source", $"lang",
            concat($"text", lit(" revised edition of this document")).as("text"))
          .join(
            spark.read.parquet(s"$sf0001/embeddings.parquet")
              .filter($"vec_id" >= 400 && $"vec_id" < 420)
              .select(($"vec_id" - 300L).as("doc_id"),
                expr("transform(embedding, x -> cast(x as double))").as("embedding")),
            "doc_id")
        PipelineE2E.writeOplogWave(spark, updDocs,
          root, PipelineE2E.defaultTopology, "wu",
          shardKey = Some(PipelineE2E.shardByLang(2)), tsOffsetSec = 5000L)
        chain.drain()
        val w2 = admitted()
        assert(w1.toSet.subsetOf(w2.toSet), "an admitted epoch was rewritten")
        val updV2 = w2.filter(r => r._1 >= 100 && r._1 < 120 && r._5 > w1
          .filter(_._1 == r._1).map(_._5).maxOption.getOrElse(0L))
        // THE composition claim: updates survived the GATE (retirement
        // let each one through its own old claims) and reached the
        // budget's refund path — without registerLww the update wave
        // would re-admit nothing here
        assert(updV2.nonEmpty,
          "no updated doc re-admitted — the gate flagged updates " +
            "against their own superseded versions")
        assertConserved(w2.toSeq, "post-update")
        updV2.foreach { r =>
          val old = w1.filter(_._1 == r._1)
          old.foreach(o => assert(r._3 > o._3,
            s"doc ${r._1}: updated charge ${r._3} not the new text (v1 ${o._3})"))
        }
        // gate-side witness: every re-admitted update's v2 row is in
        // the DEDUPED manifest (it re-adjudicated and republished)
        val lineSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("data",
            PipelineE2E.curatedFullSchemaE)))
        val deduped = spark.read.schema(lineSchema)
          .json(s"$root/dedup/neardup/batch=*")
          .select($"data.doc_id".as("doc_id"), $"data.ver".as("ver"))
          .as[(Long, Long)].collect().toSet
        updV2.foreach { r =>
          assert(deduped.contains((r._1, r._5)),
            s"doc ${r._1} admitted at ver ${r._5} without a matching " +
              "deduped-manifest publish")
        }
      } finally chain.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }

  /** THE BELOW-CUT-UPDATE RECONCILIATION, demonstrated instead of
    * documented (round-17 ask; closes the r15 ADVICE low left half-open
    * in r16): [[TokenBudgetStream.admitLww]]'s one documented
    * divergence is an update whose NEWEST version ranks below its lang
    * cut — the stateless pre-filter drops it before the ledger, so the
    * old version stays charged and keeps serving (conservative under
    * the append-only manifest: every served version stays a paid one).
    * The scaladoc says "compaction reconciles"; this spec RUNS that
    * compaction and witnesses it. Full-LWW chain, two waves:
    *
    *  1. wave 1 admits doc X (picked at runtime from a lang where the
    *     budget BINDS — rejected candidates exist);
    *  2. X updates to a low-quality revision (40 tokens, 2 distinct →
    *     rank_key ≈ 50k, far below any lang cut) that passes curation
    *     (≥ QualityMinTokens) and the novel-text gate but is dropped
    *     by admitLww's cut pre-filter: the LIVE manifest's newest
    *     admitted row for X stays v1 — the divergence, witnessed;
    *  3. the COMPACTION SEAL (the `corpus_budget_update_lww`
    *     discipline — LWW collapse by `ver` over the curated store,
    *     then the greedy budget prefix recomputed) releases the stale
    *     charge: X drops out entirely (its newest version ranks below
    *     the recomputed cut), per-lang conservation holds exactly, and
    *     the freed tokens are RE-SPENT — the seal admits at least one
    *     lang-mate the live manifest had rejected. */
  test("below-cut update: live keeps the old charge, the compaction seal releases it") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-belowcut")
      .toFile.getAbsolutePath
    try {
      val docs = uniqueDocsE.localCheckpoint()
      val cap = docs.groupBy($"source").count().agg(max($"count"))
        .head().getLong(0).toInt + 50
      val gated = docs.filter(
        size(TextFns.tokens($"text")) >= CurationStream.QualityMinTokens)
      val base = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      // a TIGHTER budget than the sibling tests, and the WHOLE corpus
      // injected: the seal recomputes its cuts from the chain's OWN
      // curated store, and the release witness needs the budget to
      // BIND there too (a non-binding seal admits every rank and the
      // below-cut doc would ride back in)
      val budget = 1000L
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, budget)
      val cutByLang = cuts.select($"lang", $"cut_key")
        .as[(String, Long)].collect().toMap
      def admitted() = spark.read
        .schema("doc_id LONG, lang STRING, n_tokens LONG, rank_key LONG, " +
          "cum_tokens LONG, ver LONG")
        .parquet(s"$root/admitted")
        .select($"doc_id", $"lang", $"n_tokens", $"rank_key", $"ver")
        .as[(Long, String, Long, Long, Long)].collect()
      def curatedRows() = spark.read
        .schema(PipelineE2E.curatedFullSchemaE).parquet(s"$root/curated")
        .select($"doc_id", $"lang", $"ver")
        .as[(Long, String, Long)].collect()

      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours",
        serveNprobe = 16, serveFromChain = Some(s"$sf0001/embeddings.parquet"),
        nearDup = true, nearDupLww = true,
        nearDupTtlMs = Some(30L * 86400L * 1000L),
        budgetLww = true)
      try {
        PipelineE2E.writeOplogWave(spark, docs,
          root, PipelineE2E.defaultTopology, "w1",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val w1 = admitted()
        assert(w1.nonEmpty)
        val admittedIds = w1.map(_._1).toSet
        // langs where the budget BINDS: a curated candidate was rejected
        val bindingLangs = curatedRows().filterNot(c => admittedIds(c._1))
          .map(_._2).toSet
        assert(bindingLangs.nonEmpty, "fixture: budget must bind somewhere")
        val x = w1.filter(r => bindingLangs(r._2)).map(_._1).min
        val xLang = w1.find(_._1 == x).get._2
        val xVer1 = w1.filter(_._1 == x).map(_._5).max
        // the below-cut revision: 40 tokens (passes curation), ONE
        // distinct (rank 25k — assert it IS below the lang cut)
        val lowText = (0 until 40).map(_ => "lowq").mkString(" ")
        assert(1000000L / 40L < cutByLang(xLang),
          s"fixture: the revision must rank below $xLang's cut")
        val updDoc = docs.filter($"doc_id" === x)
          .select($"doc_id", $"source", $"lang", lit(lowText).as("text"),
            $"embedding")
        PipelineE2E.writeOplogWave(spark, updDoc,
          root, PipelineE2E.defaultTopology, "wu",
          shardKey = Some(PipelineE2E.shardByLang(2)), tsOffsetSec = 5000L)
        chain.drain()

        // the DIVERGENCE, witnessed live: v2 traversed the chain to the
        // curated store (so this is admitLww's pre-filter, not an
        // upstream gate)...
        val curVers = curatedRows().filter(_._1 == x).map(_._3)
        assert(curVers.exists(_ > xVer1),
          "the revision must reach the curated manifest")
        // ...but the manifest's newest ADMITTED row for X is still v1 —
        // the old charge held (every served version stays paid)
        val w2 = admitted()
        assert(w2.filter(_._1 == x).map(_._5).max == xVer1,
          "a below-cut update must not be admitted live")

        // THE COMPACTION SEAL (the corpus_budget_update_lww
        // discipline over the chain's own store): LWW collapse by ver,
        // then the greedy budget prefix recomputed from scratch
        val curatedAll = spark.read
          .schema(PipelineE2E.curatedFullSchemaE).parquet(s"$root/curated")
        val lww = curatedAll.groupBy($"doc_id")
          .agg(max_by(struct($"lang", $"text"), $"ver").as("b"))
          .select($"doc_id", $"b.lang".as("lang"), $"b.text".as("text"))
        val sealedRows = graft.operators.Pipeline.budgetSelectGlobal(
            graft.operators.Pipeline.budgetBaseFrom(lww).localCheckpoint(),
            budget)
          .select($"doc_id", $"lang", $"n_tokens")
          .as[(Long, String, Long)].collect()
        // 1. stale charge RELEASED: X's newest version ranks below the
        //    cut, so the seal excludes the doc entirely
        assert(!sealedRows.map(_._1).contains(x),
          "the seal must release the superseded version's charge")
        // 2. conservation RESTORED: the sealed prefix fits the budget
        //    exactly, per lang
        sealedRows.groupBy(_._2).foreach { case (lang, rows) =>
          assert(rows.map(_._3).sum <= budget,
            s"seal over budget in $lang")
        }
        // 3. the freed tokens are RE-SPENT: the seal admits a lang-mate
        //    the live manifest rejected
        val liveNewest = w2.groupBy(_._1).map(_._2.maxBy(_._5)).map(_._1).toSet
        assert(sealedRows.exists(r => r._2 == xLang && !liveNewest(r._1)),
          s"released budget in $xLang must admit a previously-rejected doc")
      } finally chain.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }

  /** the shared two-wave protocol; `indexed` switches the serve to the
    * admit-time-indexed form (cell assigned in the budget stage, serve
    * reads the manifest as the index — no curated-store re-read). */
  private def runChainServe(indexed: Boolean): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-chainserve")
      .toFile.getAbsolutePath
    val scratch = java.nio.file.Files.createTempDirectory("graft-e2e-csq")
    try {
      val docs = uniqueDocsE.localCheckpoint()
      val cap = docs.groupBy($"source").count().agg(max($"count"))
        .head().getLong(0).toInt + 1
      val gated = docs.filter(
        size(TextFns.tokens($"text")) >= CurationStream.QualityMinTokens)
      val base = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, Budget)
      val vecs: Map[Long, Array[Double]] =
        graft.Tables.load(spark, sf0001, "embeddings")
          .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
          .map { case (id, e) => id -> e.map(_.toDouble) }.toMap
      def addQueries(pred: org.apache.spark.sql.Column, name: String): Unit = {
        val tmp = scratch.resolve(name)
        spark.read.parquet(s"$sf0001/embeddings.parquet").filter(pred)
          .coalesce(1).write.parquet(tmp.toString)
        val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath,
          java.nio.file.Paths.get(s"$root/queries/$name.parquet"))
        ()
      }
      def served() = spark.read.json(s"$root/serve/batch=*")
        .select($"data.qid".as("qid"), $"data.step".cast("int").as("step"),
          $"data.vec_id".as("vec_id"), $"data.mmr_score".as("mmr_score"))
        .as[(Long, Int, Long, Long)].collect()
      def admittedIds() = spark.read.schema(PipelineE2E.admitSchema)
        .parquet(s"$root/admitted").select($"doc_id").as[Long].collect().toSet

      val chain = PipelineE2E.startLive(spark, root,
        hist.localCheckpoint(), cuts.localCheckpoint(), cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours",
        serveNprobe = 16, serveFromChain = Some(s"$sf0001/embeddings.parquet"),
        serveIndexedAdmit = indexed)
      try {
        // ---- wave 1 → drain → queries 0..3 serve the W1 corpus ----
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" < WaveSplit),
          root, PipelineE2E.defaultTopology, "w1",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val admitW1 = admittedIds()
        assert(admitW1.nonEmpty)
        // the chain store, not the fixture, carries the vectors
        val curatedVecIds = spark.read
          .schema("doc_id LONG, embedding ARRAY<DOUBLE>")
          .parquet(s"$root/curated").filter($"embedding".isNotNull)
          .select($"doc_id").as[Long].collect().toSet
        assert(admitW1.subsetOf(curatedVecIds),
          "every admitted doc must carry its embedding through curation")
        if (indexed) {
          // the manifest is the index: every admitted row landed with
          // the cell/norm the budget stage assigned — recompute both
          // in the driver with the same codebook and kernels
          val cb = VectorServeStream.codebookFrom(
            spark, s"$sf0001/embeddings.parquet")
          val idx = spark.read.schema(PipelineE2E.admitSchemaE)
            .parquet(s"$root/admitted")
            .select($"doc_id", $"cell", $"nrm", $"embedding")
            .as[(Long, Int, Double, Array[Double])].collect()
          assert(idx.nonEmpty)
          idx.foreach { case (id, cell, nrm, emb) =>
            assert(cell == VectorServeStream.cellOf(cb, emb),
              s"doc $id landed in cell $cell, kernel says ${VectorServeStream.cellOf(cb, emb)}")
            assert(nrm == VectorServeStream.normOf(emb),
              s"doc $id norm mismatch")
          }
        }
        addQueries(col("vec_id") < 4, "qa")
        chain.drain()
        val phase1 = served()
        assert(phase1.map(t => (t._1, t._2, t._3, t._4)).toSet ==
          replay(0L until 4L, admitW1, vecs),
          "between-wave queries must serve exactly the wave-1 admitted " +
            "corpus from chain-carried vectors")

        // ---- wave 2 → drain → queries 4..7 serve the GROWN corpus ----
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" >= WaveSplit),
          root, PipelineE2E.defaultTopology, "w2",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain.drain()
        val admitW2 = admittedIds()
        assert(admitW2.size > admitW1.size, "wave 2 must admit more")
        addQueries(col("vec_id") >= 4 && col("vec_id") < 8, "qb")
        chain.drain()
        val phase2 = served()
        val bHits = phase2.filter(t => t._1 >= 4 && t._1 < 8)
          .map(t => (t._1, t._2, t._3, t._4)).toSet
        assert(bHits == replay(4L until 8L, admitW2, vecs),
          "post-wave-2 queries must serve exactly the grown admitted corpus")
        // wave-1 answers immutable (epochs never rewritten)
        val aBefore = phase1.filter(_._1 < 4).sorted.toSeq
        val aAfter = phase2.filter(_._1 < 4).sorted.toSeq
        assert(aAfter == aBefore, "a wave-1 serve epoch changed after wave 2")
      } finally chain.stop()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }
}
