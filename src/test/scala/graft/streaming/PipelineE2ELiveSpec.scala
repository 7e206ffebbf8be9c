package graft.streaming

import graft.SparkSuite
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE CHAIN, LIVE — all stages up CONCURRENTLY
  * ([[PipelineE2E.startLive]]), oplog traffic arriving in two WAVES,
  * and the WHOLE chain killed and restarted from its checkpoints
  * between them. What this adds over PipelineE2ESpec's sequential
  * drain: (a) data cascades through the directory handoffs while every
  * consumer is already tailing them (the sink-metadata / path-tracking
  * handoff under concurrency), and (b) chain-level exactly-once —
  * five stages' checkpointed state (quorum counters, apply LWW,
  * curation dedup+cap, budget cumsums, FFD open-bin remainders) all
  * resume mid-corpus and the terminal tables STILL come out exact.
  *
  * Determinism design: content-unique corpus (dedup survivor identity
  * is batching-dependent, CurationComposedStreamSpec's subject); cap
  * above every per-source count (a cross-batch cap pick is inherently
  * greedy — capped-member identity is the sequential spec's subject,
  * at one batch); waves split by doc_id, so per-group arrival order
  * respects the batch fold order for admission (budget EXACT), while
  * packing folds FFD per wave / first-fit across waves — pinned
  * against a driver replay of the shipped kernel, and proven to fill
  * PRE-restart open bins with POST-restart docs. Sharding is BY LANG
  * ([[PipelineE2E.shardByLang]] — a collection sharded on language):
  * each budget group's rows then ride one index epoch per wave, so
  * per-group arrival order survives the shards' independent,
  * concurrently-triggering pipelines (under doc_id-mod sharding a
  * group mixes shards and greedy admission legitimately deviates —
  * a property of the shard key, not the chain). */
class PipelineE2ELiveSpec extends SparkSuite {

  private val Budget = 2000L
  private val WaveSplit = 250L

  private def uniqueDocs: DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.Tables.load(spark, sf0001, "documents")
      .withColumn("rk", row_number().over(
        Window.partitionBy(TextFns.fingerprint(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1).drop("rk")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
  }

  test("live chain: two waves, full kill/restart between, terminals exact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-live")
      .toFile.getAbsolutePath
    try {
      val docs = uniqueDocs.localCheckpoint()
      val cap = docs.groupBy($"source").count().agg(max($"count"))
        .head().getLong(0).toInt + 1   // never truncates: live cap picks stay deterministic
      // batch replay of curation under an uncapping cap: gate + split
      val gated = docs.select($"doc_id", $"source", $"lang", $"text",
          size(TextFns.tokens($"text")).cast("long").as("n_tokens"),
          md5($"doc_id".cast("string")).as("mh"))
        .filter($"n_tokens" >= CurationStream.QualityMinTokens)
        .withColumn("h2", substring($"mh", 1, 2))
        .withColumn("split", when($"h2" < "cd", "train")
          .when($"h2" < "e6", "val").otherwise("test"))
        .localCheckpoint()
      // admission static side from the (known-final) curated snapshot,
      // exactly the deployed shape: previous snapshot in, broadcast out
      val base = graft.operators.Pipeline.budgetBaseFrom(
        gated.select($"doc_id", $"lang", $"text")).localCheckpoint()
      val (hist, cuts) = graft.operators.Pipeline.budgetHistCuts(base, Budget)
      val histB = hist.localCheckpoint()
      val cutsB = cuts.localCheckpoint()

      // ---- wave 1 → drain → KILL EVERYTHING ----
      // apply lateness must cover CROSS-PUBLISHER event-time skew: the
      // synthetic clock spans the whole corpus (~500 s of doc_id
      // seconds), and shard epochs can arrive in either order
      val chain1 = PipelineE2E.startLive(spark, root, histB, cutsB, cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours")
      try {
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" < WaveSplit),
          root, PipelineE2E.defaultTopology, "w1",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain1.drain()
      } finally chain1.stop()
      val admittedAfterW1 = spark.read.schema(PipelineE2E.admitSchema)
        .parquet(s"$root/admitted").count()
      assert(admittedAfterW1 > 0, "wave 1 must flow end to end before the kill")

      // ---- restart the WHOLE chain from checkpoints → wave 2 ----
      val chain2 = PipelineE2E.startLive(spark, root, histB, cutsB, cap = cap,
        applyLateness = "6 hours", curationDelay = "6 hours")
      try {
        PipelineE2E.writeOplogWave(spark, docs.filter($"doc_id" >= WaveSplit),
          root, PipelineE2E.defaultTopology, "w2",
          shardKey = Some(PipelineE2E.shardByLang(2)))
        chain2.drain()
      } finally chain2.stop()

      // ---- terminal 1: materialized store == the corpus ----
      val applied = spark.read.schema(PipelineE2E.docSchema)
        .parquet(PipelineE2E.docsGlob(root))
      assert(applied.exceptAll(docs).isEmpty && docs.exceptAll(applied).isEmpty,
        "live materialized store drifted from the CDC input corpus")

      // ---- terminal 2: curated manifest == batch gate+split (uncapped) ----
      val curated = spark.read.schema(PipelineE2E.curatedFullSchema)
        .parquet(s"$root/curated")
      val wantCurated = gated.select($"doc_id", $"source", $"lang",
        $"n_tokens", $"split", $"text")
      assert(curated.exceptAll(wantCurated).isEmpty &&
        wantCurated.exceptAll(curated).isEmpty,
        "live curated manifest != batch gate+split replay")

      // ---- terminal 3: admitted == batch 2-phase selection, EXACT
      // (waves split by doc_id ⇒ per-group arrival order = fold order,
      // with the budget cumsum state carried ACROSS the restart) ----
      val admitted = spark.read.schema(PipelineE2E.admitSchema)
        .parquet(s"$root/admitted")
      val wantAdmit = graft.operators.Pipeline.budgetSelect2Phase(base, Budget)
      assert(admitted.exceptAll(wantAdmit).isEmpty &&
        wantAdmit.exceptAll(admitted).isEmpty,
        "live admitted manifest != batch budgetSelect2Phase")
      assert(admitted.count() > admittedAfterW1,
        "wave 2 must admit more rows against the carried cumsum state")

      // ---- terminal 4: published layout == driver replay of the
      // shipped kernel over (wave-1 admitted, then wave-2 admitted) ----
      val admitRows = admitted
        .select($"doc_id", $"lang", $"n_tokens").as[(Long, String, Long)]
        .collect()
      val expected = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
      val expAssign = Seq.newBuilder[(Long, String, Long, Long, Long)]
      Seq(admitRows.filter(_._1 < WaveSplit), admitRows.filter(_._1 >= WaveSplit))
        .foreach { wave =>
          wave.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (lang, rs) =>
            val rem = expected.getOrElseUpdate(lang,
              scala.collection.mutable.ArrayBuffer.empty[Long])
            rs.sortBy(r => (r._3 > 512L, -r._3, r._1)).foreach { case (id, _, n) =>
              if (n <= 512L) {
                val b = graft.operators.Pipeline.ffdPlace(rem, n, 512L)
                expAssign += ((id, lang, n, b.toLong, b.toLong))
              } else {
                val runs = (n + 511L) / 512L
                val first = rem.length.toLong
                (1L to runs).foreach(_ => rem += 0L)
                expAssign += ((id, lang, n, first, first + runs - 1L))
              }
            }
          }
        }
      val want = expAssign.result()
        .toDF("doc_id", "lang", "n_tokens", "bin_first", "bin_last")
      val layout = spark.read.json(s"$root/layout/ffd")
        .select($"data.doc_id", $"data.lang", $"data.n_tokens",
          $"data.bin_first", $"data.bin_last")
      assert(layout.exceptAll(want).isEmpty && want.exceptAll(layout).isEmpty,
        "live published layout != kernel replay over the two admitted waves")

      // cross-restart state reuse made visible: some wave-2 doc landed
      // in a bin OPENED BEFORE the restart
      val w1Bins = want.filter($"doc_id" < WaveSplit)
        .agg(max($"bin_last")).head().getLong(0)
      val reused = layout.filter($"doc_id" >= WaveSplit &&
        $"bin_first" <= w1Bins).count()
      assert(reused > 0,
        "no post-restart doc first-fit into a pre-restart open bin — state did not carry")
    } finally {
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    }
  }
}
