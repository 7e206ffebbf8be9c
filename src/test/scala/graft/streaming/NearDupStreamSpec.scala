package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** The live MinHash-LSH admission gate ([[NearDupStream]]) against
  * three independent grounds on the REAL corpus:
  *
  *  1. a driver replay of the exact discipline (bucket claim in doc_id
  *     order, find-first claimant at ≥ 32/64 agreeing positions,
  *     verdict = min matched claimant) over the same two-wave arrival;
  *  2. the batch `dedup_minhash_lsh` operator: flagged docs = the
  *     batch components' non-canonicals, and the estimator agrees with
  *     the batch's exact-Jaccard verify on every verified pair;
  *  3. a kill/restart between the waves — wave-2 members of classes
  *     whose canonical arrived in wave 1 must match claimants restored
  *     from the state store.
  */
class NearDupStreamSpec extends SparkSuite {

  private val Tau = NearDupStream.DefaultTau64

  private def corpus = graft.Tables.load(spark, sf0001, "documents")
    .select(col("doc_id"), col("text"))

  /** per-doc sketch + band rows, collected once (fixture-sized). */
  private lazy val (sigs, bands): (Map[Long, Array[Long]], Map[Long, Seq[(Int, Long)]]) = {
    import spark.implicits._
    val s = corpus.as[(Long, String)].collect().flatMap { case (id, t) =>
      graft.operators.Dedup.sketchText(t).map(mh => id -> mh)
    }.toMap
    val b = graft.operators.Dedup.minhashBandRows(spark, corpus)
      .select($"doc_id", $"b", $"bh").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => (r._2, r._3)).toSeq }
    (s, b)
  }

  /** driver replay of the kernel discipline over arrival waves. */
  private def replay(waves: Seq[Seq[Long]]): Map[Long, Option[Long]] = {
    val buckets = mutable.Map.empty[(Int, Long), mutable.ArrayBuffer[(Long, Array[Long])]]
    val verdict = mutable.Map.empty[Long, Option[Long]]
    for (wave <- waves; id <- wave.sorted if sigs.contains(id)) {
      val mh = sigs(id)
      var hits = List.empty[Long]
      for ((b, bh) <- bands(id)) {
        val cl = buckets.getOrElseUpdate((b, bh), mutable.ArrayBuffer.empty)
        cl.find(c => NearDupStream.sim64(c._2, mh) >= Tau) match {
          case Some(c) => hits ::= c._1
          case None    => cl += ((id, mh)); ()
        }
      }
      verdict(id) = if (hits.isEmpty) None else Some(hits.min)
    }
    verdict.toMap
  }

  test("two waves with kill/restart: stream == replay == batch components") {
    import spark.implicits._
    val ids = sigs.keys.toSeq.sorted
    val split = ids(ids.length / 2)
    val root = java.nio.file.Files.createTempDirectory("graft-neardup")
    java.nio.file.Files.createDirectory(root.resolve("in"))
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = root.resolve(s"scr-$name")
      corpus.filter(pred).coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, root.resolve(s"in/$name.parquet"))
      ()
    }
    // verdicts folded PER BATCH (the deployed shape — every band row of
    // a doc rides its own micro-batch), accumulated across the restart
    val verdicts = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long])]()
    def start() = {
      val src = spark.readStream.schema(corpus.schema)
        .parquet(root.resolve("in").toString)
      NearDupStream.flag(src)
        .writeStream
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupBand], _: Long) =>
          NearDupStream.fold(b.toDF())
            .as[(Long, Option[Long], Int)].collect()
            .foreach(r => verdicts.add((r._1, r._2)))
          ()
        }
        .start()
    }
    try {
      // wave 1 → drain → KILL; wave 2 against the restored state
      val q1 = start()
      try { addFile(col("doc_id") < split, "w1"); q1.processAllAvailable() }
      finally q1.stop()
      val q2 = start()
      try { addFile(col("doc_id") >= split, "w2"); q2.processAllAvailable() }
      finally q2.stop()

      val got = verdicts.toArray(Array.empty[(Long, Option[Long])]).toMap

      // ---- ground 1: the driver replay, doc for doc ----
      val want = replay(Seq(ids.filter(_ < split), ids.filter(_ >= split)))
      assert(got == want,
        s"stream/replay divergence: ${(got.toSet -- want.toSet).take(5)} vs ${(want.toSet -- got.toSet).take(5)}")

      // ---- ground 2: the batch operator ----
      val pairs = graft.operators.Dedup.minhashLsh.run(spark, sf0001)
        .select($"d1", $"d2").as[(Long, Long)].collect()
      assert(pairs.nonEmpty, "fixture lost its planted near-dup pairs")
      // est-vs-exact verify agreement on every batch-verified pair
      pairs.foreach { case (a, b) =>
        assert(NearDupStream.sim64(sigs(a), sigs(b)) >= Tau,
          s"estimator disagrees with exact verify on batch pair ($a,$b)")
      }
      // batch components (union-find) → non-canonicals
      val parent = mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      val nonCanonical = inPairs.filter(d => find(d) != d)
      val flagged = got.collect { case (d, Some(_)) => d }.toSet
      assert(flagged == nonCanonical,
        s"flagged set != batch non-canonicals: extra=${(flagged -- nonCanonical).take(5)} missing=${(nonCanonical -- flagged).take(5)}")
      // canonical attribution: dup_of = the batch component minimum
      flagged.foreach { d =>
        assert(got(d).contains(find(d)),
          s"doc $d: dup_of ${got(d)} != batch canonical ${find(d)}")
      }

      // ---- ground 3: state carried across the restart ----
      val crossWave = flagged.filter(d => d >= split && got(d).exists(_ < split))
      assert(crossWave.nonEmpty,
        "no wave-2 doc matched a wave-1 claimant — restart case did not bite")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }

  test("gate plan: one keyed exchange, no joins, no corpus rescan") {
    // batch execution of the same Dataset program (state empty, one
    // pass) exposes the physical shape the streaming planner inherits:
    // sketch + band explode are narrow, the ONLY shuffle is the
    // (band, band-hash) keyed exchange into the stateful operator, and
    // nothing joins — the kernel never rescans the corpus, which is
    // the whole point vs the batch candidate self-join
    val p = NearDupStream.flag(corpus).queryExecution.executedPlan.toString
    val exchanges = "ShuffleExchange|Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 keyed exchange, plan:\n${p.take(600)}")
    assert(!p.contains("Join"), s"gate must not join:\n${p.take(600)}")
  }

  test("bounded state: idle buckets expire, fresh claims still gate") {
    import spark.implicits._
    // class A = identical text (est-sim 64); docs 50/51 unrelated
    // traffic that advances the watermark past A's bucket deadlines
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words about spark catalyst optimizer internals"
    // clock offset off epoch: under EventTimeTimeout this build drops
    // rows at ts <= watermark, and the initial watermark IS the epoch
    // (AttributionWatermarkSpec's pin) — an ets of 0 s would vanish
    def wave(rows: Seq[(Long, String, Long)]) =
      rows.toDF("doc_id", "text", "s")
        .select($"doc_id", $"text",
          timestamp_seconds($"s" + 86400L).as("ets"))
    val root = java.nio.file.Files.createTempDirectory("graft-neardup-ttl")
    java.nio.file.Files.createDirectory(root.resolve("in"))
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = root.resolve(s"scr-$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, root.resolve(s"in/$name.parquet"))
      ()
    }
    val schema = wave(Seq((0L, a, 0L))).schema
    def drive(ttlMs: Option[Long], ckpt: String): Map[Long, Option[Long]] = {
      val verdicts = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Long])]()
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(root.resolve("in").toString)
      val flagged = ttlMs match {
        case Some(t) => NearDupStream.flagExpiring(src, t)
        case None    => NearDupStream.flag(src.drop("ets"))
      }
      val q = flagged.writeStream
        .option("checkpointLocation", root.resolve(ckpt).toString)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupBand], _: Long) =>
          NearDupStream.fold(b.toDF())
            .as[(Long, Option[Long], Int)].collect()
            .foreach(r => verdicts.add((r._1, r._2)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      verdicts.toArray(Array.empty[(Long, Option[Long])]).toMap
    }
    try {
      // one file per trigger, in name order: b1 claims, b2 advances the
      // watermark, b3 fires the timeouts, b4 re-tests the class
      addFile(wave(Seq((1L, a, 0L), (2L, a, 10L))), "b1")
      addFile(wave(Seq((50L, other, 2000L))), "b2")
      addFile(wave(Seq((51L, other + " more", 2005L))), "b3")
      addFile(wave(Seq((3L, a, 2100L), (4L, a, 2110L))), "b4")

      val ttl = drive(ttlMs = Some(600000L), "ckpt_ttl")
      assert(ttl(2L).contains(1L), s"in-horizon dup not flagged: ${ttl.get(2L)}")
      // the expiry trade, stated by the scaladoc: class A idle past the
      // horizon → doc 3 is ADMITTED and re-claims
      assert(ttl(3L).isEmpty, s"doc 3 should be admitted after expiry: ${ttl.get(3L)}")
      // ...and the fresh claim gates again within the same batch
      assert(ttl(4L).contains(3L), s"post-expiry claim did not gate: ${ttl.get(4L)}")

      // contrast: the unbounded gate flags doc 3 against the original claimant
      val unbounded = drive(ttlMs = None, "ckpt_unbounded")
      assert(unbounded(3L).contains(1L),
        s"unbounded gate should remember doc 1: ${unbounded.get(3L)}")
      assert(unbounded(4L).contains(1L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }
}
