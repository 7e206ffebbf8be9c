package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UPDATE-AWARE budget admission ([[TokenBudgetStream.admitLww]]) —
  * the refund-or-restore ledger pinned batch boundary by batch
  * boundary on a rank-engineered corpus:
  *
  *  - an update REFUNDS the old charge and re-charges the newest
  *    version (a follow-up doc that fits ONLY post-refund is
  *    admitted — the exact arrival the segment-model accounting
  *    rejects);
  *  - an update that does NOT fit is rolled back whole (the old
  *    version stays paid — a follow-up that would fit only under a
  *    leaked refund is rejected);
  *  - a stale replay is a no-op;
  *  - an update can move groups (the refund crosses rank_key);
  *  - with no updates, one drained batch admits exactly what
  *    [[TokenBudgetStream.admitCarry]] admits (same rows, positions).
  *
  * Texts are engineered to exact (n_tokens, n_distinct): `words(n, d)`
  * emits n tokens of which d are distinct, so rank_key = d·10⁶ div n
  * is chosen, not discovered. */
class TokenBudgetLwwSpec extends SparkSuite {

  /** n tokens, d distinct: d unique words then n−d repeats of the
    * first word. */
  private def words(n: Int, d: Int, tag: String): String =
    ((0 until d).map(i => s"${tag}_w$i") ++
      Seq.fill(n - d)(s"${tag}_w0")).mkString(" ")

  private def docsDf(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, text, ver) =>
      (id, "en", text, Array(1.0, 2.0), ver)
    }.toDF("doc_id", "lang", "text", "embedding", "ver")
  }

  /** snapshot → (hist, cuts) at `budget`. */
  private def histCuts(snapshot: Seq[(Long, String, Long)], budget: Long) = {
    val base = graft.operators.Pipeline.budgetBaseFrom(
      docsDf(snapshot).select(col("doc_id"), col("lang"), col("text")))
      .localCheckpoint()
    val (h, c) = graft.operators.Pipeline.budgetHistCuts(base, budget)
    (h.localCheckpoint(), c.localCheckpoint())
  }

  /** drive admitLww over sequential micro-batches (one file each),
    * returning every admitted (doc_id, ver, n_tokens, rank_key). */
  private def drive(hist: DataFrame, cuts: DataFrame, queryName: String,
      batches: Seq[Seq[(Long, String, Long)]]): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory(s"graft-lww-$queryName")
    val scratch = java.nio.file.Files.createTempDirectory(s"graft-lwws-$queryName")
    try {
      val schema = docsDf(Seq((0L, "x", 1L))).schema
      val stream = spark.readStream.schema(schema).parquet(in.toString)
      val q = TokenBudgetStream.admitLww(stream, hist, cuts)
        .writeStream.format("memory").queryName(queryName)
        .outputMode("append").start()
      try {
        batches.zipWithIndex.foreach { case (rows, i) =>
          val tmp = scratch.resolve(s"b$i")
          docsDf(rows).coalesce(1).write.parquet(tmp.toString)
          val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.copy(part.toPath, in.resolve(s"b$i.parquet"))
          q.processAllAvailable()
        }
        spark.table(queryName)
          .select($"doc_id", $"ver", $"n_tokens", $"rank_key")
          .as[(Long, Long, Long, Long)].collect().toSet
      } finally q.stop()
    } finally {
      Seq(in, scratch).foreach(d =>
        new scala.reflect.io.Directory(d.toFile).deleteRecursively())
    }
  }

  test("refund admits what segment accounting rejects; a rejected update restores") {
    // ONE boundary group: every doc all-distinct (rank 10⁶); snapshot
    // mass 150 > budget 100 ⇒ cut at 10⁶, residual = 100
    val (hist, cuts) = histCuts(Seq((900L, words(150, 150, "snap"), 1L)), 100L)
    val got = drive(hist, cuts, "lww_refund", Seq(
      // b0: A(40) + B(30) admitted — cum 70
      Seq((1L, words(40, 40, "a1"), 1L), (2L, words(30, 30, "b1"), 1L)),
      // b1: A→v2(60): refund 40, cum 30+60 = 90 ≤ 100 → admitted
      Seq((1L, words(60, 60, "a2"), 2L)),
      // b2: C(10): cum 100 → admitted ONLY because A's v1 was
      // refunded (segment accounting: 40+30+60+10 = 140 > 100)
      Seq((3L, words(10, 10, "c1"), 1L)),
      // b3: B→v2(80): refund 30 → 70+80 = 150 > 100 → reject, RESTORE
      Seq((2L, words(80, 80, "b2"), 2L)),
      // b4: D(5): cum 105 > 100 → rejected — proves the restore (a
      // leaked refund would leave cum 75 and admit D)
      Seq((4L, words(5, 5, "d1"), 1L)),
      // b5: stale replay of B v1 — no-op, no duplicate emission
      Seq((2L, words(30, 30, "b1"), 1L))))
    val expected = Set(
      (1L, 1L, 40L, 1000000L), (2L, 1L, 30L, 1000000L),
      (1L, 2L, 60L, 1000000L), (3L, 1L, 10L, 1000000L))
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // conservation: newest admitted versions sum to ≤ residual
    val newest = got.groupBy(_._1).map(_._2.maxBy(_._2)._3).sum
    assert(newest == 100L && newest <= 100L)
  }

  test("an update that moves groups refunds across rank_key") {
    // two groups: H (rank 10⁶, above cut — unlimited) and M (rank
    // 5·10⁵, the boundary); snapshot 150 tokens each, budget 200 ⇒
    // cut at 5·10⁵ with residual 50
    val (hist, cuts) = histCuts(Seq(
      (900L, words(150, 150, "snapH"), 1L),
      (901L, words(150, 75, "snapM"), 1L)), 200L)
    val got = drive(hist, cuts, "lww_move", Seq(
      // b0: F v1 in M (40 tokens) — charge 40 ≤ 50
      Seq((10L, words(40, 20, "f1"), 1L)),
      // b1: F v2 in H (30 distinct) — refund M whole, admit in H
      Seq((10L, words(30, 30, "f2"), 2L)),
      // b2: G in M (48 tokens): 48 ≤ 50 ONLY because F's M charge
      // moved out (segment accounting: 40+48 = 88 > 50)
      Seq((11L, words(48, 24, "g1"), 1L))))
    val expected = Set(
      (10L, 1L, 40L, 500000L), (10L, 2L, 30L, 1000000L),
      (11L, 1L, 48L, 500000L))
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("no updates ⇒ admitLww equals admitCarry (rows and positions)") {
    import spark.implicits._
    // fresh mixed-rank corpus, all ver 1, one drained batch
    val corpus = (0 until 30).map { i =>
      val (n, d) = if (i % 2 == 0) (10 + i, 10 + i) else (20 + i, (20 + i) / 2)
      (i.toLong, words(n, d, s"p$i"), 1L)
    }
    val (hist, cuts) = histCuts(corpus, 300L)
    val lww = drive(hist, cuts, "lww_parity", Seq(corpus))
    val carry = TokenBudgetStream.admitCarry(
        docsDf(corpus), hist, cuts)
      .select($"doc_id", $"ver", $"n_tokens", $"rank_key")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(lww == carry, s"missing=${carry -- lww} extra=${lww -- carry}")
  }
}
