package graft.streaming

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.streaming.TestGroupState

/** ScalaCheck properties for the update-aware admission kernel
  * ([[TokenBudgetStream.admitLww]]'s per-lang fold), driven directly
  * through `TestGroupState` over GENERATED arrival histories — random
  * corpora, random version counts, random group moves, random batch
  * splits, out-of-order version arrivals. The streamed fixture spec
  * (TokenBudgetLwwSpec) pins engineered scenarios; this pins the
  * LEDGER INVARIANTS over the space of histories:
  *
  *  1. CONSERVATION — for every finitely-limited group, the sum of
  *     each doc's CURRENT charge (its newest emitted version) never
  *     exceeds the group limit. This is the invariant the
  *     refund-or-restore discipline exists for: a leaked refund on a
  *     rejected update (restore bug) or a double-charge on an
  *     accepted one (refund bug) both break it under the right
  *     interleaving.
  *  2. AT-MOST-ONCE — no (doc, ver) is emitted twice (stale replays
  *     and within-batch duplicates are no-ops).
  *  3. MONOTONE — a doc's emitted versions strictly increase over the
  *     history (an older version never displaces a newer charge).
  */
object BudgetLwwPropertySpec extends Properties("AdmitLww") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private case class Arrival(doc: Long, ver: Long, tokens: Long, group: Long)

  private def seqGen[T](gens: Seq[Gen[T]]): Gen[Seq[T]] =
    gens.foldLeft(Gen.const(Seq.empty[T]))((acc, g) =>
      acc.flatMap(xs => g.map(xs :+ _)))

  /** deterministic seeded shuffle (the printed history reproduces). */
  private def shuffle[T](xs: Seq[T], seed: Long): Seq[T] =
    new scala.util.Random(seed).shuffle(xs)

  private val genHistory: Gen[(Seq[Seq[Arrival]], Map[Long, Long])] = for {
    nDocs <- Gen.choose(1, 12)
    limit0 <- Gen.choose(20L, 80L)
    limit2 <- Gen.choose(5L, 25L)
    docs <- seqGen((0 until nDocs).map { d =>
      for {
        nVers <- Gen.choose(1, 3)
        vers <- seqGen((1 to nVers).map { v =>
          for {
            t <- Gen.choose(1L, 30L)
            g <- Gen.oneOf(0L, 1L, 2L)
          } yield (v.toLong, t, g)
        })
      } yield (d.toLong, vers)
    })
    // arrivals in RANDOM global order (older versions may arrive after
    // newer ones — the stale-skip path), split into 1..5 batches
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    nBatches <- Gen.choose(1, 5)
  } yield {
    val shuffled = shuffle(
      docs.flatMap { case (d, vs) => vs.map(v => Arrival(d, v._1, v._2, v._3)) },
      seed)
    val limits = Map(0L -> limit0, 1L -> Long.MaxValue, 2L -> limit2)
    val size = math.max(1, shuffled.size / nBatches)
    (shuffled.grouped(size).toSeq, limits)
  }

  property("conservation, at-most-once, monotone versions") =
    Prop.forAll(genHistory) { case (batches, limits) =>
      var state: Option[TokenBudgetStream.BudgetLwwState] = None
      val emitted = Seq.newBuilder[BudgetAdmitE]
      batches.foreach { batch =>
        val rows = batch.map(a => BudgetRowE(a.doc, "en", a.tokens,
          a.group, 0L, limits(a.group), Array(1.0), a.ver))
        import org.apache.spark.api.java.Optional
        val gs = TestGroupState.create[TokenBudgetStream.BudgetLwwState](
          state.fold(Optional.empty[TokenBudgetStream.BudgetLwwState]())(Optional.of),
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
          0L, Optional.empty[Long](), false)
        emitted ++= TokenBudgetStream.admitGroupLww("en", rows.iterator, gs)
        if (gs.exists) state = Some(gs.get)
      }
      val out = emitted.result()

      // 2. at-most-once per (doc, ver)
      val keys = out.map(e => (e.doc_id, e.ver))
      val atMostOnce = keys.distinct.size == keys.size

      // 3. monotone versions per doc over emission order
      val monotone = out.groupBy(_.doc_id).values.forall { es =>
        es.map(_.ver).sliding(2).forall {
          case Seq(a, b) => a < b
          case _ => true
        }
      }

      // 1. conservation: final charge of a doc = its newest emitted
      // version (a rejected update emits nothing and keeps the old
      // charge); per finitely-limited group the charges must fit
      val charges = out.groupBy(_.doc_id).values.map(_.maxBy(_.ver))
      val conserved = charges.groupBy(_.rank_key).forall { case (g, cs) =>
        limits(g) == Long.MaxValue || cs.map(_.n_tokens).sum <= limits(g)
      }

      val ok = atMostOnce && monotone && conserved
      if (!ok) println(s"[lwwprop] limits=$limits\n  batches=$batches\n  " +
        s"out=${out.map(e => (e.doc_id, e.ver, e.n_tokens, e.rank_key))}\n  " +
        s"atMostOnce=$atMostOnce monotone=$monotone conserved=$conserved")
      ok
    }
}
