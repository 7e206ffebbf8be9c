package graft.streaming

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.streaming.TestGroupState

/** ScalaCheck properties for the UPDATE-AWARE bucket kernel's
  * epoch-ordered replay ([[NearDupStream.bucketGroupLww]] — the
  * round-17 ADVICE fix), driven directly through `TestGroupState`
  * over GENERATED epoch histories: random docs, random updates
  * (retire + re-arrival, possibly changing content family), random
  * timeout retires, random within-batch row order.
  *
  * THE invariant: **bundling is invisible.** A catch-up trigger that
  * bundles any number of registry epochs — in ANY physical row
  * order — must emit exactly what the one-trigger-per-epoch
  * sequential drive emits, and leave identical bucket state. This is
  * the property the stamped-epoch replay exists for; the engineered
  * hazards (late timeout-retire ahead of an early arrival, an update
  * bundled with its own previous version) are points inside this
  * space, so 200 generated histories sweep far beyond the
  * spec-pinned cases. */
object NearDupLwwPropertySpec extends Properties("BucketLwwEpochReplay") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  /** content-family signatures: same family ⇒ 48/64 agreement
    * (≥ tau64 = 32, flags); cross-family ⇒ 0 (never flags). The last
    * 16 positions are doc-unique so same-family sigs are not equal. */
  private def sig(fam: Int, doc: Long): Array[Long] =
    Array.tabulate(64)(i =>
      if (i < 48) fam.toLong * 1000L else doc * 7919L + i)

  private def arrival(d: Long, v: Long, e: Long, fam: Int) =
    NearDupStream.BandMsg(d, v, e, 0, 0L, retire = false, sig(fam, d),
      Some(s"p$d-$v"))
  private def retire(d: Long, v: Long, e: Long) =
    NearDupStream.BandMsg(d, v, e, 0, 0L, retire = true,
      Array.empty[Long], None)

  /** one generated history: per epoch, each doc either stays quiet,
    * first-arrives, UPDATES (retire old ver + arrive new, family may
    * change — the registry's one-RegMsg-per-doc invariant holds: at
    * most one action per doc per epoch), or TIMEOUT-retires (strip
    * and forget — a later re-arrival claims fresh at ver 1 again is
    * not modeled; the registry would re-register, so re-arrivals use
    * a bumped ver). */
  private val genHistory: Gen[Seq[Seq[NearDupStream.BandMsg]]] = for {
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    nDocs <- Gen.choose(1, 6)
    nEpochs <- Gen.choose(1, 8)
  } yield {
    val rnd = new scala.util.Random(seed)
    var reg = Map.empty[Long, (Long, Int)] // doc -> (ver, fam)
    (0 until nEpochs).map { e =>
      (0L until nDocs.toLong).flatMap { d =>
        if (rnd.nextBoolean()) Seq.empty
        else reg.get(d) match {
          case None =>
            val fam = rnd.nextInt(3)
            val v = 1L
            reg += d -> (v, fam)
            Seq(arrival(d, v, e.toLong, fam))
          case Some((v, _)) => rnd.nextInt(3) match {
            case 0 => // update: retire the old claims, arrive anew
              val nf = rnd.nextInt(3)
              reg += d -> (v + 1, nf)
              Seq(retire(d, v + 1, e.toLong), arrival(d, v + 1, e.toLong, nf))
            case 1 => // idle timeout: the registry's ver+1 retire
              reg -= d
              Seq(retire(d, v + 1, e.toLong))
            case _ => Seq.empty
          }
        }
      }
    }
  }

  /** deterministic seeded shuffle (a failing history reproduces). */
  private def shuffle[T](xs: Seq[T], seed: Long): Seq[T] =
    new scala.util.Random(seed).shuffle(xs)

  private def drive(batches: Seq[Seq[NearDupStream.BandMsg]])
      : (Seq[(Long, Long, Int)], Seq[(Long, Long)]) = {
    import org.apache.spark.api.java.Optional
    var state: Option[NearDupStream.BucketStateV] = None
    val out = Seq.newBuilder[NearDupStream.NearDupBandP]
    batches.foreach { b =>
      val gs = TestGroupState.create[NearDupStream.BucketStateV](
        state.fold(Optional.empty[NearDupStream.BucketStateV]())(Optional.of),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        0L, Optional.empty[Long](), false)
      out ++= NearDupStream.bucketGroupLww(NearDupStream.DefaultTau64)(
        (0, 0L), b.iterator, gs)
      state = if (gs.exists) Some(gs.get) else None
    }
    (out.result().map(r => (r.doc_id, r.dup_of.getOrElse(-1L), r.sim64)),
      state.toSeq.flatMap(_.claimants).map(c => (c.id, c.ver)))
  }

  property("catch-up bundling is invisible: bundled+shuffled ≡ stepped") =
    Prop.forAll(genHistory, Gen.choose(Long.MinValue, Long.MaxValue)) {
      (epochs, seed) =>
        val stepped = drive(epochs)
        val bundled = drive(Seq(shuffle(epochs.flatten, seed)))
        val ok = stepped == bundled
        if (!ok) println(s"[bucketlww] epochs=${epochs.map(_.map(m =>
          (m.doc_id, m.ver, m.epoch, m.retire)))}\n  stepped=$stepped\n  bundled=$bundled")
        ok
    }

  property("any epoch split point is invisible (prefix+suffix ≡ stepped)") =
    Prop.forAll(genHistory, Gen.choose(0, 8)) { (epochs, cut0) =>
      val cut = if (epochs.isEmpty) 0 else cut0 % (epochs.size + 1)
      val stepped = drive(epochs)
      val split = drive(Seq(
        epochs.take(cut).flatten, epochs.drop(cut).flatten).filter(_.nonEmpty))
      val ok = stepped == split
      if (!ok) println(s"[bucketlww] cut=$cut epochs=${epochs.map(_.map(m =>
        (m.doc_id, m.ver, m.epoch, m.retire)))}\n  stepped=$stepped\n  split=$split")
      ok
    }

  // -------------------------------------------------------------------
  // the TTL'd registry kernel ([[NearDupStream.regGroupT]]): the idle
  // clock's contract over generated arrival histories — the round-17
  // ADVICE rewind fix, held as an invariant rather than one scenario.
  // -------------------------------------------------------------------

  private case class RegEvent(ver: Long, etsSec: Long)

  /** per batch: a non-empty set of arrivals for ONE doc (vers may be
    * stale, ets may be out of order up to the watermark), plus a
    * non-decreasing watermark strictly below every batch ets (rows
    * at/below the watermark never reach the kernel — the runtime
    * drops them first, so the generator never produces them). */
  private val genRegHistory: Gen[Seq[(Seq[RegEvent], Long)]] = for {
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    nBatches <- Gen.choose(1, 8)
  } yield {
    val rnd = new scala.util.Random(seed)
    var wm = 0L
    var maxVer = 0L
    (1 to nBatches).map { b =>
      val n = 1 + rnd.nextInt(3)
      val evs = (1 to n).map { _ =>
        // mix of stale replays (ver ≤ maxVer) and fresh versions;
        // ets anywhere in (wm, wm + 10000]
        val v =
          if (maxVer > 0 && rnd.nextBoolean()) 1L + rnd.nextInt(maxVer.toInt).toLong
          else maxVer + 1L + rnd.nextInt(2).toLong
        maxVer = math.max(maxVer, v)
        RegEvent(v, wm + 1 + rnd.nextInt(10000).toLong)
      }
      wm += rnd.nextInt(3000).toLong   // non-decreasing, can lag far behind
      (evs, wm)
    }
  }

  private def regArrival(e: RegEvent) = NearDupStream.RegArrivalT(
    1L, e.ver, Array(e.ver), Array.tabulate(16)(i => e.ver * 100L + i),
    Some(s"p${e.ver}"), new java.sql.Timestamp(e.etsSec * 1000L))

  property("TTL registry: forward-only idle clock, LWW emission, exact retires") =
    Prop.forAll(genRegHistory, Gen.choose(1000L, 60000L)) { (history, ttl) =>
      import org.apache.spark.api.java.Optional
      var state: Option[NearDupStream.DocRegT] = None
      var lastDeadline = Long.MinValue
      var regVer = 0L          // model: the registered version
      var lastEts = Long.MinValue
      var ok = true
      history.foreach { case (evs, wm) =>
        val gs = TestGroupState.create[NearDupStream.DocRegT](
          state.fold(Optional.empty[NearDupStream.DocRegT]())(Optional.of),
          org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
          0L, Optional.of(wm * 1000L), false)
        val out = NearDupStream.regGroupT(ttl)(1L,
          evs.map(regArrival).iterator, gs).toSeq
        val newest = evs.maxBy(_.ver)
        lastEts = math.max(lastEts, evs.map(_.etsSec * 1000L).max)
        if (newest.ver > regVer) {
          // LWW emission: exactly one RegMsg, at the batch max ver,
          // retiring exactly the PREVIOUS registered version's bhs
          val expectedRetire =
            if (regVer == 0L) Seq.empty
            else Array.tabulate(16)(i => regVer * 100L + i).toSeq
          ok &= out.size == 1 && out.head.ver == newest.ver &&
            out.head.retire_bhs.toSeq == expectedRetire
          regVer = newest.ver
        } else ok &= out.isEmpty   // stale replays claim nothing
        // the idle deadline: armed off the STORED clock, never rewinds
        val deadline = gs.getTimeoutTimestampMs.get()
        ok &= deadline == math.max(wm * 1000L, lastEts) + ttl
        ok &= deadline >= lastDeadline
        lastDeadline = deadline
        state = if (gs.exists) Some(gs.get) else None
        // the stored clock is the max over everything seen
        ok &= state.exists(_.lastEtsMs == lastEts)
      }
      // the idle timeout: one retire at regVer+1, state forgotten
      if (ok && regVer > 0L) {
        val gs = TestGroupState.create[NearDupStream.DocRegT](
          state.fold(Optional.empty[NearDupStream.DocRegT]())(Optional.of),
          org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
          0L, Optional.of(lastDeadline + 1), true)
        val out = NearDupStream.regGroupT(ttl)(1L, Iterator.empty, gs).toSeq
        ok &= out.size == 1 && out.head.ver == regVer + 1 &&
          out.head.retire_bhs.toSeq ==
            Array.tabulate(16)(i => regVer * 100L + i).toSeq &&
          out.head.bhs.isEmpty && !gs.exists
      }
      if (!ok) println(s"[regttl] ttl=$ttl history=$history")
      ok
    }
}
