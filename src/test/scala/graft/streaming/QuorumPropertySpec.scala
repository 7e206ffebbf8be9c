package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property (SURVEY.md §5.2 #4): for ANY interleaving of N
  * replica streams carrying the same key set, the quorum gate fires
  * exactly once per key with ≥ depth copies and never otherwise —
  * driven through the pure per-event transition. */
object QuorumPropertySpec extends Properties("QuorumDedup") {

  private val gen = for {
    nKeys <- Gen.choose(1, 20)
    depth <- Gen.choose(1, 5)
    copies <- Gen.listOfN(nKeys, Gen.choose(0, 7)) // deliveries per key
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val arrivals = copies.zipWithIndex.flatMap { case (c, k) => Seq.fill(c)(k.toLong) }
    val order = new scala.util.Random(seed).shuffle(arrivals)
    (depth, copies, order)
  }

  property("exactly-once at quorum for arbitrary interleavings") =
    Prop.forAll(gen) { case (depth, copies, order) =>
      val st = scala.collection.mutable.Map.empty[Long, QuorumDedup.QuorumState]
      var emitted = List.empty[Long]
      order.foreach { k =>
        val (next, fire) =
          QuorumDedup.step(st.getOrElse(k, QuorumDedup.QuorumState(0, emitted = false)), depth)
        st(k) = next
        if (fire) emitted ::= k
      }
      val expected = copies.zipWithIndex.collect { case (c, k) if c >= depth => k.toLong }
      emitted.sorted == expected.sorted && emitted.distinct.size == emitted.size
    }

  // ---- replica-set reconfiguration (round 11): depth swaps at restart ----

  private def entry(host: String): graft.model.OplogEntry =
    graft.model.OplogEntry(new java.sql.Timestamp(1700000000000L), 1, 1L,
      "i", "t.c", None, "{}", None, host)

  private val reconfGen = for {
    copies <- Gen.choose(0, 6)      // copies arriving under the FIRST depth
    depth1 <- Gen.choose(1, 5)      // discovery-time depth
    depth2 <- Gen.choose(1, 5)      // depth at the post-restart timeout
  } yield (copies, depth1, depth2)

  property("reconfiguration: exactly-once across a depth swap, never a stuck emittable key") =
    Prop.forAll(reconfGen) { case (copies, depth1, depth2) =>
      // phase 1: `copies` replica copies arrive under depth1 (the real
      // per-event path: retain the first copy while below quorum)
      var st = QuorumDedup.QuorumState(0, emitted = false)
      var fired = 0
      (1 to copies).foreach { i =>
        val e = entry(s"r$i")
        if (!st.emitted && st.pending.isEmpty) st = st.copy(pending = Some(e))
        val (next, fire) = QuorumDedup.step(st, depth1)
        st = next
        if (fire) fired += 1
      }
      if (st.emitted && st.pending.nonEmpty) st = st.copy(pending = None)
      // restart swaps the depth; the first post-restart watermark
      // advance fires the timeout with depth2 in scope
      val late = QuorumDedup.timeoutFire(st, depth2)
      val total = fired + late.size
      val wantArrival = copies >= depth1
      val wantLate = !wantArrival && copies >= depth2
      val ok = total <= 1 &&
        (total == 1) == (wantArrival || wantLate) &&
        // a late emission carries the FIRST-arrived copy
        late.forall(_.sourceHost == "r1")
      if (!ok) println(s"[reconf] copies=$copies d1=$depth1 d2=$depth2 " +
        s"fired=$fired late=${late.size}")
      ok
    }

  // ---- LIVE reconfiguration (round 12): depth swaps BETWEEN copies ----

  private val liveGen = for {
    n <- Gen.choose(0, 7)
    depths <- Gen.listOfN(n, Gen.choose(1, 5)) // depth in force at each arrival
    depthT <- Gen.choose(1, 5)                 // depth at the watermark advance
  } yield (depths, depthT)

  property("live reconfiguration: exactly-once across random IN-FLIGHT depth swaps") =
    Prop.forAll(liveGen) { case (depths, depthT) =>
      // the applyLive path: each arrival decides at ITS carried depth;
      // the timeout hands the retained copy to the post-stage, which
      // admits iff seen >= the depth in force at that batch — modeled
      // here by timeoutFire at depthT (the identical predicate)
      var st = QuorumDedup.QuorumState(0, emitted = false)
      var fired = 0
      depths.zipWithIndex.foreach { case (d, i) =>
        val e = entry(s"r${i + 1}")
        if (!st.emitted && st.pending.isEmpty) st = st.copy(pending = Some(e))
        val (next, fire) = QuorumDedup.step(st, d)
        st = next
        if (fire) fired += 1
      }
      if (st.emitted && st.pending.nonEmpty) st = st.copy(pending = None)
      val late = QuorumDedup.timeoutFire(st, depthT)
      val total = fired + late.size
      // independent restatement of "emits under the depth in force at
      // its decision time": arrival i (1-based seen = i+1) satisfies
      // its own in-force depth, or the final re-check satisfies depthT
      val arrivalFire = depths.zipWithIndex.exists { case (d, i) => i + 1 >= d }
      val lateFire = !arrivalFire && depths.length >= depthT
      val ok = total <= 1 &&
        (total == 1) == (arrivalFire || lateFire) &&
        late.forall(_.sourceHost == "r1")
      if (!ok) println(s"[live] depths=$depths dT=$depthT fired=$fired late=${late.size}")
      ok
    }
}
