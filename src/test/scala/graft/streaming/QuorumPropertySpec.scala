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
}
