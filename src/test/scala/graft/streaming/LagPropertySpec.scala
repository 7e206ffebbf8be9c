package graft.streaming

import org.scalacheck.{Gen, Prop, Properties, Test}

/** The lag monitor's state merge is a commutative monoid fold
  * (count-sum + max-ts per member): ANY partitioning of the increments
  * into batches, in ANY order, folds to the same member table — the
  * property that makes the per-partition pre-reduce and cross-batch
  * accumulation safe by construction. */
object LagPropertySpec extends Properties("LagStream") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(50)

  private val incGen = for {
    host <- Gen.oneOf("r1", "r2", "r3", "r4")
    n <- Gen.choose(1L, 5L)
    ts <- Gen.choose(0L, 1000L)
  } yield (host, n, ts)

  private val gen = for {
    incs <- Gen.listOf(incGen)
    seed <- Gen.choose(0L, Long.MaxValue)
    cut <- Gen.choose(0, math.max(incs.length, 1))
  } yield (incs, new scala.util.Random(seed).shuffle(incs), cut)

  property("any batching and order folds to the same member table") =
    Prop.forAll(gen) { case (incs, shuffled, cut) =>
      val oneShot = LagStream.merge(Map.empty, incs)
      val (b1, b2) = shuffled.splitAt(cut)
      val batched = LagStream.merge(LagStream.merge(Map.empty, b1), b2)
      oneShot == batched
    }
}
