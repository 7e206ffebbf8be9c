package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck drive of the per-query MMR kernel over random candidate
  * sets (beyond the fixture the stream≡batch spec pins): selection
  * size/distinctness, step-1 pure-relevance argmax, and GREEDY
  * OPTIMALITY of every step — each selected candidate maximizes
  * 7·rel − 3·maxRedundancy (ties to the smaller vec_id) among the
  * remaining, replayed independently from the emitted picks. */
object MmrPropertySpec extends Properties("MmrKernel") {

  private def micro(x: Double): Long =
    java.math.BigDecimal.valueOf(1e6 * x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private val candGen: Gen[List[MmrCand]] = for {
    n <- Gen.choose(1, 24)
    dims <- Gen.const(4)
    vecs <- Gen.listOfN(n, Gen.listOfN(dims, Gen.choose(-5, 5).map(_.toDouble)))
  } yield vecs.zipWithIndex.collect {
    case (v, i) if v.exists(_ != 0.0) =>
      val arr = v.toArray
      val nrm = math.sqrt(arr.map(x => x * x).sum)
      // qv fixed at (1,0,0,0): cos = v(0)/nrm
      MmrCand(7L, i.toLong, arr(0) / nrm, arr, nrm)
  }

  property("selection is distinct, sized min(5, n), greedy-optimal at every step") =
    Prop.forAll(candGen) { cands =>
      (cands.nonEmpty) ==> {
        val out = MmrServeStream.rerank(7L, cands.iterator, kCand = 20, kOut = 5).toList
        val top = cands.sortBy(c => (-c.cos, c.vec_id)).take(20)
        val n = top.length
        val rel = top.map(c => c.vec_id -> micro(c.cos)).toMap
        def cc(a: MmrCand, b: MmrCand): Long = {
          var s = 0.0; var k = 0
          while (k < a.v.length) { s += a.v(k) * b.v(k); k += 1 }
          micro(s / (a.nrm * b.nrm))
        }
        val byId = top.map(c => c.vec_id -> c).toMap
        val sizeOk = out.length == math.min(5, n) &&
          out.map(_.vec_id).distinct.length == out.length &&
          out.map(_.step) == (1 to out.length).toList
        // replay the greedy independently and require identical picks+scores
        var selected = List.empty[Long]
        val replay = (1 to math.min(5, n)).map { step =>
          val remaining = top.filterNot(c => selected.contains(c.vec_id))
          val scored = remaining.map { c =>
            val red = selected.map(s => cc(byId(c.vec_id), byId(s)))
              .foldLeft(Long.MinValue)(math.max)
            val sc =
              if (step == 1) rel(c.vec_id) * 10L
              else rel(c.vec_id) * 7L - (if (red == Long.MinValue) 0L else red) * 3L
            (c.vec_id, sc)
          }
          val best = scored.minBy { case (id, sc) => (-sc, id) }
          selected ::= best._1
          MmrHit(7L, step, best._1, best._2)
        }.toList
        sizeOk :| "size/distinct/steps" &&
          (out == replay) :| s"greedy replay diverged:\n got=$out\n exp=$replay"
      }
    }
}
