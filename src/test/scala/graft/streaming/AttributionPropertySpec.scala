package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck drive of the multi-touch credit kernels — the pure
  * split vectors both streaming emitters and (by construction — the
  * CASE/expression shapes are verbatim) the batch oracles share:
  * conservation up to truncation, the U-shape, decay monotonicity,
  * and the prune/window interplay under random touch sets. */
object AttributionPropertySpec extends Properties("AttributionCredits") {

  property("position split: shape, bounds, conservation") =
    Prop.forAll(Gen.choose(1, 200)) { n =>
      val cs = AttributionStream.positionSplit(n)
      val shape =
        if (n == 1) cs == IndexedSeq(1000000L)
        else if (n == 2) cs == IndexedSeq(500000L, 500000L)
        else cs.head == 400000L && cs.last == 400000L &&
          cs.slice(1, n - 1).distinct.lengthCompare(1) == 0 &&
          cs.slice(1, n - 1).forall(c => c == 200000L / (n - 2))
      val conserved = cs.sum <= 1000000L &&
        cs.sum >= 1000000L - math.max(0, n - 2)   // truncation loses < 1 per middle
      (cs.length == n) :| "length" &&
        shape :| "U shape" && conserved :| s"sum=${cs.sum}" &&
        cs.forall(_ >= 0L) :| "non-negative"
    }

  property("time-decay split: conservation, monotone in age, equal ages equal credit") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 6L)).map(_.take(50))) { ages =>
      val cs = AttributionStream.timeDecaySplit(ages)
      val pairsOk = ages.zip(cs).combinations(2).forall {
        case Seq((a1, c1), (a2, c2)) =>
          (a1 == a2 && c1 == c2) || (a1 < a2 && c1 >= c2) || (a1 > a2 && c1 <= c2)
        case _ => true
      }
      (cs.length == ages.length) :| "length" &&
        (cs.sum <= 1000000L && cs.sum >= 1000000L - ages.length) :| s"sum=${cs.sum}" &&
        pairsOk :| "younger touch never earns less" &&
        cs.forall(_ >= 0L) :| "non-negative"
    }

  private val touchesGen: Gen[List[TouchRec]] = for {
    n <- Gen.choose(0, 30)
    ts <- Gen.listOfN(n, Gen.choose(0L, 20L * 86400L * 1000000L))
  } yield ts.zipWithIndex
    .map { case (t, i) => TouchRec(t, i.toLong, if (i % 2 == 0) "view" else "click") }
    .sortBy(t => (t.t_us, t.t_id))

  property("prune never drops a touch a wm-admissible purchase could credit") =
    Prop.forAll(touchesGen, Gen.choose(0L, 25L * 86400L * 1000000L)) { (touches, wm) =>
      val pruned = AttributionStream.prune(touches, wm)
      // for every purchase time >= wm, last-touch over pruned == over full
      val probes = (touches.map(_.t_us) ++ Seq(wm, wm + 1L, wm + AttributionStream.SevenDaysUs))
        .filter(_ >= wm).distinct.take(40)
      def last(ts: List[TouchRec], p: Long): Option[(Long, Long)] =
        ts.filter(t => t.t_us <= p && p - t.t_us <= AttributionStream.SevenDaysUs)
          .lastOption.map(t => (t.t_us, t.t_id))
      probes.forall(p => last(pruned, p) == last(touches, p)) :| "last-touch preserved" &&
        pruned.sortBy(t => (t.t_us, t.t_id)).equals(pruned) :| "still ascending"
    }

  property("pruneWindow keeps exactly the 7-day-reachable tail") =
    Prop.forAll(touchesGen, Gen.choose(0L, 25L * 86400L * 1000000L)) { (touches, wm) =>
      val pruned = AttributionStream.pruneWindow(touches, wm)
      pruned == touches.filter(_.t_us + AttributionStream.SevenDaysUs >= wm)
    }
}
