package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** The cross-form RFM guarantee, executable (round-10 verdict item):
  * on TIE-FREE per-user frames the production histogram cut
  * ([[Pipeline.rfmHistogramBins]], `(3·(cum−cnt)) div n + 1` — the
  * closed form of NTILE at the first tied member) equals the NTILE(3)
  * teaching twin ([[Pipeline.rfmNtileBins]]) bin-for-bin, for every
  * metric; plus the pinned tie case documenting exactly where the two
  * semantics MUST diverge (a histogram cannot split equal keys by
  * user_id rank). Both forms run as their real Spark plans. */
object RfmPropertySpec extends Properties("RfmCrossForm") {

  // each iteration runs six real Spark window/join jobs on a ≤40-row
  // frame; 10 random frames cover the n mod 3 ∈ {0,1,2} boundary cases
  // ScalaCheck shrinks toward anyway
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.GraftSession.local(4)

  /** tie-free frames: distinct recencies, frequencies, and monetary
    * BUCKETS (the `v*1000 + i` trick keeps the draw random but the
    * keys distinct; cents = bucket·10⁴ + pad keeps the cents order
    * identical to the bucket order, so monetary is tie-free at BOTH
    * granularities). */
  private val gen = for {
    n <- Gen.choose(1, 40)
    rv <- Gen.listOfN(n, Gen.choose(0L, 30L))
    fv <- Gen.listOfN(n, Gen.choose(0L, 30L))
    bv <- Gen.listOfN(n, Gen.choose(0L, 30L))
  } yield (0 until n).map { i =>
    val bucket = bv(i) * 1000L + i
    (i.toLong,                       // user_id
      rv(i) * 1000L + i,             // recency_days, distinct
      fv(i) * 1000L + i + 1L,        // frequency, distinct, ≥ 1
      bucket * 10000L + (i % 10000), // monetary_cents
      bucket)                        // m_bucket = cents div 10000
  }

  private def collectBins(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))).toMap

  property("tie-free: histogram cut equals NTILE(3) bin-for-bin") =
    Prop.forAll(gen) { rows =>
      import spark.implicits._
      val df = rows.toDF("user_id", "recency_days", "frequency",
        "monetary_cents", "m_bucket")
      collectBins(Pipeline.rfmNtileBins(df)) ==
        collectBins(Pipeline.rfmHistogramBins(df))
    }

  property("pinned tie case: equal keys share the first member's bin") = Prop {
    import spark.implicits._
    // u0,u1 tie on recency 5; frequencies/buckets stay tie-free
    val df = Seq(
      (0L, 5L, 1L, 10000L, 1L),
      (1L, 5L, 2L, 20000L, 2L),
      (2L, 9L, 3L, 30000L, 3L)
    ).toDF("user_id", "recency_days", "frequency", "monetary_cents", "m_bucket")
    val nt = collectBins(Pipeline.rfmNtileBins(df))
    val hg = collectBins(Pipeline.rfmHistogramBins(df))
    // NTILE rank-splits the tie: u0→1, u1→2; the histogram lands the
    // whole run at the first member's bin: both→1 — the one documented
    // divergence, and the ONLY divergent cell on this frame
    nt(0L)._1 == 1 && nt(1L)._1 == 2 && nt(2L)._1 == 3 &&
      hg(0L)._1 == 1 && hg(1L)._1 == 1 && hg(2L)._1 == 3 &&
      nt.forall { case (u, (_, f, m, _)) => f == hg(u)._2 && m == hg(u)._3 }
  }
}
