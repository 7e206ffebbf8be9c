package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property for the token-budget selection: the
  * histogram-cut plan (`budgetSelect2Phase` — no corpus-wide ordered
  * window) must equal the single-window reference plan
  * (`budgetSelectGlobal`) BIT-FOR-BIT, including `cum_tokens`
  * positions, on ANY corpus — duplicate rank keys (the boundary-group
  * case the histogram exists for), budgets landing exactly on a group
  * edge, single-doc langs, docs individually larger than the budget,
  * and langs where nothing fits. The fixture exercises one corpus;
  * this drives the equality over the space of them. */
object BudgetPropertySpec extends Properties("BudgetSelect") {

  // each iteration runs two windowed Spark jobs; 12 corpora with
  // FORCED rank-key collisions and boundary budgets cover the shapes
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = graft.GraftSession.local(4)

  private val gen = for {
    nDocs <- Gen.choose(1, 80)
    langs <- Gen.choose(1, 3)
    // tiny rank-key space so many docs share a rank_key and the
    // boundary group has real membership
    rows <- Gen.listOfN(nDocs, for {
      nTok <- Gen.frequency(
        (6, Gen.choose(1L, 40L)),
        (1, Gen.choose(200L, 400L)))        // bigger than most budgets
      rk <- Gen.choose(0L, 4L)
    } yield (nTok, rk))
    budget <- Gen.frequency(
      (3, Gen.choose(1L, 150L)),
      (1, Gen.const(0L)),                    // nothing fits
      (1, Gen.const(40L)))                   // often an exact group edge
  } yield (rows.zipWithIndex.map { case ((nTok, rk), i) =>
    (i.toLong, s"l${i % langs}", nTok, rk)
  }, budget)

  property("histogram-cut plan equals the single-window plan bit-for-bit") =
    Prop.forAll(gen) { case (rows, budget) =>
      import spark.implicits._
      val base = rows.toDF("doc_id", "lang", "n_tokens", "rank_key")
        .localCheckpoint()
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val global = collect(Pipeline.budgetSelectGlobal(base, budget))
      val twoPhase = collect(Pipeline.budgetSelect2Phase(base, budget))
      val ok = global == twoPhase
      if (!ok) println(s"[budgetprop] budget=$budget rows=$rows\n  global=$global\n  2phase=$twoPhase")
      ok
    }
}
