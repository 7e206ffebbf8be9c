package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the two deterministic ordering/selection
  * operators added in round 9, driven over arbitrary corpora:
  *
  *  - `Pipeline.interleaveOrder`: positions are a round-robin key —
  *    unique, per-source dense ranks in md5 order, pos = r·S + s_idx,
  *    and every k-round prefix holds exactly min(k, n_s) docs of each
  *    source — for ANY source distribution (single source, heavy
  *    skew, one-doc sources).
  *
  *  - `Pipeline.mixEpochsSelect`: the annealed schedule — exact BigInt
  *    threshold recompute, per-source monotone THRESHOLDS across
  *    epochs (the realized keep counts are independent per-epoch
  *    draws, so only their expectation is monotone — asserting the
  *    counts themselves was round 9's one flaky property), final epoch
  *    total (modulo the documented 2⁻³² ffffffff edge) — for ANY
  *    corpus and epoch count E ∈ {2, 3, 4}.
  *
  * Both properties run with shrinking DISABLED: ScalaCheck's default
  * shrinker does not respect generator bounds, so a genuine failure
  * would otherwise be re-reported as a nonsense counterexample (e.g.
  * epochs shrunk to 0, whose threshold divides by E−1 = −1's zero).
  */
object OrderPropertySpec extends Properties("Round9Order") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.GraftSession.local(4)

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val corpusGen = for {
    nDocs <- Gen.choose(1, 100)
    nSrc <- Gen.choose(1, 6)
    skew <- Gen.oneOf(true, false)
  } yield (0 until nDocs).map { i =>
    // skewed: source 0 takes ~half the corpus; else round-robin even
    val s = if (skew && i % 2 == 0) 0 else i % nSrc
    (i.toLong, s"s$s")
  }

  property("interleaveOrder: round-robin key arithmetic and prefix balance on any corpus") =
    Prop.forAllNoShrink(corpusGen) { docs =>
      import spark.implicits._
      val got = Pipeline.interleaveOrder(docs.toDF("doc_id", "source")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val sources = docs.map(_._2).distinct.sorted
      val sIdx = sources.zipWithIndex.toMap
      val want = docs.groupBy(_._2).toSeq.flatMap { case (src, ms) =>
        ms.sortBy { case (id, _) => (md5("interleave:" + id), id) }
          .zipWithIndex.map { case ((id, _), r) =>
            (id, src, r.toLong, r.toLong * sources.length + sIdx(src)) }
      }.toSet
      val perSource = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val kMax = perSource.values.max
      val balanced = Seq(1L, kMax / 2 + 1, kMax).distinct.forall { k =>
        val prefix = got.filter(_._4 < k * sources.length)
        sources.forall(src =>
          prefix.count(_._2 == src).toLong == math.min(k, perSource(src)))
      }
      got.toSet == want && got.map(_._4).distinct.length == got.length && balanced
    }

  private val epochGen = for {
    corpus <- corpusGen
    epochs <- Gen.choose(2, 4)
  } yield (corpus, epochs)

  property("mixEpochsSelect: exact thresholds, monotone anneal, total final epoch") =
    Prop.forAllNoShrink(epochGen) { case (docs, epochs) =>
      import spark.implicits._
      val got = Pipeline.mixEpochsSelect(docs.toDF("doc_id", "source"), epochs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val n = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val nmin = n.values.min
      def thrHex(src: String, e: Int): String = {
        val t = (BigInt(nmin) * (epochs - 1 - e) + BigInt(n(src)) * e) *
          BigInt(4294967296L) / (BigInt(n(src)) * (epochs - 1))
        f"${t.min(BigInt(4294967295L)).toLong}%08x"
      }
      val want = (for {
        e <- 0 until epochs
        (id, src) <- docs
        if md5(s"$e:$id").substring(0, 8) < thrHex(src, e)
      } yield (e.toLong, id, src)).toSet
      // the anneal is monotone in the THRESHOLD (the kept set is an
      // independent content-addressed draw per epoch, so realized
      // counts fluctuate around a monotone expectation — not a bug)
      val monotone = n.keys.forall { src =>
        val per = (0 until epochs).map(e => thrHex(src, e))
        per == per.sorted
      }
      val finalTotal = got.count(_._1 == (epochs - 1).toLong) == docs.length
      got == want && monotone && finalTotal
    }
}
