package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property for the packing layout: for ANY corpus —
  * zero-token docs, single-doc langs, sizes on exact bin boundaries —
  * each lang's offsets tile [0, total) densely in (md5, doc_id) order
  * and the bin columns obey their closed forms (bin_last pinned to
  * bin_first for empty docs). Drives [[Pipeline.packLayout]] directly
  * with generated frames, beyond what the fixture contains. */
object PackPropertySpec extends Properties("PackLayout") {

  // each iteration runs a real Spark window job; 10 diverse corpora
  // beat ScalaCheck's default 100 on time budget without losing the
  // edge cases (zero sizes and exact bin multiples are FORCED below)
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.GraftSession.local(4)

  private val SeqLen = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val gen = for {
    nDocs <- Gen.choose(1, 60)
    langs <- Gen.choose(1, 3)
    sizes <- Gen.listOfN(nDocs,
      Gen.frequency(
        (1, Gen.const(0L)),                       // empty doc
        (1, Gen.oneOf(64L, 128L)),                // exact bin multiple
        (6, Gen.choose(1L, 200L))))
  } yield sizes.zipWithIndex.map { case (n, i) =>
    (i.toLong, s"l${i % langs}", n)
  }

  property("offsets tile densely per lang; bin columns match closed forms") =
    Prop.forAll(gen) { docs =>
      import spark.implicits._
      val got = Pipeline.packLayout(docs.toDF("doc_id", "lang", "n_tokens"), SeqLen)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val want = docs.groupBy(_._2).flatMap { case (_, g) =>
        val ordered = g.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
        ordered.scanLeft(0L) { case (off, (_, _, n)) => off + n }.zip(ordered)
          .map { case (off, (id, lang, n)) =>
            id -> ((lang, n, off,
              off / SeqLen, math.max(off / SeqLen, (off + n - 1) / SeqLen)))
          }
      }.toMap
      got == want
    }

  // ---- pure first-fit kernel (pack_ffd) — no Spark involved ----

  private val Cap = 64L
  private val ffdGen = Gen.listOf(Gen.choose(1L, Cap)).map(_.sorted.reverse)

  property("ffd: token mass conserved across bins") =
    Prop.forAll(ffdGen) { sizes =>
      val rem = Pipeline.ffdRemainders(sizes, Cap)
      rem.map(Cap - _).sum == sizes.sum
    }

  property("ffd: bin count between ceil(total/cap) and n items") =
    Prop.forAll(ffdGen) { sizes =>
      val bins = Pipeline.ffdBinCount(sizes, Cap)
      val lower = (sizes.sum + Cap - 1) / Cap
      bins >= lower && bins <= sizes.length.toLong
    }

  property("ffd: first-fit invariant — at most one bin over half empty") =
    Prop.forAll(ffdGen) { sizes =>
      // two bins each > cap/2 empty contradict first-fit: the second
      // bin's first item (< cap/2) would have fit the first bin
      Pipeline.ffdRemainders(sizes, Cap).count(_ > Cap / 2) <= 1
    }

  property("ffd: assignment is dense, within-cap, and consistent with remainders") =
    Prop.forAll(ffdGen) { sizes =>
      val (bins, rem) = Pipeline.ffdPack(sizes, Cap)
      val loads = bins.zip(sizes).groupBy(_._1).view.mapValues(_.map(_._2).sum)
      (sizes.isEmpty || bins.toSet == (0 until rem.length).toSet) &&  // dense ids
        loads.values.forall(_ <= Cap) &&                              // never overfull
        rem.zipWithIndex.forall { case (r, b) =>                      // rem = cap - load
          r == Cap - loads.getOrElse(b, 0L)
        }
    }
}
