package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextSpec extends SparkSuite {

  test("token counts are consistent with the raw text") {
    val df = TextAnalysis.tokenCount.run(spark, sf0001)
    val bad = df.filter(col("n_tokens") < col("n_distinct") || col("n_chars") <= 0).count()
    assert(bad == 0)
    val one = df.filter(col("doc_id") === 0).head()
    val text = graft.Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    assert(one.getAs[Int]("n_tokens") == text.split(" ").count(_.nonEmpty))
  }

  test("quality score stays in [0, 1]") {
    val df = TextAnalysis.quality.run(spark, sf0001)
    assert(df.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
  }

  test("langid is deterministic and total") {
    val df = TextAnalysis.langId.run(spark, sf0001)
    assert(df.filter(col("predicted").isNull).count() == 0)
    assert(df.count() == 500)
  }

  test("top terms: exactly k per lang, ranked by exact tf/df with term tiebreak") {
    val rows = TextAnalysis.topTerms.run(spark, sf0001).collect()
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == 10, s"$lang: ${rs.length} rows")
      val ordered = rs.sortBy(_.getInt(1))
      ordered.sliding(2).foreach { case Array(a, b) =>
        val (sa, sb) = (a.getDouble(5), b.getDouble(5))
        assert(sa > sb || (sa == sb && a.getString(2) < b.getString(2)),
          s"$lang rank ${a.getInt(1)}->${b.getInt(1)} not (score desc, term asc)")
      }
      // score is the exact rational tf/df
      rs.foreach(r => assert(r.getDouble(5) == r.getLong(3).toDouble / r.getLong(4)))
    }
  }

  test("fingerprint is order- and duplication-insensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "b a a c"), (2L, "a b c"), (3L, "c b a x")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFns.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }
  test("bm25 scores only docs containing a query term, positively") {
    val rows = TextAnalysis.bm25.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tfSum = r.getInt(1) + r.getInt(2) + r.getInt(3)
      assert(tfSum > 0, s"doc ${r.getLong(0)} scored with no query term")
      assert(r.getLong(4) > 0, s"doc ${r.getLong(0)} has non-positive bm25")
    }
  }

  test("search top-k IS the 10 best bm25 rows ranked by (score desc, doc_id)") {
    val all = TextAnalysis.bm25.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    val want = all.sortBy { case (id, score) => (-score, id) }.take(10).toSeq
    val got = TextAnalysis.searchTopK.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSeq
    assert(got == want, s"got=$got want=$want")
    assert(all.length > 10, "top-k must actually truncate the scored set")
  }

  test("global bigram top-k is 20 rows in (count desc, bigram asc) order") {
    val rows = TextAnalysis.bigrams.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    rows.sliding(2).foreach { case Array((b1, c1), (b2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && b1 < b2), s"order broke at $b1/$b2")
    }
  }

  test("repetition ratio is in [0,1) and the flag matches the threshold") {
    val rows = TextAnalysis.repetition.run(spark, sf0001).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (nBg, nDist, ratio, flagged) =
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4))
      assert(nDist >= 1 && nDist <= nBg)
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(math.abs(ratio - (1.0 - nDist.toDouble / nBg)) < 1e-12)
      assert(flagged == (ratio > 0.2))
    }
  }

  test("doc chunks equal an exact stride-24/window-32 recomputation") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty)))
    val want = docs.filter(_._2.nonEmpty).flatMap { case (id, toks) =>
      (0 until toks.length by 24).zipWithIndex.map { case (st, idx) =>
        val chunk = toks.slice(st, st + 32)
        (id, idx.toLong, chunk.length.toLong, md5hex(chunk.mkString(" ")))
      }
    }.toSet
    val got = TextAnalysis.docChunks.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // overlap property: consecutive chunks share 8 tokens when full
    assert(got.nonEmpty)
  }

  test("quality filter reasons equal a per-doc rule recomputation, keep iff no reasons") {
    val s2 = spark
    import s2.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextAnalysis.qualityFilterReasons.run(spark, sf0001).collect()
    assert(out.length == docs.size)
    var sawDrop = false
    var sawKeep = false
    out.foreach { r =>
      val (id, n, reasons, keep) = (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3))
      val toks = docs(id).split(" ").filter(_.nonEmpty)
      assert(n == toks.length.toLong)
      val want = Seq(
        if (toks.length < 20) Some("too_short") else None,
        if (toks.length > 2000) Some("too_long") else None,
        if (toks.distinct.length * 3L < toks.length) Some("low_diversity") else None,
        if (docs(id).length - toks.length + 1L > toks.length * 8L) Some("long_tokens") else None
      ).flatten.mkString(",")
      assert(reasons == want, s"doc $id: '$reasons' != '$want'")
      assert(keep == reasons.isEmpty)
      if (keep) sawKeep = true else sawDrop = true
    }
    assert(sawKeep && sawDrop, "fixture must exercise both verdicts")
  }

  test("unigram logprob totals equal a pure recompute with per-term micro-rounding") {
    val texts = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val tf = texts.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = tf.values.sum.toDouble
    val lp = tf.map { case (t, c) => t -> math.round(math.log(c / n) * 1e6) }
    val want = texts.filter(_._2.nonEmpty).map { case (id, toks) =>
      id -> ((toks.length.toLong, toks.map(lp).sum))
    }.toMap
    val got = TextAnalysis.unigramLogprob.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want, "per-doc (n_tokens, sum_lp_micro) mismatch")
    // totals are negative log-probs: every doc must score below zero
    assert(got.values.forall(_._2 < 0))
  }

  test("quality classifier logit matches a pure recompute; keep == logit>0") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextAnalysis.qualityClassifier.run(spark, sf0001).collect()
    assert(out.length == docs.values.count(_.split(" ").exists(_.nonEmpty)))
    out.foreach { r =>
      val (id, logit, keep) = (r.getLong(0), r.getDouble(1), r.getBoolean(2))
      val text = docs(id)
      val toks = text.split(" ").filter(_.nonEmpty)
      val d = toks.distinct.length.toDouble / toks.length
      val sr = toks.count(stop).toDouble / toks.length
      val ml = (text.length - toks.length + 1).toDouble / toks.length
      val band = if (toks.length >= 20 && toks.length <= 2000) 0.8 else -0.6
      val want = -1.5 + d * 3.2 + sr * 2.0 + band + ml * -0.02
      assert(math.abs(logit - want) < 1e-12, s"doc $id: $logit != $want")
      assert(keep == (logit > 0))
    }
  }

  test("inverted index: capped postings equal the pure-Scala global top-8 per term") {
    val texts = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    // pure recompute: (term, doc) tf, df per term, global top-8 postings
    val tfd = texts.flatMap { case (id, t) =>
      t.split(' ').filter(_.nonEmpty).groupBy(identity)
        .map { case (term, occ) => (term, id, occ.length.toLong) }
    }
    val want = tfd.groupBy(_._1).collect {
      case (term, posts) if posts.length >= 4 =>
        val top = posts.sortBy(p => (-p._3, p._2)).take(8)
        term -> (posts.length.toLong,
          top.zipWithIndex.map { case ((_, id, tf), i) => (i + 1, id, tf) }.toSeq)
    }

    val got = TextAnalysis.invertedIndex.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
      .map { case (term, rows) =>
        term -> (rows.head._2, rows.sortBy(_._3).map(r => (r._3, r._4, r._5)).toSeq)
      }
    assert(want.exists(_._2._2.length == 8), "a term should hit the posting cap")
    assert(got == want,
      s"terms: got=${got.size} want=${want.size}; " +
        s"first diff=${want.find(kv => got.get(kv._1) != Some(kv._2)).map(_._1)}")
  }
  test("pii redact: typed placeholders, exact per-bucket counts, nothing left to match") {
    import spark.implicits._
    def bucket(id: Long): Char =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.charAt(0)
    val got = TextAnalysis.piiRedact.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == 500)
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val phoneRe = "555-[0-9]{4}".r
    got.foreach { case (id, ne, np, red) =>
      // counts follow the injection rule exactly (the corpus itself is
      // PII-free synthetic words, so organic hits would be a data bug)
      val (we, wp) = bucket(id) match {
        case 'a' => (1L, 0L)
        case 'b' => (1L, 1L)
        case 'c' => (0L, 1L)
        case _   => (0L, 0L)
      }
      assert((ne, np) == ((we, wp)), s"doc $id bucket ${bucket(id)} counts ($ne,$np)")
      // redaction is complete: no residual matches, placeholders present iff counted
      assert(emailRe.findFirstIn(red).isEmpty, s"doc $id leaked an email")
      assert(phoneRe.findFirstIn(red).isEmpty, s"doc $id leaked a phone")
      assert((ne > 0) == red.contains("[EMAIL]"), s"doc $id email placeholder mismatch")
      assert((np > 0) == red.contains("[PHONE]"), s"doc $id phone placeholder mismatch")
    }
  }
  test("keyword extract: per-doc top-3 equals an exact integer tf-idf recompute") {
    import spark.implicits._
    val got = TextAnalysis.keywordExtract.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val n = docs.length
    val tf = docs.flatMap { case (id, t) =>
      t.split(' ').filter(_.nonEmpty).map(term => (id, term)) }
    val df = tf.distinct.groupBy(_._2).view.mapValues(_.size).toMap
    val idfMicro = df.map { case (term, d) =>
      term -> math.round(math.log((n + 1.0) / (d + 1.0)) * 1e6) }
    val want = tf.groupBy(identity).map { case ((id, term), xs) =>
      (id, term, xs.length.toLong, xs.length * idfMicro(term)) }
      .groupBy(_._1).flatMap { case (id, terms) =>
        terms.toSeq.sortBy(t => (-t._4, t._2)).take(3).zipWithIndex
          .map { case ((_, term, tfv, sc), i) => (id, i + 1, term, tfv, sc) }
      }.toSet
    assert(got.toSet == want)
    assert(got.groupBy(_._1).forall(_._2.length == 3),
      "every fixture doc is long enough for 3 keywords")
  }

  test("vocab coverage: exact integer curve at each k, monotone, vocab-consistent") {
    import spark.implicits._
    val got = TextAnalysis.vocabCoverage.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val toks = graft.Tables.load(spark, sf0001, "documents")
      .select($"text").collect().flatMap(_.getString(0).split(' ').filter(_.nonEmpty))
    val tf = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ranked = tf.toSeq.sortBy { case (t, c) => (-c, t) }
    val total = toks.length.toLong
    val want = Seq(10, 100, 1000).filter(_ <= ranked.length).map { k =>
      val cum = ranked.take(k).map(_._2).sum
      (k.toLong, cum, total, ranked.length.toLong, cum * 1000000L / total)
    }.toSet
    assert(got.toSet == want)
    assert(got.nonEmpty && got.map(_._2).toSeq == got.map(_._2).sorted.toSeq,
      "coverage must be monotone in k")
  }

  test("jsd drift: total is the sum of per-term contributions; revision terms dominate") {
    val rows = TextAnalysis.jsdDrift.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 20)
    val total = rows.head._5
    assert(rows.forall(_._5 == total), "every row must carry the same total")
    assert(total > 0, "a 3/16 revision must register positive drift")
    // the planted revision token is the single largest driver: 'rev2'
    // exists only in v2, so its one-sided KL term dominates
    assert(rows.head._1 == "rev2", s"top drifted term was ${rows.head._1}")
    assert(rows.head._2 == 0L && rows.head._3 > 0L)
    // contributions are emitted in rank order and each is <= the top
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.reverse.toSeq)
  }

  test("bpe merges: top-20 pair table equals an exact vocabulary-weighted recompute") {
    import org.apache.spark.sql.functions.{col, lower}
    val texts = graft.Tables.load(spark, sf0001, "documents")
      .select(lower(col("text"))).collect().map(_.getString(0))
    val vocab = texts.flatMap(_.split(' ').filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCounts = vocab.toSeq.filter(_._1.length >= 2).flatMap { case (w, n) =>
      (0 until w.length - 1).map(i => w.substring(i, i + 2) -> n)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
      .zipWithIndex.map { case ((p, n), i) => (i + 1, p, n) }
    val got = TextAnalysis.bpeMerges.run(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want, "merge table must equal the exact recompute in rank order")
    // the vocabulary trick must hold: pair mass is word-frequency
    // weighted, so the top pair count is >= the count of any single word
    // containing it (multiplicity within a word counts once per position)
    assert(got.head._3 >= vocab.values.max / 2,
      "top pair implausibly small against the vocabulary")
  }

  test("langid confusion: cells recompute from the langid frame; totals conserve; diagonal dominates") {
    val preds = TextAnalysis.langId.run(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getString(7)))
    val want = preds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowTot = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = TextAnalysis.langidConfusion.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.map(c => (c._1, c._2) -> c._3).toMap == want,
      "confusion cells must equal the recompute")
    got.foreach { case (l, p, n, nl, frac, corr) =>
      assert(nl == rowTot(l), s"row total for $l")
      assert(frac == n * 1000000L / nl, s"fraction for ($l,$p)")
      assert(corr == (l == p))
    }
    assert(got.map(_._3).sum == preds.length.toLong, "cells must cover the corpus")
    // the heuristic is cheap and WEAK (that's what the matrix is for:
    // it measures 35% on this fixture) — but it must beat uniform
    // chance over the label set, and the matrix must actually expose
    // off-diagonal confusion mass for the diagnostic to mean anything
    val labels = rowTot.keySet
    val diag = got.filter(_._6).map(_._3).sum
    assert(diag * labels.size > preds.length,
      s"classifier no better than uniform chance: $diag/${preds.length} over ${labels.size} labels")
    assert(got.exists(c => !c._6 && c._3 > 0), "no confusion mass to diagnose")
  }

  test("stats profile: ANALYZE row per column equals an exact driver recompute") {
    val rows = graft.Tables.load(spark, sf0001, "documents").collect()
    def profile[T](name: String, vs: Seq[Any]): (String, Long, Long, Long, String, String) = {
      val nn = vs.count(_ == null).toLong
      val present = vs.filter(_ != null)
      val (mn, mx) = present.head match {
        case _: Long => (present.map(_.asInstanceOf[Long]).min.toString,
          present.map(_.asInstanceOf[Long]).max.toString)
        case _ => (present.map(_.asInstanceOf[String]).min, present.map(_.asInstanceOf[String]).max)
      }
      (name, rows.length.toLong, nn, present.distinct.length.toLong, mn, mx)
    }
    val want = Set(
      profile("doc_id", rows.map(_.getAs[Any]("doc_id")).toSeq),
      profile("lang", rows.map(_.getAs[Any]("lang")).toSeq),
      profile("n_chars", rows.map(_.getAs[Any]("n_chars")).toSeq),
      profile("source", rows.map(_.getAs[Any]("source")).toSeq),
      profile("text", rows.map(_.getAs[Any]("text")).toSeq))
    val got = TextAnalysis.statsProfile.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSet
    assert(got == want, "stats rows must equal the exact recompute")
  }

  test("text_zipf_fit: one-row fit equals the driver least-squares over nano-rounded lns") {
    val Array(row) = TextAnalysis.zipfFit.run(spark, sf0001).collect()
    val tf = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("explode(filter(split(text, ' '), x -> x != '')) term")
      .collect().map(_.getString(0))
      .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(1000)
    val pts = tf.zipWithIndex.map { case ((_, c), i) =>
      (math.round(1e9 * math.log((i + 1).toDouble)),
        math.round(1e9 * math.log(c.toDouble))) }
    val n = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val slope = math.round(1e6 * ((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble))
    val icept = math.round((sy * sxx - sx * sxy).toDouble / (n * sxx - sx * sx).toDouble)
    assert(row.getLong(0) == pts.length.toLong)
    assert(row.getLong(1) == slope, s"slope ${row.getLong(1)} != $slope")
    assert(row.getLong(2) == icept, s"intercept ${row.getLong(2)} != $icept")
    // a template-vocab fixture reads flat-but-negative; natural corpora ~ -1e6
    assert(row.getLong(1) < 0L)
  }
}
