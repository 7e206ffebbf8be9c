package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSuite {

  test("split assignment is deterministic and near the 80/10/10 design") {
    val a = Pipeline.splitAssign.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Pipeline.splitAssign.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b, "assignment must be reproducible")
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac ${frac("train")}")
    assert(frac.keySet == Set("train", "val", "test"))
  }

  test("filtered top-k only ever scores vectors passing the predicate") {
    val rows = Pipeline.filteredTopK.run(spark, sf0001).collect()
    val allowed = graft.Tables.load(spark, sf0001, "embeddings")
      .filter(col("label").isin(1, 2, 3))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rows.nonEmpty)
    assert(rows.forall(r => allowed.contains(r.getLong(2))),
      "a result escaped the metadata filter")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.values.foreach(rs => assert(rs.length == 10))
  }

  test("stratified sample is balanced: every stratum contributes exactly min-stratum-size rows") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val counts = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = counts.values.min
    val sampled = Pipeline.sampleStratified.run(spark, sf0001).collect()
    val perLang = sampled.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perLang.keySet == counts.keySet, "a stratum vanished")
    perLang.foreach { case (lang, n) => assert(n == target, s"$lang: $n != $target") }
    // content-addressed: the same run again keeps exactly the same docs
    val again = Pipeline.sampleStratified.run(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(again == sampled.map(_.getLong(0)).toSet)
  }

  test("token percentiles are ordered and cover every lang") {
    val rows = Pipeline.tokenPercentiles.run(spark, sf0001).collect()
    val langs = graft.Tables.load(spark, sf0001, "documents")
      .select("lang").distinct().count()
    assert(rows.length == langs)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p50 <= p90 && p90 <= p99, s"${r.getString(0)}: $p50 $p90 $p99")
    }
  }
  test("source cap keeps at most 10 docs per source, reproducibly") {
    val a = Pipeline.sourceCap.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val b = Pipeline.sourceCap.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(a.toSet == b.toSet, "cap selection must be reproducible")
    val bySrc = a.groupBy(_._2)
    assert(bySrc.values.forall(_.length <= 10))
    assert(bySrc.values.forall(g => g.map(_._3).sorted.toSeq == (1 to g.length)))
  }

  test("event outliers equal an exact BigInt recomputation of the 2-sigma test") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("event_id", "event_type", "cast(round(value * 100) as long) c")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = ev.groupBy(_._2).flatMap { case (_, g) =>
      val n = BigInt(g.length)
      val s = g.map(e => BigInt(e._3)).sum
      val ss = g.map(e => BigInt(e._3) * BigInt(e._3)).sum
      g.filter { e =>
        val dev = BigInt(e._3) * n - s
        dev * dev * (n - 1) > BigInt(4) * n * (n * ss - s * s)
      }.map(_._1).toSeq
    }.toSet
    val got = Pipeline.eventOutliers.run(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.nonEmpty, "fixture should contain some 2-sigma outliers")
  }
  test("outlier overflow fence: bound is exact at the decimal(38,0) boundary") {
    // the guarded invariant: 4*cmax^2*n^3 < 1e38
    assert(Pipeline.outlierBoundOk(1, 1))
    // cmax=1e6 cents ($10k): safe through ~2.9e8 events/type, not 3e8
    assert(Pipeline.outlierBoundOk(292401773L, 1000000L))
    assert(!Pipeline.outlierBoundOk(292401774L, 1000000L))
    // the ADVICE scenario: 1e9 events/type at cent magnitude 1e6 → 4e39
    assert(!Pipeline.outlierBoundOk(1000000000L, 1000000L))
    // exact boundary is excluded (strict <): 4*(5e18)^2*1^3 = 1e38
    assert(!Pipeline.outlierBoundOk(1L, 5000000000000000000L))
    assert(Pipeline.outlierBoundOk(1L, 4999999999999999999L))
  }

  test("funnel stages are strictly ordered and stage matches the reached step") {
    val rows = Pipeline.funnel.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tView = r.getLong(1)
      val tClick = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val tBuy = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val stage = r.getInt(4)
      tClick.foreach(tc => assert(tc > tView))
      tBuy.foreach { tb => assert(tClick.nonEmpty); assert(tb > tClick.get) }
      assert(stage == (if (tBuy.nonEmpty) 3 else if (tClick.nonEmpty) 2 else 1))
    }
    assert(rows.exists(_.getInt(4) == 3), "fixture should have full-funnel users")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sequence packing equals an exact per-lang recomputation of offsets and bins") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(' ').count(_.nonEmpty).toLong))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val ordered = g.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
      ordered.scanLeft(0L) { case (off, (_, _, n)) => off + n }.zip(ordered)
        .map { case (off, (id, lang, n)) =>
          // zero-token doc occupies no window: bin_last pinned to bin_first
          id -> ((lang, n, off, off / 512, math.max(off / 512, (off + n - 1) / 512)))
        }.toSeq
    }.toMap
    val got = Pipeline.packSequences.run(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) => assert(got(id) == w, s"doc $id: ${got(id)} != $w") }
    // the packing must actually span multiple training windows
    assert(got.values.map(_._5).max > 0, "fixture should fill >1 bin per lang")
  }

  test("mix sample keeps exactly the content-addressed subset per source band") {
    def thr(src: String): String = src.stripPrefix("src").toInt match {
      case i if i <= 4 => "ffff"
      case i if i <= 9 => "7fff"
      case _ => "3fff"
    }
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.filter { case (id, src) =>
      md5hex(id.toString).take(4) <= thr(src)
    }.map(_._1).toSet
    val got = Pipeline.mixSample.run(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(got == want)
    // the full-rate band must be complete; the quarter band genuinely thinned
    val bySrc = docs.groupBy(_._2)
    val full = bySrc.filter(_._1.stripPrefix("src").toInt <= 4).values.flatten.map(_._1).toSet
    assert((full -- got).isEmpty, "rate-1.0 sources must keep every doc")
    assert(got.size < docs.length, "lower bands must actually drop docs")
  }

  test("curation e2e equals quality->dedup->cap->split recomputed stepwise") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val sigs = docs.map { case (id, src, lang, text) =>
      val toks = text.split(' ').filter(_.nonEmpty)
      val fp = toks.distinct.sorted.mkString(" ")
      (id, src, lang, toks.length.toLong, fp)
    }.filter(_._4 >= 20)
    val deduped = sigs.groupBy(_._5).values.map(_.minBy(_._1)).toSeq
    val capped = deduped.groupBy(_._2).values.flatMap { g =>
      g.sortBy(d => (md5hex(d._1.toString), d._1)).take(10)
    }
    val want = capped.map { case (id, src, lang, n, _) =>
      val b = md5hex(id.toString).take(2)
      id -> ((src, lang, n, if (b < "cd") "train" else if (b < "e6") "val" else "test"))
    }.toMap
    val got = Pipeline.curationE2e.run(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got == want, s"missing=${(want.keySet -- got.keySet).take(5)} " +
      s"extra=${(got.keySet -- want.keySet).take(5)}")
    assert(got.nonEmpty)
  }

  test("sharded packing tiles each lang densely and matches single-level totals") {
    val rows = Pipeline.packSequencesSharded.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val single = Pipeline.packSequences.run(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(2))) // (lang, n_tokens)
    rows.groupBy(_._2).foreach { case (lang, g) =>
      // intervals [offset, offset+n) tile [0, total) with no gap/overlap.
      // Tie-break equal offsets by (shard, n_tokens): a zero-token doc at
      // a shard boundary shares its offset with the next shard's first
      // doc and must sort before it (earlier shard, then n=0 first)
      val sorted = g.sortBy(d => (d._5, d._3, d._4))
      var expect = 0L
      sorted.foreach { case (id, _, _, n, off) =>
        assert(off == expect, s"$lang doc $id: offset $off, expected $expect")
        expect += n
      }
      // same total tokens as the single-level packing
      val total = single.filter(_._1 == lang).map(_._2).sum
      assert(expect == total, s"$lang: sharded total $expect != single $total")
      // shard-major: offset order never goes back to an earlier shard
      val shardSeq = sorted.map(_._3).toSeq
      assert(shardSeq == shardSeq.sorted, s"$lang: shards interleave")
    }
    assert(rows.nonEmpty)
  }

  test("two-phase source cap emits exactly the single-phase result") {
    val one = Pipeline.sourceCap.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val two = Pipeline.sourceCapTwoPhase.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(one == two, "two-phase rewrite must be value-equal, ranks included")
    assert(one.nonEmpty)
  }

  test("threshold stratified sample: per-stratum size within binomial noise of target") {
    val s = spark
    import s.implicits._
    val counts = graft.Tables.load(spark, sf0001, "documents")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = counts.values.min
    val kept = Pipeline.sampleStratifiedThreshold.run(spark, sf0001).collect()
      .map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    counts.keys.foreach { lang =>
      val n = counts(lang)
      val got = kept.getOrElse(lang, 0L)
      // keep ~ Binomial(n, target/n): mean `target`, sd < sqrt(target);
      // 6 sigma keeps this deterministic-content-addressed check stable
      val tol = math.max(6 * math.sqrt(target.toDouble), 8.0)
      assert(math.abs(got - target) <= tol,
        s"$lang: kept $got vs target $target (n=$n, tol=$tol)")
    }
    // the minimum stratum keeps everything except the 2^-32 top prefix
    val minLang = counts.minBy(_._2)._1
    assert(kept(minLang) == counts(minLang))
  }

  test("binned percentiles equal the exact rank statistic's bin, per lang") {
    val s = spark
    import s.implicits._
    val toks = graft.Tables.load(spark, sf0001, "documents")
      .select($"lang", $"text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ").count(_.nonEmpty).toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val out = Pipeline.tokenPercentilesBinned.run(spark, sf0001).collect()
    assert(out.length == toks.size)
    out.foreach { r =>
      val (lang, n) = (r.getString(0), r.getLong(1))
      val vals = toks(lang)
      assert(n == vals.length.toLong)
      for ((pct, idx) <- Seq(50 -> 2, 90 -> 3, 99 -> 4)) {
        // exact rank statistic: k = ceil(pct*n/100), value = kth smallest
        val k = (pct.toLong * n + 99) / 100
        val v = vals((k - 1).toInt)
        val wantHi = (v / 16) * 16 + 15
        assert(r.getLong(idx) == wantHi, s"$lang p$pct: got ${r.getLong(idx)}, want $wantHi (v=$v)")
      }
    }
  }

  test("stratified threshold is exact past 2^31 rows per stratum (no Long wrap)") {
    val s = spark
    import s.implicits._
    // nmin=3e9, n=5e9: bare Long nmin*2^32 wraps negative; the decimal
    // path must give the exact floor(3e9 * 2^32 / 5e9) = 2576980377
    val got = Seq((3000000000L, 5000000000L), (5000000000L, 5000000000L))
      .toDF("nmin", "n")
      .select(Pipeline.stratifiedThrCol.as("thr")).collect().map(_.getLong(0))
    assert(got(0) == 2576980377L, s"expected exact quotient, got ${got(0)}")
    assert(got(1) == 4294967296L, "full-keep stratum (capped to 2^32-1 downstream)")
    // and the DuckDB side agrees (same HUGEINT-widened formula)
    val duck = Pipeline.stratifiedThrSql.replace("(SELECT MIN(n) FROM c)", "3000000000")
    assert(duck.contains("HUGEINT"), "oracle must widen before multiplying")
  }

  test("temperature mixing keeps each lang at ~sqrt(nmin/n), all of the smallest") {
    val s = spark
    import s.implicits._
    val counts = graft.Tables.load(spark, sf0001, "documents")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nmin = counts.values.min
    val kept = Pipeline.mixTemperature.run(spark, sf0001).collect()
      .map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    counts.foreach { case (lang, n) =>
      val expect = n * math.sqrt(nmin.toDouble / n)   // = sqrt(nmin*n)
      val tol = math.max(6 * math.sqrt(expect), 8.0)  // binomial 6-sigma
      val got = kept.getOrElse(lang, 0L)
      assert(math.abs(got - expect) <= tol, s"$lang: kept $got vs ~$expect (tol $tol)")
    }
    val minLang = counts.minBy(_._2)._1
    assert(kept(minLang) == counts(minLang), "alpha-sampling never downsamples the smallest lang")
    // smoothing sits strictly between equalize-all and keep-all for larger strata
    counts.filter(_._2 > nmin * 2).keys.foreach { lang =>
      assert(kept(lang) > nmin && kept(lang) < counts(lang), s"$lang not smoothed")
    }
  }

  test("mix upsample emits exactly base+fractional copies per doc, 1..n indexed") {
    def weights(src: String): (Long, Option[String]) = src.stripPrefix("src").toInt match {
      case i if i <= 4 => (2L, Some("7fff"))
      case i if i <= 9 => (1L, Some("3fff"))
      case _ => (1L, None)
    }
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wantCopies = docs.map { case (id, src) =>
      val (base, thr) = weights(src)
      (id, base + (if (thr.exists(md5hex(id.toString).take(4) <= _)) 1L else 0L))
    }.toMap
    val got = Pipeline.mixUpsample.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // every emitted (doc, copy_idx) is a dense 1..n tiling of its doc
    val byDoc = got.groupBy(_._1).map { case (id, g) => id -> g.map(_._2).sorted.toSeq }
    byDoc.foreach { case (id, idxs) =>
      assert(idxs == (1L to wantCopies(id)),
        s"doc $id copies $idxs != 1..${wantCopies(id)}")
    }
    assert(byDoc.keySet == wantCopies.keySet, "every doc appears at least once")
    assert(got.length > docs.length, "upsampling must actually add copies")
  }

  test("corpus shuffle is a deterministic permutation with dense per-shard order") {
    def run() = Pipeline.corpusShuffle.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val rows = run()
    val nDocs = graft.Tables.load(spark, sf0001, "documents").count()
    assert(rows.length == nDocs && rows.map(_._1).distinct.length == rows.length,
      "every doc assigned exactly once")
    // shard/order match the pure-Scala content address
    val hexDigits = "0123456789abcdef"
    val want = rows.map(_._1).map { id =>
      val skey = md5hex(s"epoch0:$id")
      (id, hexDigits.indexOf(skey.head) % 8, skey)
    }
    assert(rows.map(r => r._1 -> r._2).toMap ==
      want.map(w => w._1 -> w._2).toMap, "shard must be the md5 hex bucket")
    val orderWant = want.groupBy(_._2).view.mapValues(
      _.sortBy(w => (w._3, w._1)).map(_._1).toSeq).toMap
    rows.groupBy(_._2).foreach { case (shard, g) =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length), s"shard $shard positions not dense")
      assert(g.sortBy(_._3).map(_._1).toSeq == orderWant(shard),
        s"shard $shard order must follow the salted content address")
    }
    assert(rows.toSet == run().toSet, "assignment must be reproducible")
  }

  test("cohort retention equals a pure per-user recompute") {
    val weekUs = 604800000000L
    val ev = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(ts) as t").collect()
      .map(r => (r.getLong(0), r.getLong(1) / weekUs))
    val firstWk = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = ev.map { case (u, wk) => (firstWk(u), wk - firstWk(u), u) }
      .distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.length.toLong).toMap
    val got = Pipeline.retention.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, s"retention matrix mismatch: $got != $want")
    // offset-0 row of each cohort counts the whole cohort
    want.keys.map(_._1).foreach { c =>
      assert(got((c, 0L)) == firstWk.values.count(_ == c).toLong)
    }
  }

  test("rag retrieval: exact top-5 per query with the right document payload") {
    val rows = Pipeline.ragRetrieve.run(spark, sf0001).collect()
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 4L).toSet)
    byQ.foreach { case (q, g) =>
      assert(g.map(_.getInt(1)).sorted.toSeq == (1 to 5), s"qid $q ranks not dense")
      val got = g.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      val wantTop = emb.keys.filter(_ != q).toSeq
        .map(v => (v, cos(emb(q), emb(v))))
        .sortBy { case (v, c) => (-c, v) }.take(5).map(_._1)
      assert(got == wantTop, s"qid $q: $got != brute-force $wantTop")
    }
    val meta = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "lang", "source", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    rows.foreach { r =>
      assert((r.getString(3), r.getString(4), r.getLong(5)) == meta(r.getLong(2)),
        s"payload mismatch for doc ${r.getLong(2)}")
    }
  }

  test("snapshot diff statuses equal the content-addressed construction, unchanged absent") {
    def hexOf(id: Long): Char = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    }
    val ids = graft.Tables.load(spark, sf0001, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id")).collect().map(_.getLong(0))
    val want = ids.flatMap { id =>
      hexOf(id) match {
        case 'f' => Some(id -> "added")     // absent from v1
        case '0' => Some(id -> "removed")   // absent from v2
        case '1' | '2' => Some(id -> "changed")
        case _ => None                      // unchanged: not a diff's business
      }
    }.toMap

    val got = Pipeline.snapshotDiff.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set("added", "removed", "changed").subsetOf(got.values.toSet),
      "fixture should exercise all three statuses")
    assert(got == want,
      s"missing=${(want.toSet -- got.toSet).take(3)} extra=${(got.toSet -- want.toSet).take(3)}")
  }

  test("mix_to_target keeps only recipe languages at ~C·w_l each, deterministically") {
    import org.apache.spark.sql.functions.col
    val recipe = Map("en" -> 10L, "es" -> 30L, "de" -> 30L, "fr" -> 20L, "zh" -> 10L)
    val n = graft.Tables.load(spark, sf0001, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val c = recipe.collect { case (l, w) if n.contains(l) => n(l) / w }.min
    val kept = Pipeline.mixToTarget.run(spark, sf0001).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    assert(kept.keySet.subsetOf(recipe.keySet), s"non-recipe langs kept: $kept")
    // expected kept count per lang is C·w_l; md5-threshold selection is
    // binomial around it — allow 3 sigma plus integer-threshold slack
    recipe.foreach { case (l, w) =>
      val exp = (c * w).toDouble
      val tol = 3.0 * math.sqrt(exp) + 2
      val got = kept.getOrElse(l, 0L).toDouble
      assert(math.abs(got - exp) <= tol, s"lang $l kept $got want ~$exp (±$tol)")
    }
    val again = Pipeline.mixToTarget.run(spark, sf0001).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    assert(again == kept, "content-addressed selection must be deterministic")
  }

  test("events_sequences: per-user token strings equal a pure-Scala ordered recompute") {
    import spark.implicits._
    val got = Pipeline.eventsSequences.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val events = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", unix_micros($"ts").as("t"), $"event_id", $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = events.groupBy(_._1).map { case (uid, es) =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._4)
      uid -> (es.length.toLong, ordered.mkString(" "))
    }
    assert(got.length == want.size)
    got.foreach { case (uid, n, seq) =>
      val (wn, wseq) = want(uid)
      assert(n == wn, s"user $uid count $n != $wn")
      assert(seq == wseq, s"user $uid sequence drifted")
      assert(seq.split(" ").length.toLong == n, s"user $uid token count != n_events")
    }
  }

  test("events_markov: transition counts equal a pure-Scala recompute; rows normalize to 1") {
    import spark.implicits._
    val got = Pipeline.eventsMarkov.run(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val events = graft.Tables.load(spark, sf0001, "events")
      .select($"user_id", unix_micros($"ts").as("t"), $"event_id", $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.zip(ordered.tail)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, _)) => assert(n == want(k), s"transition $k count") }
    // each prev row is a probability distribution
    got.groupBy(_._1._1).foreach { case (prev, rows) =>
      val total = rows.values.map(_._1).sum.toDouble
      rows.foreach { case ((_, nxt), (n, p)) =>
        assert(p == n / total, s"$prev->$nxt p not the exact count ratio")
      }
      assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-9, s"$prev row not normalized")
    }
  }

  test("corpus_token_budget: per-lang maximal quality-ranked prefix under the budget") {
    import spark.implicits._
    val Budget = 2000L
    val got = Pipeline.tokenBudget.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val corpus = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"lang", graft.functions.TextFns.tokens($"text").as("toks"))
      .collect().map { r =>
        val toks = r.getSeq[String](2)
        (r.getLong(0), r.getString(1), toks.length.toLong, toks.distinct.length.toLong)
      }.filter(_._3 > 0)
    corpus.groupBy(_._2).foreach { case (lang, ds) =>
      val ranked = ds.map { case (id, _, nt, nd) => (id, nt, nd * 1000000L / nt) }
        .sortBy { case (id, _, rk) => (-rk, id) }
      val prefix = ranked.scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, nt, rk)) =>
        (id, nt, rk, cum + nt)
      }.drop(1).takeWhile(_._4 <= Budget)
      val gotLang = got.filter(_._2 == lang).map(t => (t._1, t._3, t._4, t._5)).sortBy(_._1)
      assert(gotLang.toSeq == prefix.map(t => (t._1, t._2, t._3, t._4)).sortBy(_._1).toSeq,
        s"lang $lang selection drifted")
      assert(prefix.nonEmpty && prefix.length < ranked.length,
        s"lang $lang budget must keep some and drop some")
    }
  }

  test("corpus_token_budget_2phase: histogram-cut plan EQUALS the global-window selection") {
    def rows(q: Q) = q.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val single = rows(Pipeline.tokenBudget)
    val twoPhase = rows(Pipeline.tokenBudget2Phase)
    assert(twoPhase == single,
      s"missing=${(single -- twoPhase).take(3)} extra=${(twoPhase -- single).take(3)}")
    // per lang: the boundary (lowest kept rank_key) group's admitted
    // docs are a doc_id-PREFIX of that group, and the selection leaves
    // budget slack smaller than the first dropped doc — i.e. the
    // residual rule did real work (the fixture's rank keys are mostly
    // unique, so boundary groups are usually singletons; the prefix
    // property must hold regardless)
    import spark.implicits._
    val all = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"lang", graft.functions.TextFns.tokens($"text").as("toks"))
      .collect().map { r =>
        val toks = r.getSeq[String](2)
        (r.getLong(0), r.getString(1), toks.length.toLong, toks.distinct.length.toLong)
      }.filter(_._3 > 0)
      .map { case (id, lang, nt, nd) => (id, lang, nt, nd * 1000000L / nt) }
    single.groupBy(_._2).foreach { case (lang, kept) =>
      val cutKey = kept.map(_._4).min
      val group = all.filter(t => t._2 == lang && t._4 == cutKey).map(_._1).sorted
      val keptInCut = kept.filter(_._4 == cutKey).map(_._1).toSeq.sorted
      assert(group.startsWith(keptInCut) || keptInCut == group.toSeq,
        s"lang $lang boundary group admitted a non-prefix: $keptInCut of ${group.toSeq}")
      val total = kept.map(_._3).sum
      assert(total <= 2000L, s"lang $lang exceeded the budget: $total")
    }
  }
  test("corpus_interleave: round-robin key arithmetic exact; any pos-prefix is source-balanced") {
    import spark.implicits._
    val got = Pipeline.corpusInterleave.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sources = docs.map(_._2).distinct.sorted
    val sIdx = sources.zipWithIndex.toMap
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, ms) =>
      ms.sortBy { case (id, _) => (md5("interleave:" + id), id) }
        .zipWithIndex.map { case ((id, _), r) =>
          (id, src, r.toLong, r.toLong * sources.length + sIdx(src)) }
    }.toSet
    assert(got.toSet == want)
    // positions are unique and the output is pos-ordered
    assert(got.map(_._4).distinct.length == got.length)
    assert(got.map(_._4).toSeq == got.map(_._4).sorted.toSeq)
    // any prefix of k full rounds holds exactly min(k, n_s) docs of each source
    val perSource = docs.groupBy(_._2).view.mapValues(_.length).toMap
    for (k <- Seq(1L, 7L, 50L)) {
      val prefix = got.filter(_._4 < k * sources.length)
      sources.foreach { src =>
        val n = prefix.count(_._2 == src).toLong
        assert(n == math.min(k, perSource(src).toLong),
          s"prefix of $k rounds holds $n docs of $src")
      }
    }
  }

  test("mix_epochs: exact threshold recompute; epoch 0 balanced, final epoch ~everything") {
    import spark.implicits._
    val got = Pipeline.mixEpochs.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nmin = n.values.min
    def thrHex(src: String, e: Int): String = {
      val t = (BigInt(nmin) * (2 - e) + BigInt(n(src)) * e) * BigInt(4294967296L) /
        (BigInt(n(src)) * 2)
      f"${t.min(BigInt(4294967295L)).toLong}%08x"
    }
    val want = (for {
      e <- 0 until 3
      (id, src) <- docs
      if md5(s"$e:$id").substring(0, 8) < thrHex(src, e)
    } yield (e.toLong, id, src)).toSet
    assert(got == want)
    // epoch 0 is balanced: every source contributes ~nmin (binomial noise)
    val e0 = got.filter(_._1 == 0L).toSeq.groupBy(_._3).view.mapValues(_.size.toLong)
    e0.foreach { case (src, k) =>
      assert(math.abs(k - nmin) <= 4 * math.sqrt(nmin.toDouble),
        s"epoch 0 of $src kept $k, want ~$nmin")
    }
    // final epoch keeps everything except the 2^-32 ffffffff edge
    val e2 = got.count(_._1 == 2L)
    assert(e2 == docs.length, s"final epoch kept $e2 of ${docs.length}")
    // the anneal is strict: each source's kept count is non-decreasing in epoch
    n.keys.foreach { src =>
      val per = (0 until 3).map(e => got.count(t => t._1 == e && t._3 == src))
      assert(per == per.sorted, s"$src anneal not monotone: $per")
    }
  }

  test("events_rfm: exact metric recompute; terciles balanced and order-consistent") {
    import spark.implicits._
    val got = Pipeline.eventsRfm.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
    val ev = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "cast(round(value*100) as long) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = ev.map(_._2).max
    val want = ev.groupBy(_._1).map { case (u, g) =>
      u -> ((ref - g.map(_._2).max) / 86400000000L, g.length.toLong, g.map(_._3).sum)
    }
    got.foreach { case (u, rd, f, m, rb, fb, mb, seg) =>
      assert(want(u) == ((rd, f, m)), s"user $u metrics ${(rd, f, m)} != ${want(u)}")
      assert(seg == s"$rb$fb$mb")
      assert(Seq(rb, fb, mb).forall(b => b >= 1 && b <= 3))
    }
    // terciles are balanced within 1 (NTILE contract) on every axis
    Seq(got.map(_._5), got.map(_._6), got.map(_._7)).foreach { bins =>
      val sizes = bins.groupBy(identity).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"unbalanced terciles: $sizes")
    }
    // bin order follows metric order: a strictly more recent user never
    // lands in a worse recency bin
    val byR = got.sortBy(t => (t._2, t._1)).map(_._5)
    assert(byR.toSeq == byR.sorted.toSeq, "r_bin not monotone in recency order")
  }

  test("corpus_curate_order: exact stagewise recompute (survivors -> budget -> order)") {
    import spark.implicits._
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val survivors = graft.operators.Dedup.survivors.run(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"lang", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .filter(d => survivors.contains(d._1))
    // budget stage: per-lang greedy prefix under 2000 tokens
    val ranked = docs.map { case (id, lang, src, text) =>
      val toks = text.split(' ').filter(_.nonEmpty)
      (id, lang, src, toks.length.toLong, toks.distinct.length.toLong)
    }.filter(_._4 > 0)
    val selected = ranked.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val ordered = g.sortBy(d => (-(d._5 * 1000000L / d._4), d._1))
      ordered.scanLeft(0L)(_ + _._4).zip(ordered)
        .filter { case (prev, d) => prev + d._4 <= 2000L }
        .map(_._2)
    }
    // interleave stage over the selected set
    val sources = selected.map(_._3).distinct.sorted
    val sIdx = sources.zipWithIndex.toMap
    val want = selected.groupBy(_._3).toSeq.flatMap { case (src, g) =>
      g.sortBy(d => (md5("order:" + d._1), d._1)).zipWithIndex.map { case (d, r) =>
        (d._1, d._2, src, d._4, r.toLong * sources.length + sIdx(src)) }
    }.toSet
    val got = Pipeline.curateOrder.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty && got.size < docs.length,
      "the budget must select a strict subset of survivors")
  }

  test("events_k_anonymity: exact QI-group recompute; suppression iff users < k; totals conserve") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", expr("unix_micros(ts)").as("t"), $"value", $"user_id")
      .collect()
      .map { r =>
        ((r.getString(0), r.getLong(1) / 86400000000L,
          math.round(r.getDouble(2) * 100) / 5000L), r.getLong(3))
      }
    val want = ev.groupBy(_._1).map { case (qi, rows) =>
      val users = rows.map(_._2).distinct.length.toLong
      (qi._1, qi._2, qi._3, users, rows.length.toLong, users < 5)
    }.toSet
    val got = Pipeline.eventsKAnonymity.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got.toSet == want, "QI groups must equal the exact recompute")
    assert(got.forall(r => r._6 == (r._4 < 5)), "suppressed iff n_users < k")
    assert(got.map(_._5).sum == ev.length.toLong,
      "every event lands in exactly one QI group")
    assert(got.exists(_._6) && got.exists(!_._6),
      "fixture must exercise both verdicts or the gate proves nothing")
  }

  test("events_heavy_hitters: exact recompute of the relative-threshold frequent items") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"event_type", $"user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perUser = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byType = ev.groupBy(_._1)
    val want = perUser.flatMap { case ((t, u), n) =>
      val nType = byType(t).length.toLong
      val nUsers = byType(t).map(_._2).distinct.length.toLong
      if (n * nUsers * 2 >= nType * 3)
        Some((t, u, n, nType, nUsers, n * nUsers * 1000 / nType))
      else None
    }.toSet
    val got = Pipeline.eventsHeavyHitters.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want, "heavy-hitter rows must equal the exact recompute")
    assert(got.nonEmpty, "fixture must surface at least one heavy hitter")
    assert(got.forall(_._6 >= 1500L), "every emitted row clears 1.5x uniform")
    // and some user somewhere must NOT be a hitter, or the gate is vacuous
    assert(got.size < perUser.size)
  }

  test("events_outliers_mad: exact median/MAD recompute; robust gate differs from the z-test") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select($"event_id", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else s(n / 2 - 1) + 0.5 * (s(n / 2) - s(n / 2 - 1))
    }
    val byType = ev.groupBy(_._2)
    val want = byType.flatMap { case (t, rows) =>
      val med = medianOf(rows.map(_._3.toDouble).toSeq)
      val devs = rows.map(r => math.abs(r._3 - med))
      val mad = medianOf(devs.toSeq)
      rows.filter(r => math.abs(r._3 - med) > mad * (3 * 1.4826))
        .map(r => (r._1, t, r._3, med, mad)).toSeq
    }.toSet
    val got = Pipeline.eventsOutliersMad.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got == want, "MAD gate must equal the exact recompute")
    assert(got.nonEmpty, "fixture must surface robust outliers")
    // the robust gate must actually behave differently from the z-test
    // (means/sigmas are dragged by the tail; medians are not)
    val z = Pipeline.eventOutliers.run(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(got.map(_._1) != z, "MAD and z-test gates coincide — nothing robust here")
  }

  test("corpus_zorder: interleave arithmetic exact; lang predicates prune files") {
    import spark.implicits._
    val rows = Pipeline.corpusZorder.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val langs = rows.map(_._2).distinct.sorted
    val xOf = langs.zipWithIndex.map { case (l, i) => l -> math.min(i.toLong, 15L) }.toMap
    def morton(x: Long, y: Long): Long =
      (0 until 4).map(i => (((x >> i) & 1) << (2 * i + 1)) + (((y >> i) & 1) << (2 * i))).sum
    rows.foreach { case (id, lang, nChars, x, y, zkey, fileId) =>
      assert(x == xOf(lang), s"doc $id lang index")
      assert(y == math.min(nChars / 64, 15L), s"doc $id size bucket")
      assert(zkey == morton(x, y), s"doc $id zkey")
      assert(fileId == zkey / 16, s"doc $id file assignment")
    }
    // the layout claim: a single-lang scan touches a strict subset of
    // the 16-way file set (file-level min/max on zkey prunes the rest)
    val allFiles = rows.map(_._7).distinct.toSet
    if (langs.length > 1) langs.foreach { l =>
      val mine = rows.filter(_._2 == l).map(_._7).distinct.toSet
      assert(mine.subsetOf(allFiles) && mine.size < allFiles.size,
        s"lang $l must not touch every z-file")
    }
  }

  test("sample_weighted: Efraimidis-Spirakis draw is exact, ranked, weight-favoring") {
    val rows = Pipeline.sampleWeighted.run(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 200)
    assert(rows.map(_._1).toSeq == (1 to 200), "ranks dense")
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._5 > b._5 || (a._5 == b._5 && a._2 < b._2) }, "key order with doc_id tiebreak")
    assert(rows.forall(_._4 >= 1L), "zero-weight docs excluded")
    // the draw favors weight: the sampled docs' mean token count must
    // exceed the corpus mean (PPS property, deterministic here)
    val corpus = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("CAST(size(filter(split(text, ' '), x -> x != '')) AS LONG) w")
      .collect().map(_.getLong(0)).filter(_ >= 1L)
    val corpusMean = corpus.sum.toDouble / corpus.length
    val sampleMean = rows.map(_._4).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
    // exact key recompute for the top row
    val top = rows.head
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(top._2.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val v = java.lang.Long.parseLong(hex, 16)
    val key = math.round(1e9 * math.log((v + 1) / 4294967296.0) / top._4.toDouble)
    assert(key == top._5, s"key recompute: $key != ${top._5}")
  }
}
