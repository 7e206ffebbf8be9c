package graft.operators

import graft.SparkSuite

/** Extension-op dedup family: the probabilistic variants must agree
  * with the exact ground truth on the planted near-dups. */
class DedupSpec extends SparkSuite {

  private def pairs(name: String): Set[(Long, Long)] =
    Catalog.all.find(_.name == name).get
      .run(spark, sf0001)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH (verified) equals exact ngram-jaccard pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash output EQUALS its definition (all pairs within hamming<=3), " +
      "with pinned precision/recall vs the exact pair set") {
    // ground truth for the operator's own contract, computed independently
    // on the driver from the same kernel: banding is lossless for
    // hamming<=3 (4 chunks, pigeonhole), so the distributed operator must
    // return EXACTLY this set — an equality gate, not a similarity gate.
    val sigs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .flatMap(r => Dedup.simhashText(r.getString(1)).map(r.getLong(0) -> _)).toMap
    val ids = sigs.keys.toArray.sorted
    val want = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      if java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j))) <= 3
    } yield (ids(i), ids(j))).toSet
    val sim = pairs("dedup_simhash")
    assert(sim == want, s"operator drifted from its hamming<=3 definition: " +
      s"missing=${(want -- sim).take(5)} extra=${(sim -- want).take(5)}")

    // and the radius-3 pairs must be high-precision true near-dups;
    // recall vs the full j>=0.5 set is bounded by short-document vote
    // noise (planted pairs reach hamming 13 on this fixture) — the
    // high-recall text near-dup path is dedup_minhash_lsh, which the
    // suite separately gates as EQUAL to the exact pair set.
    val exact = pairs("dedup_ngram_jaccard")
    val recall = exact.count(sim.contains).toDouble / exact.size
    val precision = if (sim.isEmpty) 0.0 else sim.count(exact.contains).toDouble / sim.size
    info(s"simhash: recall=$recall precision=$precision |sim|=${sim.size} |exact|=${exact.size}")
    assert(precision >= 0.9, s"simhash precision $precision over ${sim.size} pairs")
    assert(recall >= 0.45, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("exact dedup canonicalizes by content hash") {
    val df = Dedup.exact.run(spark, sf0001)
    val total = df.selectExpr("sum(n_copies)").head().getLong(0)
    val docs = graft.Tables.load(spark, sf0001, "documents").count()
    assert(total == docs)                       // partition of the corpus
    assert(df.count() <= docs)
  }

  test("embedding brute-force baseline refuses to run above its scale fence") {
    spark.conf.set("graft.dedup.embedding.maxRows", "10")
    try {
      val err = intercept[IllegalArgumentException] {
        Dedup.embeddingCosine.run(spark, sf0001).count()
      }
      assert(err.getMessage.contains("vector_ann_lsh"))
    } finally spark.conf.unset("graft.dedup.embedding.maxRows")
  }

  test("embedding cosine near-dup pairs are symmetric-free and thresholded") {
    val df = Dedup.embeddingCosine.run(spark, sf0001)
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.45))
  }
  test("near-dup clusters are the transitive closure of the pair graph, min-canonical") {
    val prs = pairs("dedup_ngram_jaccard")
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    prs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = prs.flatMap(p => Seq(p._1, p._2))
    val want = verts.map(v => v -> find(v)).toMap
    val rows = Dedup.clusters.run(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))   // (doc, canonical, size)
    assert(rows.map(_._1).toSet == verts)
    rows.foreach { case (doc, canon, size) =>
      assert(canon == want(doc), s"doc $doc: canonical $canon != ${want(doc)}")
      assert(size == want.count(_._2 == want(doc)), s"doc $doc size $size")
    }
  }

  test("large-star/small-star CC matches min-label propagation on the fixture") {
    val a = Dedup.clusters.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dedup.clustersStar.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, s"only-prop=${(a -- b).take(3)} only-star=${(b -- a).take(3)}")
  }

  test("star contraction converges in O(log d) rounds on a deep chain") {
    import spark.implicits._
    // path 0-1-2-...-1024: diameter 1024. Min-label propagation needs
    // ~diameter rounds (clusters' 50-round fence would fail loudly);
    // star contraction must fold it in ~2·log2(1024) ≈ 20.
    val n = 1024L
    val chain = (0L until n).map(i => (i, i + 1)).toDF("x", "y")
    // the DISTRIBUTED contraction is what this test pins — disable the
    // small-graph driver fast path for its duration
    spark.conf.set("graft.dedup.cc.localEdgeThreshold", "0")
    val (lab, rounds) =
      try Dedup.connectedComponentsStar(spark, chain)
      finally spark.conf.unset("graft.dedup.cc.localEdgeThreshold")
    assert(rounds <= 20, s"took $rounds rounds — not contracting")
    val got = lab.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n + 1)
    assert(got.forall(_._2 == 0L), s"bad labels: ${got.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("star contraction handles forests, singleton-free vertex sets, and empty input") {
    import spark.implicits._
    // two components + a 2-cycle-ish duplicate edge + reversed pairs
    val pairs = Seq((5L, 3L), (3L, 9L), (9L, 5L), (20L, 21L), (21L, 20L))
      .toDF("x", "y")
    val (lab, _) = Dedup.connectedComponentsStar(spark, pairs)
    val m = lab.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
    val (empty, r0) = Dedup.connectedComponentsStar(spark, Seq.empty[(Long, Long)].toDF("x", "y"))
    assert(empty.collect().isEmpty && r0 == 0)
  }

  test("star CC with the reliable-checkpoint dial produces identical labels") {
    import spark.implicits._
    val pairs = Dedup.minhashLsh.run(spark, sf0001).select($"d1", $"d2")
      .localCheckpoint() // same input frame to both runs
    val dir = java.nio.file.Files.createTempDirectory("graft-ccreliable").toString
    try {
      spark.conf.set("graft.dedup.cc.localEdgeThreshold", "0")
      val (defaultLab, _) = Dedup.connectedComponentsStar(spark, pairs)
      val (reliableLab, _) =
        try Dedup.connectedComponentsStar(spark, pairs, reliableCheckpointDir = Some(dir))
        finally spark.conf.unset("graft.dedup.cc.localEdgeThreshold")
      val want = defaultLab.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = reliableLab.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(got.nonEmpty)
      // the dial actually engaged: reliable checkpoint files exist
      assert(new java.io.File(dir).listFiles.nonEmpty, "no reliable checkpoint written")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("contamination equals an exact 8-gram-overlap recomputation vs the benchmark split") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def grams8(text: String): Set[String] = {
      val toks = text.split(' ').filter(_.nonEmpty)
      if (toks.length < 8) Set.empty
      else toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), md5hex(r.getLong(0).toString).take(2), grams8(r.getString(1))))
    val benchGrams = docs.filter(_._2 >= "f0").flatMap(_._3).toSet
    val want = docs.filter(_._2 < "f0")
      .map { case (id, _, g) => id -> (g & benchGrams).size.toLong }
      .filter(_._2 > 0).toMap
    val got = Dedup.contamination.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"got=$got want=$want")
    assert(got.nonEmpty, "fixture should contain contaminated train docs")
  }

  test("survivors: one canonical per cluster, singletons kept, n_merged conserves the corpus") {
    val s2 = spark
    import s2.implicits._
    val labels = Dedup.clustersStar.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (canonical, member, size)
    val surv = Dedup.survivors.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3))) // (doc_id, n_merged)
    val total = graft.Tables.load(spark, sf0001, "documents").count()
    // every clustered member except its canonical is gone; canonicals stay
    val survIds = surv.map(_._1).toSet
    labels.foreach { case (canon, member, size) =>
      if (member == canon) {
        assert(survIds.contains(member), s"canonical $canon dropped")
        assert(surv.find(_._1 == member).get._2 == size, s"canonical $canon: n_merged != cluster size")
      } else assert(!survIds.contains(member), s"non-canonical $member kept")
    }
    // singletons (never clustered) all kept with n_merged = 1
    val clustered = labels.map(_._2).toSet
    assert(surv.filter(x => !clustered.contains(x._1)).forall(_._2 == 1L))
    // absorption conserves the corpus
    assert(surv.map(_._2).sum == total, "sum(n_merged) must equal the doc count")
  }

  test("embedding LSH near-dup: exact-subset precision and unique pairs on the fixture") {
    val exact = Dedup.embeddingCosine.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.embeddingLsh.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the probe algebra must emit each unordered pair exactly once
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    // exact-cosine verify at the same threshold -> precision is 1 by construction
    assert(got.toSet.subsetOf(exact), s"false positives: ${got.toSet -- exact}")
    // this fixture's pairs sit at cos 0.45-0.51 (theta ~ 60 deg), the worst
    // regime for 8 sign planes: the collision curve predicts ~0.44 per pair
    // at hamming<=2, and with only 7 exact pairs the deterministic planes
    // land on 1/7 here — the documented borderline-regime trade (the planted
    // test below pins the >=0.9 dup-regime recall this operator is FOR)
    val recall = got.length.toDouble / exact.size
    assert(exact.nonEmpty && recall >= 0.1, s"recall $recall (${got.length}/${exact.size})")
  }

  test("embedding LSH near-dup: recall >= 0.9 on planted near-identical vectors (the dup regime)") {
    val s2 = spark
    import s2.implicits._
    // 40 base vectors (deterministic, no RNG), each with one planted
    // near-copy: copy = base + small deterministic perturbation -> pairwise
    // cos ~ 0.99 for planted pairs, ~0 for unrelated ones
    val dim = 64
    def base(k: Int): Array[Double] =
      Array.tabulate(dim)(d => math.sin((k * dim + d + 7).toDouble))
    val rows = (0 until 40).flatMap { k =>
      val b = base(k)
      val dup = b.zipWithIndex.map { case (x, d) => x + 0.05 * math.cos((k + d).toDouble) }
      Seq((k.toLong * 2, b.map(_.toFloat)), (k.toLong * 2 + 1, dup.map(_.toFloat)))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-lshdup").toString
    rows.toDF("vec_id", "embedding").withColumn("label", org.apache.spark.sql.functions.lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Dedup.embeddingLsh.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 40).map(k => (k.toLong * 2, k.toLong * 2 + 1)).toSet
    val exact = Dedup.embeddingCosine.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "false positives vs the exact baseline")
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.9, s"planted-pair recall $recall — sign-LSH must catch near-identical dups")
  }

  test("substring dedup: spans EQUAL a pure-Scala recompute; clean removes exactly the covered tokens") {
    val k = Dedup.SubstringK
    val toks = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty)).toMap

    // independent recompute on the driver: count every k-shingle
    // corpus-wide, mark duplicated start positions, merge runs <= k apart
    val counts = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (t <- toks.values; i <- 0 to t.length - k)
      counts(t.slice(i, i + k).mkString(" ")) += 1
    val want = (for ((id, t) <- toks.toSeq) yield {
      val dupPos = (0 to t.length - k).filter(i => counts(t.slice(i, i + k).mkString(" ")) >= 2)
      val islands = dupPos.foldLeft(List.empty[List[Int]]) {
        case (acc @ (cur :: rest), p) if p - cur.head <= k => (p :: cur) :: rest
        case (acc, p) => List(p) :: acc
      }
      islands.map { isl =>
        (id, isl.last.toLong, isl.head.toLong + k - 1,
          (isl.head - isl.last + k).toLong, isl.length.toLong)
      }
    }).flatten.toSet
    val got = Dedup.substringDetect.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(want.nonEmpty, "fixture should contain duplicated substrings")
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")

    // clean side: per doc, n_removed equals the span coverage and the
    // surviving text is exactly the uncovered tokens in original order
    val spansByDoc = got.groupBy(_._1)
    val clean = Dedup.substringClean.run(spark, sf0001).collect()
    assert(clean.length == toks.size)
    clean.foreach { r =>
      val (id, nTok, nRem, txt) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val t = toks(id)
      val covered = spansByDoc.getOrElse(id, Set.empty)
        .flatMap { case (_, s, e, _, _) => s to e }
      assert(nTok == t.length)
      assert(nRem == covered.size, s"doc $id removed $nRem != covered ${covered.size}")
      val keptWant = t.indices.filterNot(i => covered.contains(i.toLong)).map(t)
      assert(txt == keptWant.mkString(" "), s"doc $id clean text drifted")
    }
  }

  test("semantic dedup: flags EQUAL a pure-Scala SemDeDup recompute, pairs subset of all-pairs") {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val e = graft.Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val nrm = e.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    val cents = e.filter(_._1 < 16).toSeq.sortBy(_._1)
    val cell = e.map { case (id, v) =>
      id -> cents.map { case (cid, c) => (dot(c, c) - 2.0 * dot(v, c), cid.toInt) }.min._2
    }
    val want = (for {
      (c, members) <- e.keys.groupBy(cell).toSeq
      i <- members
      hits = members.toSeq.filter(_ < i)
        .map(j => (j, dot(e(i), e(j)) / (nrm(i) * nrm(j))))
        .filter(_._2 >= 0.45)
      if hits.nonEmpty
    } yield (i, c, hits.map(_._1).min, math.round(hits.map(_._2).max * 1e6))).toSet
    val got = Dedup.semantic.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty, "fixture should contain within-cell semantic dups")
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")

    // every (dup_of, vec_id) flag is a pair the all-pairs baseline also
    // emits (same threshold, cell-restricted) — precision 1 by construction
    val allPairs = Dedup.embeddingCosine.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (v, _, d, _) =>
      assert(allPairs.contains((d, v)), s"flag ($d,$v) missing from all-pairs baseline")
    }
  }

  test("boilerplate chunks: per-doc counts EQUAL a pure-Scala cross-doc chunk-df recompute") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty))
      .filter(_._2.nonEmpty).toMap
    val chunks = toks.map { case (id, t) =>
      id -> (0 until t.length by 24).map(st => md5hex(t.slice(st, st + 32).mkString(" ")))
    }
    val flagged = chunks.toSeq.flatMap { case (id, fps) => fps.distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    assert(flagged.nonEmpty, "fixture should contain cross-doc shared chunks")
    val want = chunks.map { case (id, fps) =>
      (id, fps.length.toLong, fps.count(flagged).toLong)
    }.toSet
    val got = Dedup.boilerplate.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("incremental dedup EQUALS a pure-Scala recompute of the ingest split") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), md5hex(r.getString(1)), md5hex(r.getLong(0).toString)(0)))
    val hist = rows.filter(_._3 < '8').map(_._2).toSet
    val freshRows = rows.filter(_._3 >= '8')
    assert(hist.nonEmpty && freshRows.nonEmpty, "split should populate both sides")
    val want = freshRows.filterNot(r => hist(r._2))
      .groupBy(_._2)
      .map { case (md5, g) => (g.map(_._1).min, md5, g.length.toLong) }
      .toSet
    val got = Dedup.incremental.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // the fixture's texts are all distinct (like dedup_exact's
    // n_copies), so the anti join is correctly vacuous here — the
    // dup-carrying paths are exercised by the synthetic test below
  }

  test("incremental admission on synthetic dups: cross-batch rejected, in-batch collapsed") {
    import spark.implicits._
    // history knows A and B; the batch re-sends A (two copies) and B,
    // introduces D twice (in-batch dup) and E, F once each
    val hist = Seq("A", "B", "C").toDF("content_md5")
    val fresh = Seq(
      (1L, "A"), (2L, "D"), (3L, "D"), (4L, "E"), (5L, "B"), (6L, "F"), (7L, "A")
    ).toDF("doc_id", "content_md5")
    val want = Set((2L, "D", 2L), (4L, "E", 1L), (6L, "F", 1L))

    val exact = Dedup.admitNew(fresh, hist).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(exact == want, s"exact=$exact")

    // tiny sketch at high fpp so false positives are likely too: the
    // anti join must remove them, leaving output bit-identical
    val bloom = Dedup.bloomOf(spark, hist, expected = 4, fpp = 0.3)
    val bloomed = Dedup.admitNewBloom(fresh, hist, bloom).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(bloomed == want, s"bloomed=$bloomed")

    // the true cross-batch dups A and B MUST be caught by the sketch
    // (no false negatives), i.e. the might-contain branch is non-empty
    import org.apache.spark.sql.graftexpr.BloomFunctions.bloom_might_contain
    val caught = fresh.filter(bloom_might_contain($"content_md5", bloom))
      .select($"content_md5").distinct().as[String].collect().toSet
    assert(Set("A", "B").subsetOf(caught), s"sketch missed a true dup: $caught")
  }

  test("incremental minhash pairs ARE the cross-split slice of the full pair set") {
    def bucket(id: Long): Char =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.charAt(0)
    // the full-corpus near-dup pair set (itself oracled == exact
    // Jaccard pairs), re-oriented to (hist, fresh) across the split
    val want = Dedup.minhashLsh.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .flatMap { case (d1, d2, inter, uni) =>
        (bucket(d1) < '8', bucket(d2) < '8') match {
          case (true, false) => Some((d1, d2, inter, uni))
          case (false, true) => Some((d2, d1, inter, uni))
          case _ => None // both sides same half: not a cross-split pair
        }
      }.toSet
    val got = Dedup.incrementalMinhash.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty, "fixture must contain cross-split near-dups")
  }

  test("bloom-prefiltered incremental dedup is bit-identical to the exact form") {
    val exact = Dedup.incremental.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val bloomed = Dedup.incrementalBloom.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // no false negatives (Bloom property) + anti-join FP removal ⇒ equality;
    // a missing row here would mean the prefilter dropped a true dup's twin
    assert(bloomed == exact,
      s"missing=${(exact -- bloomed).take(3)} extra=${(bloomed -- exact).take(3)}")
  }

  private def stringShingles(text: String): Set[String] = {
    val toks = text.split(' ').filter(_.nonEmpty)
    (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
  }

  test("containment pairs EQUAL the directed-definition recompute; " +
      "planted quote-inclusion is found where symmetric Jaccard is blind") {
    // part 1: on the fixture, the prefix-filtered operator must equal a
    // brute-force recompute of its definition (all directed pairs with
    // inter >= 0.8*|S_a|, |S_a| >= 10) — losslessness of the CMS prefix
    val sets = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> stringShingles(r.getString(1)))
      .filter(_._2.size >= 10).toMap
    val want = (for {
      (a, sa) <- sets.iterator; (b, sb) <- sets.iterator
      if a != b
      inter = (sa & sb).size
      if inter * 5 >= sa.size * 4
    } yield (a, b, inter.toLong, sa.size.toLong)).toSet
    val got = Dedup.containmentPairs.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty, "fixture should contain containment pairs")

    // part 2: a short doc quoted verbatim inside a long one — directed
    // containment finds (short -> long) and ONLY that direction, while
    // the symmetric Jaccard gate never fires (j = 12/42 < 0.5)
    import spark.implicits._
    val words = (0 until 44).map(i => s"w$i")
    val long = words.mkString(" ")                  // 42 shingles
    val short = words.slice(10, 24).mkString(" ")   // 12 shingles, all in long
    val other = (0 until 20).map(i => s"z$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-containment").toString
    Seq((1L, long), (2L, short), (3L, other)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Dedup.containmentPairs.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted == Set((2L, 1L)),
      s"want only short-in-long (2,1), got $planted")
    val jaccard = Dedup.ngramJaccard.run(spark, dir).count()
    assert(jaccard == 0, "symmetric Jaccard must NOT fire on pure inclusion")
  }

  private def lev(a: String, b: String): Int = {
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      val t = prev; prev = cur; cur = t
    }
    prev(b.length)
  }

  test("edit-distance dedup EQUALS a driver Levenshtein recompute over the exact pair set") {
    val texts = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Dedup.ngramJaccard.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (d1, d2) =>
        val (t1, t2) = (texts(d1), texts(d2))
        (d1, d2, lev(t1, t2).toLong, math.max(t1.length, t2.length).toLong)
      }
      .filter { case (_, _, e, m) => e * 5 <= m }.toSet
    val got = Dedup.editDistance.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty, "fixture should contain edit-verified near-dups")
  }

  test("cluster-stats histogram is the exact rollup of the star labeling") {
    val labels = Dedup.clustersStar.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))) // (canonical_id, cluster_size)
    val want = labels.distinct.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap // size -> n_clusters
    val got = Dedup.clusterStats.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => t._1 -> t._2).toMap == want,
      s"histogram drifted from labeling: got=${got.toSeq} want=$want")
    got.foreach { case (size, nc, dups) =>
      assert(dups == (size - 1) * nc, s"dup_docs wrong for size=$size")
    }
    // total docs across the histogram equals labeled rows
    assert(got.map(t => t._1 * t._2).sum == labels.length.toLong)
  }

  test("snapshot near-dup diff: every changed doc self-pairs; statuses and " +
      "thresholds EQUAL the snapshot derivation") {
    import spark.implicits._
    def bucket(id: Long): Char =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.charAt(0)
    val got = Dedup.snapshotNeardup.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty, "fixture must contain cross-snapshot near-dups")
    // statuses follow the corpus_snapshot_diff derivation exactly
    got.foreach { case (newId, prevId, status, inter, uni) =>
      val b = bucket(newId)
      val want = if (b == 'f') "added" else "changed"
      assert(b == 'f' || b == '1' || b == '2', s"doc $newId is not in the fresh slice")
      assert(bucket(prevId) != 'f', s"prev $prevId is not in the v1 snapshot")
      assert(status == want, s"doc $newId status $status != $want")
      assert(3 * inter >= uni + inter, s"pair ($newId,$prevId) below the j>=2/3 gate")
    }
    // the headline refresh signal: a changed doc's v2 text (one
    // appended token) must near-dup its own v1 version — for every
    // changed doc long enough to shingle
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val changedLong = docs.collect { case (id, t)
      if (bucket(id) == '1' || bucket(id) == '2') &&
        t != null && t.split(" ").count(_.nonEmpty) >= 3 => id }.toSet
    val selfPairs = got.collect { case (n, p, _, _, _) if n == p => n }.toSet
    assert(changedLong.subsetOf(selfPairs),
      s"changed docs missing their own-v1 refresh pair: ${(changedLong -- selfPairs).take(5)}")
  }

  test("snapshot near-dup bands are LOSSLESS on the fixture: banded output equals " +
      "an exact cross-version recompute") {
    // The op's MinHash bands are probabilistic (a pair at the j-gate
    // misses a band with ~3e-2 probability); its DuckDB oracle computes
    // exact all-pairs. This pure-Scala exact recompute makes the
    // coverage assumption an explicit gate: a regenerated fixture whose
    // pairs slip the bands fails HERE with a named pair, not as an
    // opaque oracle hash mismatch (round-8 ADVICE).
    import spark.implicits._
    def bucket(id: Long): Char =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.charAt(0)
    def shingles(t: String): Set[String] = {
      val toks = Option(t).toSeq.flatMap(_.split(' ').filter(_.nonEmpty))
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val v1 = docs.collect { case (id, t) if bucket(id) != 'f' => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val fresh = docs.collect { case (id, t) if "f12".contains(bucket(id)) =>
      id -> shingles(if (bucket(id) == 'f') t else t + " rev2")
    }.filter(_._2.nonEmpty)
    val exact = (for {
      (nId, nSh) <- fresh
      (pId, pSh) <- v1
      inter = (nSh & pSh).size
      if 3 * inter >= nSh.size + pSh.size
    } yield (nId, pId)).toSet
    val banded = Dedup.snapshotNeardup.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact,
      s"band-missed pairs=${(exact -- banded).take(5)} phantom pairs=${(banded -- exact).take(5)}")
  }

  test("leakage-safe split: clusters never straddle splits; singletons equal the doc-hash split") {
    val rows = Dedup.splitLeakageSafe.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 500, "split must cover the whole corpus spine")
    // one split per cluster — the leakage guarantee itself
    rows.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $canon straddles splits: ${members.map(m => (m._1, m._3)).toSeq}")
    }
    // real clusters exist in the fixture, and at least one non-canonical
    // member INHERITS its canonical's split (the case a doc-hash split
    // gets wrong whenever the two hashes disagree)
    val nonCanon = rows.filter { case (id, canon, _) => id != canon }
    assert(nonCanon.nonEmpty, "fixture must contain non-singleton clusters")
    def hashSplit(id: Long): String = {
      val h2 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      if (h2 < "cd") "train" else if (h2 < "e6") "val" else "test"
    }
    assert(nonCanon.exists { case (id, _, split) => hashSplit(id) != split },
      "fixture never exercises the inherit-over-own-hash case")
    // singletons: identical to the doc-hash assignment (split_assign's
    // formula) — cluster safety is free on the non-duplicated corpus
    rows.filter { case (id, canon, _) => id == canon }.foreach { case (id, _, split) =>
      assert(split == hashSplit(id), s"singleton $id drifted from doc-hash split")
    }
    // all three splits materialize
    assert(rows.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  test("dedup-weighted mix: survivors of dedup_survivors, ceil(sqrt(n_merged)) copies each") {
    val want = Dedup.survivors.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // doc_id -> n_merged
    val got = Dedup.mixDedupWeighted.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // (doc_id, n_merged, copy_idx)
    val bySurvivor = got.groupBy(_._1)
    assert(bySurvivor.keySet == want.keySet,
      "weighted mix must cover exactly the survivor set")
    bySurvivor.foreach { case (id, copies) =>
      val n = want(id)
      assert(copies.forall(_._2 == n), s"survivor $id n_merged drifted")
      val expected = math.ceil(math.sqrt(n.toDouble)).toLong
      assert(copies.map(_._3).sorted.toSeq == (1L to expected),
        s"survivor $id has copies ${copies.map(_._3).sorted.toSeq}, want 1..$expected")
    }
    // the sub-linear regime is actually exercised: some cluster is big
    // enough that sqrt-weighting emits FEWER copies than its size
    assert(want.values.exists(n => math.ceil(math.sqrt(n.toDouble)).toLong < n),
      "fixture has no cluster where sqrt-weighting bites")
  }
  test("normalized dedup inverts the noisy re-crawl: every re-crawl groups with its " +
      "original while raw hashing finds nothing") {
    import spark.implicits._
    val clean = graft.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def noise(id: Long, t: String) = md5(id.toString).head match {
      case 'a' => t.toUpperCase + "!!"
      case _   => "  " + t.replace(" ", "  ") + " ."
    }
    def norm(t: String) = t.toLowerCase.replaceAll("[^a-z0-9 ]", "")
      .replaceAll(" +", " ").trim
    val recrawled = clean.filter { case (id, _) => "ab".contains(md5(id.toString).head) }
    assert(recrawled.nonEmpty, "fixture: the a/b slice must be non-empty")
    val crawl = clean ++ recrawled.map { case (id, t) => (id + 100000L, noise(id, t)) }
    // the operator's groups equal a pure-Scala recompute over the crawl view
    val want = crawl.groupBy { case (_, t) => md5(norm(t)) }
      .map { case (h, ms) => (ms.map(_._1).min, ms.size.toLong, h) }.toSet
    val got = Dedup.normalized.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want)
    // exactly the re-crawled originals carry n_copies = 2 with the
    // ORIGINAL doc_id canonical; everything else stays a singleton
    val dups = got.filter(_._2 > 1L)
    assert(dups.map(_._1) == recrawled.map(_._1).toSet,
      "normalization must recover each re-crawl to its original, nothing else")
    assert(dups.forall(_._2 == 2L))
    // raw hashing on the SAME view finds zero duplicates — the
    // operator's reason to exist
    assert(crawl.groupBy { case (_, t) => md5(t) }.size == crawl.length,
      "fixture drift: raw hashing already groups the re-crawl")
  }

  test("incremental label refresh equals a full v2 relabeling, and the affected " +
      "slice is a strict minority") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = graft.Tables.load(spark, sf0001, "documents")
    val bk = substring(md5($"doc_id".cast("string")), 1, 1)
    val fresh = d.filter(bk.isin("f", "1", "2"))
      .select($"doc_id",
        when(bk.isin("1", "2"), concat($"text", lit(" rev2")))
          .otherwise($"text").as("text"))
    val v2 = d.filter(!bk.isin("0", "f", "1", "2"))
      .select($"doc_id", $"text").unionAll(fresh).localCheckpoint()
    // ground truth: band-pair + star-CC the WHOLE v2 snapshot
    val (lab, _) = Dedup.connectedComponentsStar(
      spark, Dedup.neardupPairs(spark, v2).select($"d1", $"d2"))
    val labMap = lab.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = v2.select($"doc_id").collect().map(_.getLong(0))
      .map(id => id -> labMap.getOrElse(id, id)).toMap
    val got = Dedup.labelsIncremental.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"diff: ${(got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
    // the refresh must have something to carry over AND something to redo
    val dirtyOrNew = v2.filter(bk.isin("f", "1", "2")).count()
    assert(dirtyOrNew > 0 && dirtyOrNew < got.size / 2,
      s"fixture: fresh slice $dirtyOrNew of ${got.size} can't demonstrate carry-over")
    // labels that survived from v1 must be bit-identical to the v1 table
    val v1 = d.filter(bk =!= "f").select($"doc_id", $"text")
    val (lab1, _) = Dedup.connectedComponentsStar(
      spark, Dedup.neardupPairs(spark, v1).select($"d1", $"d2"))
    val lab1Map = lab1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v1Ids = v1.select($"doc_id").collect().map(_.getLong(0)).toSet
    val carried = got.count { case (id, l) =>
      v1Ids.contains(id) && lab1Map.getOrElse(id, id) == l }
    assert(carried > got.size / 2,
      s"only $carried of ${got.size} labels carried over on a ~3/16 diff")
  }

  test("incremental refresh: the persisted band index is never shuffled") {
    // the BandIndexSpec discipline inside dedup_labels_incremental:
    // fresh x v2 factors as fresh x index + fresh x fresh, so the
    // (b,bh)-bucketed v1 band table joins with its bucketing intact —
    // only the fresh side routes into the bucket layout. A refactor
    // that unions fresh bands into the index first (shuffling the
    // whole index every refresh) fails here.
    // the operator's own stage plans are hidden behind localCheckpoint
    // barriers (lineage truncation), so compose the SAME candidate
    // stage from the same pieces and probe its plan directly — the
    // BandIndexSpec method.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (_, _, bandsT) = Dedup.v1LabelArtifacts(spark, sf0001)
    val bk = substring(md5($"doc_id".cast("string")), 1, 1)
    val d = graft.Tables.load(spark, sf0001, "documents")
    val fresh = d.filter(bk.isin("f", "1", "2"))
      .select($"doc_id",
        when(bk.isin("1", "2"), concat($"text", lit(" rev2")))
          .otherwise($"text").as("text"))
    val dirty = d.filter(bk.isin("0", "1", "2")).select($"doc_id")
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // at fixture scale the planner rightly BROADCASTS the fresh side
    // (zero shuffle anywhere); the claim under test is the 100 TB
    // regime where the fresh slice exceeds broadcast — disable it so
    // the join must exploit the index's bucket layout instead
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fb = Dedup.minhashBandRows(spark, fresh)
        .select($"doc_id".as("fid"), $"b", $"bh")
      val hb = spark.table(bandsT)
        .join(broadcast(dirty), Seq("doc_id"), "left_anti")
        .select($"doc_id".as("vid"), $"b", $"bh")
      val stage = fb.join(hb, Seq("b", "bh"))
        .select(least($"fid", $"vid").as("d1"), greatest($"fid", $"vid").as("d2"))
      val plan = stage.queryExecution.executedPlan
      val shuffledBandScan = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.child.toString.contains("graft_v1_bands") => e
      }
      assert(shuffledBandScan.isEmpty,
        s"the persisted band index crossed an exchange:\n${shuffledBandScan.headOption}")
      val planStr = plan.toString
      assert(planStr.contains("graft_v1_bands"),
        "stage should read the persisted band table")
      assert(planStr.contains("SelectedBucketsCount") || planStr.contains("Bucketed: true"),
        s"band side must be a bucketed scan:\n${planStr.take(1200)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
  }

  test("dedup_crossmodal equals a driver union-find over the per-modality clusterings") {
    def clustersOf(q: Q): Map[Long, Long] =
      q.run(spark, sf0001).collect()
        .map(r => r.getLong(1) -> r.getLong(0)).toMap   // doc -> canonical
    val text = clustersOf(Dedup.clustersStar)
    val image = clustersOf(Dedup.imagePhash)
    val got = Dedup.crossModal.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // union-find over (canonical -> doc) edges from BOTH modalities
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def unite(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (text.toSeq ++ image.toSeq).foreach { case (doc, canon) => unite(doc, canon) }
    val expect = parent.keys.toSeq.map(v => v -> find(v))
      .groupBy(_._2).flatMap { case (_, members) =>
        val docs = members.map(_._1)
        val canon = docs.min
        docs.map(d => (canon, d, docs.size.toLong))
      }.toSet
    assert(got.toSet == expect,
      s"crossmodal ${got.length} rows != union closure ${expect.size}")

    // the union is load-bearing: some cluster must MERGE relations the
    // single modalities kept apart (two text clusters via an image
    // edge, or an image-only doc joining a text cluster)
    val merged = got.groupBy(_._1).values.exists { rows =>
      val docs = rows.map(_._2)
      docs.flatMap(text.get).distinct.size > 1 ||
        (docs.exists(text.contains) && docs.exists(d => !text.contains(d)))
    }
    assert(merged, "no crossmodal cluster bridges the two modalities")
  }

  test("dedup_threshold_curve: monotone in threshold, 0.5-point equals the exact pair set") {
    val rows = Dedup.thresholdCurve.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(50L, 70L, 90L))
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 >= b._2 && a._3 >= b._3 }, "tightening the threshold cannot add pairs")
    val exactPairs = Dedup.ngramJaccard.run(spark, sf0001).count()
    assert(rows.head._2 == exactPairs,
      s"the 50% point (${rows.head._2}) must equal dedup_ngram_jaccard's pair count ($exactPairs)")
  }
}
