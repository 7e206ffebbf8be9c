package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  test("binary plumbing: blob bytes round-trip the text") {
    import spark.implicits._
    val df = Multimodal.withBlob(Seq((1L, "hello world")).toDF("doc_id", "text"))
    val row = df.head()
    assert(new String(row.getAs[Array[Byte]]("blob"), "UTF-8") == "hello world")
    assert(row.getAs[org.apache.spark.sql.Row]("media_meta").getAs[Int]("n_bytes") == 11)
  }

  test("png encode → ImageIO decode recovers the closed-form pixels exactly") {
    Seq(0L, 1L, 17L, 255L, 499L).foreach { id =>
      val f = Multimodal.decodeImage(id, Multimodal.pngFor(id))
      val (w, h) = (8 + (id % 16).toInt, 8 + ((id * 7) % 16).toInt)
      assert(f.width == w && f.height == h, s"id=$id got ${f.width}x${f.height}")
      assert(f.channels == 3)
      val sum = (for { y <- 0 until h; x <- 0 until w }
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(f.mean_byte == sum.toDouble / (w.toLong * h), s"id=$id mean drifted")
    }
  }

  test("real decode emits deterministic schema'd features over the corpus") {
    val feats = Multimodal.features.run(spark, sf0001)
    assert(feats.columns.toSeq == Seq("doc_id", "width", "height", "channels", "mean_byte"))
    assert(feats.count() == 500)
    assert(feats.filter(col("channels") =!= 3).count() == 0)
    // determinism: same input → same features
    val a = feats.collect().map(_.toSeq)
    val b = Multimodal.features.run(spark, sf0001).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("frame sampling strides the blob") {
    val frames = Multimodal.frames.run(spark, sf0001)
    assert(frames.count() > 0)
    assert(frames.filter(col("frame_idx") > 3).count() == 0)
  }

  test("resize: decoded 4x4 block-average equals the closed-form recomputation") {
    val out = Multimodal.resize.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3).split(',').toSeq.map(_.toInt)))
    assert(out.length == 500)
    out.take(25).foreach { case (id, w, h, thumb) =>
      assert(w == 8 + (id % 16).toInt && h == 8 + ((id * 7) % 16).toInt)
      assert(thumb.length == 16)
      for (j <- 0 until 4; i <- 0 until 4) {
        val (y0, y1) = (j * h / 4, (j + 1) * h / 4)
        val (x0, x1) = (i * w / 4, (i + 1) * w / 4)
        val vals = for (y <- y0 until y1; x <- x0 until x1)
          yield ((id * 31 + x * 7 + y * 13) % 256)
        val want = (vals.sum / vals.length).toInt
        assert(thumb(j * 4 + i) == want, s"doc $id block ($i,$j)")
      }
    }
  }

  test("phash: decoded dHash equals the closed-form recomputation, with real variety") {
    val out = Multimodal.phash.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.length == 500)
    out.take(25).foreach { case (id, w, h, got) =>
      val blocks = (0 until 16).map { k =>
        val (j, i) = (k / 4, k % 4)
        val (y0, y1) = (j * h / 4, (j + 1) * h / 4)
        val (x0, x1) = (i * w / 4, (i + 1) * w / 4)
        val vals = for (y <- y0 until y1; x <- x0 until x1)
          yield ((id * 31 + x * 7 + y * 13) % 256)
        (vals.sum / vals.length).toInt
      }
      var want = 0L
      for (k <- 0 until 12) {
        val (j, i) = (k / 3, k % 3)
        if (blocks(j * 4 + i) < blocks(j * 4 + i + 1)) want |= 1L << (23 - k)
      }
      for (k <- 0 until 12) {
        val (j, i) = (k / 4, k % 4)
        if (blocks(j * 4 + i) < blocks((j + 1) * 4 + i)) want |= 1L << (11 - k)
      }
      assert(got == want, s"doc $id phash $got != $want")
      assert(got >= 0L && got < (1L << 24), s"doc $id phash out of 24-bit range")
    }
    // gradient-sign hashes must actually discriminate across the corpus
    assert(out.map(_._4).distinct.length > 50, "phash collapsed — no discriminative power")
  }

  test("image near-dup clusters: planted exact copies always co-cluster; " +
      "clustering IS the transitive closure of hamming<=2 pairs") {
    val clusters = graft.operators.Dedup.imagePhash.run(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(0))).toMap // doc_id -> canonical
    // planted near-copy recall: the generator's pixel formula repeats
    // every 256 doc_ids (pixels mod 256, dims mod 16), so (i, i+256)
    // are byte-identical images — hamming 0, MUST share a cluster
    val planted = (0L until 244L).map(i => (i, i + 256L))
    planted.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b),
        s"exact-copy pair ($a,$b) missing from the clustering")
      assert(clusters(a) == clusters(b),
        s"exact copies $a and $b landed in different clusters")
    }
    // the clustering equals the transitive closure of the hamming<=2
    // pair graph recomputed from the phash column on the driver
    val sig = Multimodal.phash.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val pairs = for {
      (a, ha) <- sig; (b, hb) <- sig
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (a, b)
    // union-find over the exact pair set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val wantMembers = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(clusters.keySet == wantMembers.toSet,
      "clustering must cover exactly the docs that appear in a hamming<=2 pair")
    wantMembers.groupBy(find).values.foreach { members =>
      assert(members.map(clusters).distinct.length == 1,
        s"component ${members.take(5)} split across clusters")
      assert(clusters(members.head) == members.min,
        s"canonical of ${members.take(5)} is not the component min")
    }
  }
  test("audio features: byte-level decode equals a pure sample-domain recompute") {
    val rows = Multimodal.audioFeatures.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 500)
    rows.foreach { case (id, n, energy, rms, zc) =>
      val want = (0 until (256 + id % 512).toInt)
        .map(i => (((id * 2654435761L + i * 40503L) % 65536L) - 32768L))
      assert(n == want.length.toLong, s"doc $id n_samples")
      assert(energy == want.map(v => v * v).sum, s"doc $id energy")
      assert(zc == want.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)), s"doc $id zc")
      assert(rms == math.round(math.sqrt(energy.toDouble / n) * 1e6), s"doc $id rms")
    }
    // the parse really is byte-level: a corrupted LE16 stream must change features
    val bytes = Multimodal.pcmFor(7L)
    assert(bytes.length == (256 + 7 % 512) * 2)
  }

  test("audio fingerprint dedup: every group pairs a clip with its half-volume re-encode") {
    val rows = Multimodal.audioFpDedup.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    val nDocs = graft.Tables.load(spark, sf0001, "documents").count()
    assert(rows.length.toLong == nDocs, "one group per source document")
    rows.foreach { case (_, nClips, canon, clipIds, rmsMin, rmsMax) =>
      assert(nClips == 2L, s"group $canon size")
      assert(canon % 2 == 0, s"canonical clip must be the original, got $canon")
      assert(clipIds == s"$canon,${canon + 1}", s"group $canon must pair id with id+1")
      // volume invariance is the claim: fingerprints matched while the
      // re-encode's RMS is strictly lower (half volume ⇒ ~half rms)
      assert(rmsMin < rmsMax, s"group $canon: volumes should differ")
      assert(rmsMin * 2 <= rmsMax + 1000000L, s"group $canon: rms ratio implausible")
    }
    // driver recompute of one fingerprint pair: same signs, halved samples
    def signs(b: Array[Byte]): String =
      (0 until b.length / 2).map { i =>
        val v = ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt
        if (v < 0) '1' else '0'
      }.mkString
    val (orig, half) = (Multimodal.pcmVariant(3L, halved = false),
      Multimodal.pcmVariant(3L, halved = true))
    assert(signs(orig) == signs(half), "floor-halving must preserve every sign")
    assert(!orig.sameElements(half), "the re-encode must actually change the bytes")
  }

}
