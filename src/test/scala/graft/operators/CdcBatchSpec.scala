package graft.operators

import graft.SparkSuite

/** Recomputation specs for the round-6 CDC batch additions. */
class CdcBatchSpec extends SparkSuite {

  test("scd2: intervals tile each subject's history, exactly one current row per subject") {
    val rows = CdcBatch.scd2.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (uid, hist) =>
      val sorted = hist.sortBy(h => (h._3, h._1)) // (valid_from, event_id)
      // each valid_to is the NEXT version's valid_from; only the last is open
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $uid: interval gap at event ${a._1}")
          assert(!a._5, s"user $uid: non-final row marked current")
        case _ => ()
      }
      val last = sorted.last
      assert(last._4.isEmpty && last._5, s"user $uid: final row must be open+current")
      assert(hist.count(_._5) == 1, s"user $uid: exactly one current row")
    }
  }

  test("payload redact: output is digit-free and counts every digit run") {
    val s = spark
    import s.implicits._
    val in = graft.Tables.load(spark, sf0001, "events")
      .select($"event_id", $"props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = CdcBatch.payloadRedact.run(spark, sf0001).collect()
    assert(out.length == in.size)
    val runRe = "[0-9]+".r
    out.foreach { r =>
      val (id, red, n) = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(!red.exists(_.isDigit), s"event $id: digits survived redaction")
      val runs = runRe.findAllIn(in(id)).toSeq
      assert(n == runs.length, s"event $id: n_redacted $n != ${runs.length}")
      assert(red == runRe.replaceAllIn(in(id), "#"), s"event $id: redaction drifted")
    }
  }

  test("payload schema: discovered key population matches the mod-3 heterogeneity exactly") {
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = ev.flatMap { case (id, t) =>
      val keys = (id % 3) match {
        case 1 => Seq("k", "tag")
        case 2 => Seq("k", "meta")
        case _ => Seq("k")
      }
      keys.map(k => (t, k))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = CdcBatch.payloadSchema.run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == want,
      "key population must equal the mod-3 construction")
    got.foreach { case (t, k, n, nt, pm) =>
      assert(nt == totals(t), s"($t,$k) total")
      assert(pm == n * 1000000L / nt, s"($t,$k) presence fraction")
      if (k == "k") assert(n == nt, "the base key must be universal")
      else assert(n < nt, s"augmented key $k must be partial")
    }
    // every type discovers all three key shapes — schema drift is visible
    assert(got.map(_._1).distinct.forall(t =>
      Set("k", "tag", "meta").subsetOf(got.filter(_._1 == t).map(_._2).toSet)))
  }
}
