package graft.operators

import graft.SparkSuite

/** Driver-side recomputation gates for the Advanced relational family
  * (the rest of the family is pinned by the DuckDB oracle gate; these
  * cover the semantics the hash compare can't explain when it fails).
  */
class AdvancedSpec extends SparkSuite {

  test("q30 range frame EQUALS a two-pointer trailing-10-minute recompute per user") {
    val ev = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("event_id", "user_id", "CAST(unix_timestamp(ts) AS BIGINT) epoch_s",
        "CAST(ROUND(value * 100) AS BIGINT) cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // per user: sort by epoch second and slide a [t-600, t] window; RANGE
    // frames include ALL peers of the current order value, so every row
    // sharing a second gets the same frame
    val want = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(_._3)
      sorted.map { case (id, u, t, _) =>
        val in = sorted.filter(r => r._3 >= t - 600 && r._3 <= t)
        (id, u, t, in.length.toLong, in.map(_._4).sum)
      }
    }.toSet

    val got = Advanced.rangeFrame.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(want.exists(_._4 > 1), "fixture should have overlapping 10-minute frames")
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("market basket pairs EQUAL a pure-Scala basket recompute (threshold + top-100 total order)") {
    val li = graft.Tables.load(spark, sf0001, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val sup = li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val basket = rows.map(_._2).distinct.sorted
      for (i <- basket.indices; j <- i + 1 until basket.length)
        yield (basket(i), basket(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .collect { case ((p1, p2), s) if s >= 2 => (p1, p2, s) }
    val want = sup.sortBy { case (p1, p2, s) => (-s, p1, p2) }.take(100)

    val got = Advanced.marketBasket.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(want.exists(_._3 >= 2), "fixture should have a pair ordered together twice")
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("running distinct: monotone per type, ends at the exact distinct user count") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val got = Advanced.runningDistinct.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == ev.length)
    val byId = got.map(r => r._1 -> r._3).toMap
    ev.groupBy(_._2).foreach { case (t, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._1))
      // exact recompute: distinct users among the first k events
      var seen = Set.empty[Long]
      ordered.foreach { r =>
        seen += r._3
        assert(byId(r._1) == seen.size.toLong, s"type $t event ${r._1}")
      }
      assert(byId(ordered.last._1) == rows.map(_._3).distinct.length.toLong,
        s"type $t final count")
    }
  }
}
