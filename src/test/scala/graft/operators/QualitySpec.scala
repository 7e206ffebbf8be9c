package graft.operators

import graft.SparkSuite

class QualitySpec extends SparkSuite {

  test("dq_referential: every FK row audited, fixture spine is clean") {
    val rows = Quality.dqReferential.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val nLi = graft.Tables.load(spark, sf0001, "lineitem").count()
    val nOrd = graft.Tables.load(spark, sf0001, "orders").count()
    assert(rows.keySet == Set(
      "lineitem_fk_orders", "lineitem_fk_part", "lineitem_fk_supplier",
      "orders_fk_customer"))
    Seq("lineitem_fk_orders", "lineitem_fk_part", "lineitem_fk_supplier").foreach { c =>
      assert(rows(c)._1 == nLi, s"$c checked count")
    }
    assert(rows("orders_fk_customer")._1 == nOrd)
    // the generator emits a closed FK spine — every check passes, and a
    // passing check MUST report ok with zero violations
    rows.foreach { case (c, (_, v, ok)) =>
      assert(v == 0L && ok, s"$c expected clean, got $v violations")
    }
  }

  test("dq_constraints: row-local checks clean, key_unique fires exactly") {
    val rows = Quality.dqConstraints.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val li = graft.Tables.load(spark, sf0001, "lineitem")
    val nLi = li.count()
    assert(rows.size == 7)
    assert(rows.values.forall(_._1 == nLi), "all constraints audit every row")
    Seq("key_not_null", "quantity_positive", "discount_in_0_0.1",
      "tax_non_negative", "returnflag_in_ANR", "linestatus_in_OF").foreach { c =>
      assert(rows(c)._2 == 0L && rows(c)._3, s"$c expected clean")
    }
    // surplus rows beyond one per (orderkey, linenumber), recomputed on
    // the driver — the fixture's linenumber range genuinely collides,
    // so this constraint must FIRE (a vacuously-green audit proves
    // nothing about the failing path)
    val surplus = {
      import org.apache.spark.sql.functions._
      li.groupBy("l_orderkey", "l_linenumber").count()
        .agg(sum(col("count") - 1L)).head().getLong(0)
    }
    assert(surplus > 0L, "fixture should contain key collisions")
    assert(rows("key_unique")._2 == surplus && !rows("key_unique")._3)
  }

  test("events_attribution matches a driver-side replay") {
    val got = Quality.eventsAttribution.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), math.round(r.getDouble(4) * 100)))
    val sevenDaysUs = 7L * 86400L * 1000000L
    val attributed = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      var lastTouch: Option[(Long, String)] = None
      ordered.flatMap { case (_, ts, _, et, cents) =>
        val out =
          if (et == "purchase") {
            val ch = lastTouch match {
              case Some((tts, tt)) if ts - tts <= sevenDaysUs => tt
              case _ => "direct"
            }
            Seq((ch, cents))
          } else Seq.empty
        if (et == "view" || et == "click") lastTouch = Some((ts, et))
        out
      }
    }
    val expect = attributed.groupBy(_._1).map { case (ch, xs) =>
      ch -> ((xs.size.toLong, xs.map(_._2).sum))
    }
    assert(got == expect)
    // the fixture must exercise BOTH the attributed and the direct path
    assert(got.contains("direct") && (got.contains("view") || got.contains("click")))
  }

  test("events_ab_test matches a driver replay of counts and z statistic") {
    val row = Quality.eventsAbTest.run(spark, sf0001).head()
    val perUser = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "event_type", "cast(round(value * 100) as long) c")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (u, rows) =>
        u -> (rows.filter(_._2 == "purchase").map(_._3).sum > 60000L)
      }
    def variantOf(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 2)
      if (hex < "80") "A" else "B"
    }
    val byVar = perUser.groupBy { case (u, _) => variantOf(u) }
    val (nA, cA) = (byVar("A").size.toLong, byVar("A").count(_._2).toLong)
    val (nB, cB) = (byVar("B").size.toLong, byVar("B").count(_._2).toLong)
    assert((row.getLong(0), row.getLong(1), row.getLong(3), row.getLong(4)) ==
      ((nA, cA, nB, cB)))
    assert(row.getLong(2) == 1000000L * cA / nA)
    assert(row.getLong(5) == 1000000L * cB / nB)
    val pA = cA.toDouble / nA
    val pB = cB.toDouble / nB
    val pool = (cA + cB).toDouble / (nA + nB)
    val z =
      if (cA + cB == 0 || cA + cB == nA + nB) 0.0
      else (pA - pB) / math.sqrt(pool * (1.0 - pool) * (1.0 / nA + 1.0 / nB))
    assert(row.getLong(7) == math.round(1e6 * z))
    assert(row.getBoolean(8) == (math.abs(math.round(1e6 * z)) >= 1960000L))
    // both variants populated and the conversion rule discriminates
    assert(nA > 0 && nB > 0 && cA + cB > 0 && cA + cB < nA + nB)
  }

  test("events_resample: dense hourly grid, zero-filled gaps, exact running totals") {
    val rows = Quality.eventsResample.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      // grid is DENSE: consecutive rows are exactly one hour apart
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 - a._2 == 3600000L, s"user $u grid gap ${b._2 - a._2}")
        case _ => ()
      }
      // running total is the prefix sum of the hourly cents
      var cum = 0L
      sorted.foreach { case (_, _, _, cents, cumCents) =>
        cum += cents
        assert(cumCents == cum, s"user $u cum drift")
      }
    }
    // gap hours genuinely materialize as zero rows
    assert(rows.exists(_._3 == 0L), "no gap rows — resampling did nothing")
    // per-user totals equal the raw event aggregation
    val want = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "cast(round(value * 100) as long) c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    byUser.foreach { case (u, rs) =>
      assert(rs.maxBy(_._2)._5 == want(u), s"user $u total")
    }
  }
}
