package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** CDC apply/materialize: the streaming state fold must converge to the
  * same current-state table the batch (oracle-gated) form computes. */
class CdcApplySpec extends SparkSuite {

  test("LWW transition: ordering, deletes, and resurrection") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // uid 1: insert, update, delete → absent
      (1L, 1L, "signup", 1000L, 1.0),
      (2L, 1L, "click", 2000L, 2.0),
      (3L, 1L, "error", 3000L, 0.0),
      // uid 2: insert, delete, REINSERT → present with the reinsert
      (4L, 2L, "signup", 1000L, 1.0),
      (5L, 2L, "error", 2000L, 0.0),
      (6L, 2L, "signup", 3000L, 7.0),
      // uid 3: out-of-order arrival — older update after newer one
      (7L, 3L, "click", 5000L, 9.0),
      (8L, 3L, "view", 4000L, 4.0)
    )
    val dir = java.nio.file.Files.createTempDirectory("graft-apply").toString
    rows.toDF("event_id", "user_id", "event_type", "ts_ms", "value")
      // the real events.parquet carries int64 NANOS (Tables.load does
      // `ts div 1000`); mimic that exactly
      .withColumn("ts", $"ts_ms" * lit(1000000L)).drop("ts_ms")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = CdcApply.applyState.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(4))).toMap
    assert(!got.contains(1L), "deleted key must be absent")
    assert(got(2L) == ((6L, "i", 7.0)), "reinsert after delete resurrects")
    assert(got(3L) == ((7L, "u", 9.0)), "newest-by-(ts,seq) wins")
  }

  test("schema evolution: a field appearing mid-log joins the union state and survives its loss") {
    val s = spark
    import s.implicits._
    // parsed change frame (user_id, event_id, ts_us, op, k, tag, meta_src)
    val parsed = Seq(
      // uid 1: tag APPEARS at e2, the payload LOSES it again at e3 —
      // union-schema fold keeps k from e3 and tag from e2
      (1L, 1L, 1000L, "i", Some(1L), None: Option[String], None: Option[String]),
      (1L, 2L, 2000L, "u", Some(2L), Some("a"), None),
      (1L, 3L, 3000L, "u", Some(3L), None, None),
      // uid 2: newest op is a delete → absent from state
      (2L, 4L, 1000L, "i", Some(9L), Some("z"), None),
      (2L, 5L, 2000L, "d", None, None, None),
      // uid 3: never sent tag → explicit null backfill; nested meta
      // appears mid-log and is retained
      (3L, 6L, 1000L, "i", Some(5L), None, None),
      (3L, 7L, 2000L, "u", None, None, Some("cdc")),
      // uid 4: same-ts tie broken by event_id — e9's tag wins
      (4L, 8L, 1000L, "i", None, Some("old"), None),
      (4L, 9L, 1000L, "u", None, Some("new"), None)
    ).toDF("user_id", "event_id", "ts_us", "op", "k", "tag", "meta_src")
    val got = CdcApply.unionSchemaFold(parsed).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        Option(r.getString(6)), Option(r.getString(7))))).toMap
    assert(got(1L) == ((3L, 1L, "u", Some(3L), Some("a"), None)),
      s"mid-log field must survive its later absence: ${got(1L)}")
    assert(!got.contains(2L), "deleted key must be absent")
    assert(got(3L) == ((2L, 0L, "u", Some(5L), None, Some("cdc"))),
      s"never-sent field is a null backfill; nested field retained: ${got(3L)}")
    assert(got(4L)._5 == Some("new"), "same-ts tie resolves by event_id")
  }

  test("streaming apply-state converges to the batch state on the real fixture") {
    implicit val s = spark
    import s.implicits._
    // stage the parquet fixture as a stream directory, read with the
    // same vintage-normalization batch code uses
    val dir = java.nio.file.Files.createTempDirectory("graft-applystream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = graft.Tables.loadStream(spark, dir.toString, "events",
      s"$sf0001/events.parquet")
      .withWatermark("ts", "1 hour")   // tombstone reaping needs a watermark

    val q = CdcApply.applyStateStream(raw)
      .writeStream.format("memory").queryName("apply_out")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // memory sink in update mode appends every emission; the final
      // state per key is its LAST emission (tombstones drop the key)
      val emissions = spark.table("apply_out").collect()
      val finalState = emissions.zipWithIndex
        .groupBy(_._1.getLong(0))
        .map { case (uid, rs) => uid -> rs.maxBy(_._2)._1 }
        .filter { case (_, r) => r.getString(2) != "d" }
        .map { case (uid, r) =>
          uid -> (r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)) }
      val batch = CdcApply.applyState.run(spark, sf0001).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
        .toMap
      assert(finalState == batch,
        s"stream/batch drift: stream=${finalState.size} batch=${batch.size} keys")
    } finally q.stop()
  }

  test("time travel EQUALS apply-state over the ts<=T prefix, and the suffix changes state") {
    implicit val s = spark
    import s.implicits._
    val evRows = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) ts_us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val (mn, mx) = (evRows.map(_._4).min, evRows.map(_._4).max)
    val cut = mn + ((mx - mn) * 3) / 5

    // pure-Scala LWW over the prefix: last (ts, event_id) per user, drop deletes
    val want = evRows.filter(_._4 <= cut)
      .groupBy(_._2).flatMap { case (uid, rows) =>
        val (id, _, typ, ts, v) = rows.maxBy(r => (r._4, r._1))
        val op = typ match { case "signup" => "i"; case "error" => "d"; case _ => "u" }
        if (op == "d") None else Some((uid, id, op, ts, v, cut))
      }.toSet

    val got = CdcApply.timeTravel.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")

    // the pinned instant is in the log's interior (a real suffix is
    // excluded), and replaying that suffix actually moves the state —
    // as-of ≠ full (note neither ⊆ direction is an invariant: a
    // post-cut delete SHRINKS full state below the as-of one)
    val full = CdcApply.applyState.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(evRows.exists(_._4 > cut), "cut should exclude a suffix of the log")
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) != full,
      "fixture suffix should change at least one key's state")
  }
}
