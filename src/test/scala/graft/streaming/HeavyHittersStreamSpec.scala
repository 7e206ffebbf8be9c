package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Space-saving heavy hitters: (1) below capacity the maintained
  * counters are exact and the emitted list equals the batch support
  * rule across a restartless two-batch drain; (2) the eviction path's
  * invariants hold under adversarial overflow — bounded size, no
  * undercount, the guaranteed-presence property for true-frequency ≥
  * total/capacity keys. */
class HeavyHittersStreamSpec extends SparkSuite {

  test("below capacity, streamed hitters equal the exact batch rule across two batches") {
    import spark.implicits._
    val phiInv = 32L
    val ev = graft.Tables.load(spark, sf0001, "events")
      .selectExpr("event_type", "user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (et, rows) =>
      val total = rows.length.toLong
      rows.groupBy(_._2).map { case (u, g) => (et, u, g.length.toLong, total) }
        .filter { case (_, _, n, t) => n * phiInv >= t }
    }.toSet

    val cutoffUs = ev.map(_._3).sorted.apply(ev.length / 2)
    val in = java.nio.file.Files.createTempDirectory("graft-hh-in")
    val scratch = java.nio.file.Files.createTempDirectory("graft-hh-scr")
    def addFile(pred: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = scratch.resolve(name)
      spark.read.parquet(s"$sf0001/events.parquet").filter(pred)
        .coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      val stream = graft.Tables.loadStream(
        spark, in.toString, "events", s"$sf0001/events.parquet")
      val q = HeavyHittersStream.hitters(stream, capacity = 4096, phiInv = phiInv)
        .writeStream.format("memory").queryName("hh_out")
        .outputMode("update").start()
      try {
        addFile(expr(s"unix_micros(cast(ts as timestamp)) < ${cutoffUs}L"), "b1")
        q.processAllAvailable()
        addFile(expr(s"unix_micros(cast(ts as timestamp)) >= ${cutoffUs}L"), "b2")
        q.processAllAvailable()
      } finally q.stop()
      val all = spark.table("hh_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      // keep only each type's LAST emission (highest version)
      val lastV = all.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val got = all.filter { case (et, v, _, _, _, _) => v == lastV(et) }
        .map { case (et, _, u, n, err, t) => assert(err == 0L); (et, u, n, t) }.toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally {
      new scala.reflect.io.Directory(in.toFile).deleteRecursively()
      new scala.reflect.io.Directory(scratch.toFile).deleteRecursively()
    }
  }

  test("overflow invariants: bounded size, no undercount, hot keys guaranteed present") {
    val cap = 8
    // adversarial: 200 distinct one-off keys interleaved with 3 hot keys
    val hot = Seq(1000L -> 50, 1001L -> 40, 1002L -> 30)
    val noise = (1L to 200L)
    val streamIds = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(hot.flatMap { case (k, n) => Seq.fill(n)(k) } ++ noise)
    val st = HeavyHittersStream.fold(HhState(0L, 0L, Nil), streamIds.iterator, cap)
    assert(st.counters.length <= cap)
    assert(st.total == streamIds.length.toLong)
    val trueCounts = streamIds.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val m = st.counters.map(c => c.user_id -> c).toMap
    // every key with true count >= total/cap is present (space-saving guarantee)
    trueCounts.filter { case (_, n) => n >= st.total / cap }.keys.foreach { k =>
      assert(m.contains(k), s"hot key $k evicted")
    }
    // estimates never undercount, and err bounds the overcount
    m.foreach { case (k, c) =>
      val t = trueCounts.getOrElse(k, 0L)
      assert(c.n >= t, s"undercount for $k")
      assert(c.n - c.err <= t, s"err bound violated for $k")
    }
    // incremental fold (two passes) equals one pass over the concatenation
    val (a, b) = streamIds.splitAt(streamIds.length / 2)
    val st2 = HeavyHittersStream.fold(
      HeavyHittersStream.fold(HhState(0L, 0L, Nil), a.iterator, cap), b.iterator, cap)
    assert(st2.total == st.total && st2.counters == st.counters,
      "state must be a pure fold of the stream")
  }
}
