package graft.streaming

import graft.SparkSuite
import graft.model.OplogEntry
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics of the quorum dedup (SURVEY.md §5.2 #3):
  * exactly-once emission at depth, below-quorum suppression, duplicate
  * absorption after emission. */
class QuorumDedupSpec extends SparkSuite {

  private def entry(h: Long, host: String, sec: Int): OplogEntry =
    OplogEntry(new java.sql.Timestamp(1700000000000L + sec * 1000L), sec, h,
      "i", "test.grades", None, s"""{"_id":$h}""", None, host)

  test("pure step: fires exactly once at depth") {
    var st = QuorumDedup.QuorumState(0, emitted = false)
    val fires = (1 to 5).map { _ =>
      val (next, fire) = QuorumDedup.step(st, 3)
      st = next
      fire
    }
    assert(fires == Seq(false, false, true, false, false))
    assert(st.seen == 5 && st.emitted)
  }

  test("streaming: emits once per key only at quorum depth 3") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[OplogEntry]
    val deduped = QuorumDedup(input.toDS().withWatermark("ts", "10 seconds"), 3)
    val q = deduped.writeStream.format("memory").queryName("quorum_out")
      .outputMode(OutputMode.Append).start()
    try {
      // h=1 reaches quorum (3 replicas), h=2 stays below (2), h=3 over
      // (4). Replica copies of one op share its (ts, tsInc) — the
      // primary assigns the clock and members replicate it verbatim
      input.addData(entry(1, "r1", 1), entry(2, "r1", 2), entry(3, "r1", 3))
      q.processAllAvailable()
      input.addData(entry(1, "r2", 1), entry(2, "r2", 2), entry(3, "r2", 3))
      q.processAllAvailable()
      input.addData(entry(1, "r3", 1), entry(3, "r3", 3), entry(3, "r4", 3))
      q.processAllAvailable()
      val out = spark.table("quorum_out").as[OplogEntry].collect()
      assert(out.map(_.h).sorted.toSeq == Seq(1L, 3L), s"got ${out.toSeq}")
      // late duplicate of an emitted op must NOT re-emit
      input.addData(entry(1, "r4", 1))
      q.processAllAvailable()
      assert(spark.table("quorum_out").count() == 2)
    } finally q.stop()
  }

  /** THE round-17 regression case, found by the all-dials soak: with
    * quorum state keyed by `h` alone, a LATER op on the same document
    * arriving while the first op's state was still inside the
    * lateness horizon was absorbed as a "late replica copy" and
    * silently dropped — an update within the horizon never reached
    * the index. The op identity is `(h, ts, tsInc)`; a new clock on
    * the same `h` is a NEW op that must reach its own quorum and emit
    * exactly once. */
  test("a later op on the same key inside the horizon is a NEW op, not a late copy") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[OplogEntry]
    // a LONG horizon: the first op's state is guaranteed resident
    // when the update arrives
    val deduped = QuorumDedup(input.toDS().withWatermark("ts", "1 hour"), 3)
    val q = deduped.writeStream.format("memory").queryName("quorum_upd_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(entry(5, "r1", 1), entry(5, "r2", 1), entry(5, "r3", 1))
      q.processAllAvailable()
      assert(spark.table("quorum_upd_out").count() == 1)
      // the UPDATE: same h, op clock +1 s, its own three replica copies
      input.addData(entry(5, "r1", 2), entry(5, "r2", 2), entry(5, "r3", 2))
      q.processAllAvailable()
      val out = spark.table("quorum_upd_out").as[OplogEntry].collect()
      assert(out.length == 2 && out.map(_.tsInc).sorted.toSeq == Seq(1, 2),
        s"an in-horizon update must emit as its own op: ${out.toSeq}")
      // a late replica copy of EITHER op is still absorbed
      input.addData(entry(5, "r4", 1), entry(5, "r4", 2))
      q.processAllAvailable()
      assert(spark.table("quorum_upd_out").count() == 2)
    } finally q.stop()
  }

  test("a replica copy arriving below the watermark cannot crash the query") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[OplogEntry]
    val deduped = QuorumDedup(input.toDS().withWatermark("ts", "2 seconds"), 3)
    val q = deduped.writeStream.format("memory").queryName("quorum_late_out")
      .outputMode(OutputMode.Append).start()
    try {
      // advance the watermark far past sec=1 with fresh keys
      input.addData(entry(7, "r1", 1000), entry(8, "r1", 2000))
      q.processAllAvailable()
      // straggler copy with event time way below the watermark: the
      // state timeout must clamp to watermark+1 (an unclamped
      // setTimeoutTimestamp(ts+1) throws and kills the whole query)
      input.addData(entry(9, "r1", 1))
      q.processAllAvailable()
      input.addData(entry(8, "r2", 2001))
      q.processAllAvailable()          // query still alive and progressing
      assert(q.isActive && q.exception.isEmpty,
        s"query died: ${q.exception}")
    } finally q.stop()
  }

  test("LIVE reconfiguration: a depth drop frees a stuck key MID-STREAM, no restart") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ctl = java.nio.file.Files.createTempDirectory("graft-depthctl")
      .toFile.getAbsolutePath
    QuorumDedup.DepthControl.publish(ctl, 1L, 3)
    val input = MemoryStream[OplogEntry]
    val out = QuorumDedup.applyLive(input.toDS(), ctl,
      defaultDepth = 3, watermark = "2 seconds")
    val q = out.writeStream.format("memory").queryName("quorum_live_drop")
      .outputMode(OutputMode.Append).start()
    try {
      // @ depth 3: h=1 quorate (emits at arrival), h=2 stuck at 2/3
      input.addData(entry(1, "r1", 1), entry(1, "r2", 1), entry(1, "r3", 1),
        entry(2, "r1", 2), entry(2, "r2", 2))
      q.processAllAvailable()
      def byKey = spark.table("quorum_live_drop").as[OplogEntry].collect()
        .groupBy(_.h).view.mapValues(_.toSeq).toMap
      assert(byKey.get(1L).map(_.size).contains(1))
      assert(!byKey.contains(2L), "h=2 must be below quorum")
      // a member LEAVES: the control channel drops depth to 2 — the
      // query keeps running, nothing restarts
      QuorumDedup.DepthControl.publish(ctl, 2L, 2)
      // the next watermark advance hands h=2's retained first copy to
      // the post-stage, which admits it at the NOW-current depth 2
      input.addData(entry(9, "r1", 1000))
      q.processAllAvailable()
      val freed = byKey.getOrElse(2L, Seq.empty)
      assert(freed.size == 1, s"stuck key must free exactly once: $freed")
      assert(freed.head.sourceHost == "r1", "emits the FIRST-arrived copy")
      // new traffic emits at the new depth through the arrival path
      // (the second replica copy carries the op's own clock)
      input.addData(entry(9, "r2", 1000))
      q.processAllAvailable()
      assert(byKey.get(9L).map(_.size).contains(1), "h=9 quorate at the new depth")
      assert(byKey(2L).size == 1, "no re-emission of the freed key")
    } finally q.stop()
  }

  test("LIVE reconfiguration: a depth raise retracts nothing and deepens the gate mid-stream") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ctl = java.nio.file.Files.createTempDirectory("graft-depthctl2")
      .toFile.getAbsolutePath
    QuorumDedup.DepthControl.publish(ctl, 1L, 2)
    val input = MemoryStream[OplogEntry]
    val out = QuorumDedup.applyLive(input.toDS(), ctl,
      defaultDepth = 2, watermark = "2 seconds")
    val q = out.writeStream.format("memory").queryName("quorum_live_raise")
      .outputMode(OutputMode.Append).start()
    try {
      // @ depth 2: h=1 emits on its second copy
      input.addData(entry(1, "r1", 1), entry(1, "r2", 1))
      q.processAllAvailable()
      def byKey = spark.table("quorum_live_raise").as[OplogEntry].collect()
        .groupBy(_.h).view.mapValues(_.toSeq).toMap
      assert(byKey.get(1L).map(_.size).contains(1))
      // a member JOINS: depth rises to 3 mid-stream
      QuorumDedup.DepthControl.publish(ctl, 2L, 3)
      // already-emitted h=1 stays emitted (late copy absorbed)...
      input.addData(entry(1, "r3", 1))
      // ...and h=2 now needs THREE copies: two leave it sub-quorum
      input.addData(entry(2, "r1", 3), entry(2, "r2", 3))
      q.processAllAvailable()
      assert(byKey(1L).size == 1, "no duplicate emission after the raise")
      assert(!byKey.contains(2L), "two copies no longer reach quorum")
      // the third copy fires the arrival path at the raised depth
      input.addData(entry(2, "r3", 3))
      q.processAllAvailable()
      assert(byKey.get(2L).map(_.size).contains(1))
      // h=3 goes quiet at 2/3: the watermark advance hands its copy to
      // the post-stage, which DROPS it at the raised depth (reaped,
      // exactly like the fixed-depth form's never-quorate keys)
      input.addData(entry(3, "r1", 5), entry(3, "r2", 5))
      q.processAllAvailable()
      input.addData(entry(9, "r1", 1000))
      q.processAllAvailable()
      assert(!byKey.contains(3L), "sub-quorum key must be reaped at the raised depth")
      assert(q.isActive && q.exception.isEmpty, s"query died: ${q.exception}")
    } finally q.stop()
  }

  test("replica-set reconfiguration: depth drop frees stuck keys, depth raise retracts nothing") {
    // The reference captures member count once at discovery
    // (MongoOplogTailMapper.java:64): a member leaving strands every op
    // one copy short of the old quorum FOREVER. Our depth is swapped at
    // restart (membership change re-plans the per-member source
    // partitions anyway) and timeouts re-check quorum at CURRENT depth.
    import java.nio.file.{Files, Paths}
    def line(h: Long, host: String, sec: Int): String =
      s"""{"ts":"2024-01-01T00:${f"${sec / 60}%02d"}:${f"${sec % 60}%02d"}.000Z","tsInc":$sec,"h":$h,"op":"i","ns":"t.c","o":"{}","o2":null,"sourceHost":"$host"}"""
    val root = Files.createTempDirectory("graft-reconf").toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()

    // phase 1 @ depth 3: h=1 quorate+emitted; h=2 stuck at 2/3 (the
    // third member is about to leave the set and will never report)
    Files.write(Paths.get(s"$src/b0.json"), Seq(
      line(1, "r1", 1), line(1, "r2", 1), line(1, "r3", 1),
      line(2, "r1", 2), line(2, "r2", 2)
    ).mkString("\n").getBytes("UTF-8"))
    val q1 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt", replicaDepth = 3)
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.json(s"$root/index/oplog").count() == 1)

    // phase 2: member r3 left → restart at depth 2. Fresh traffic from
    // the surviving members advances the watermark past h=2's event
    // time; its timeout re-check (seen=2 >= depth=2) must emit it.
    // h=1 must NOT re-emit (depth semantics never retract/duplicate).
    Files.write(Paths.get(s"$src/b1.json"), Seq(
      line(5, "r1", 300), line(5, "r2", 300)
    ).mkString("\n").getBytes("UTF-8"))
    val q2 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt", replicaDepth = 2)
    try q2.processAllAvailable() finally q2.stop()
    import spark.implicits._
    val hs = spark.read.json(s"$root/index/oplog")
      .select($"data.h").as[Long].collect().sorted.toSeq
    assert(hs == Seq(1L, 2L, 5L), s"depth drop left stuck/duplicated keys: $hs")

    // phase 3: a member joins → restart at depth 3. Emitted ops stay
    // emitted (late copies absorbed, nothing re-fires); a new op at
    // 2/3 stays below the deeper quorum until a third copy arrives.
    Files.write(Paths.get(s"$src/b2.json"), Seq(
      line(2, "r1", 2),                         // late copy of emitted h=2
      line(6, "r1", 400), line(6, "r2", 400)    // 2/3 under new depth 3
    ).mkString("\n").getBytes("UTF-8"))
    val q3 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt", replicaDepth = 3)
    try q3.processAllAvailable() finally q3.stop()
    val hs3 = spark.read.json(s"$root/index/oplog")
      .select($"data.h").as[Long].collect().sorted.toSeq
    assert(hs3 == Seq(1L, 2L, 5L), s"depth raise must not re-emit or early-fire: $hs3")

    // h=6's third copy from the joined member completes the new quorum
    Files.write(Paths.get(s"$src/b3.json"), Seq(
      line(6, "r3", 400)
    ).mkString("\n").getBytes("UTF-8"))
    val q4 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt", replicaDepth = 3)
    try q4.processAllAvailable() finally q4.stop()
    val hs4 = spark.read.json(s"$root/index/oplog")
      .select($"data.h").as[Long].collect().sorted.toSeq
    assert(hs4 == Seq(1L, 2L, 5L, 6L), s"got $hs4")
  }

  test("batch form matches set-of-quorate-keys semantics") {
    implicit val s = spark
    import s.implicits._
    val data = Seq(
      entry(10, "r1", 1), entry(10, "r2", 1), entry(10, "r3", 1),
      entry(20, "r1", 1), entry(20, "r2", 1),
      entry(30, "r1", 5), entry(30, "r2", 5), entry(30, "r3", 5), entry(30, "r1", 5))
    val out = QuorumDedup.batch(data.toDS(), 3).collect()
    assert(out.map(_.h).sorted.toSeq == Seq(10L, 30L))
    // emitted record is the first by (ts, tsInc, host)
    assert(out.find(_.h == 30).get.tsInc == 5)
  }
}
