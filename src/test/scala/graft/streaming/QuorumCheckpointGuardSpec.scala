package graft.streaming

import graft.SparkSuite
import java.nio.file.Files

/** The quorum checkpoint FORMAT GUARD (round-17 verdict ask 3): the r17
  * identity re-key — state keyed by `(h, ts, tsInc)` instead of `h`
  * alone — makes every pre-upgrade checkpoint semantically stale, and
  * resume behavior must be a loud refusal, not undefined mis-grouping.
  * Pinned here: (1) a fresh checkpoint is stamped with the current
  * [[QuorumDedup.StateFormatId]] and a same-build restart resumes
  * cleanly through it; (2) a checkpoint with committed offsets but NO
  * marker — exactly what a pre-r17 deployment left behind — raises the
  * upgrade message at query-start time; (3) a marker carrying a
  * DIFFERENT format id (a future incompatible bump) raises likewise.
  * This is the gate-handoff guard discipline
  * ([[NearDupStream.explodeBands]]'s format raise) applied to the O7
  * state store. */
class QuorumCheckpointGuardSpec extends SparkSuite {

  private def line(h: Long, host: String, sec: Int): String =
    s"""{"ts":"2024-01-01T00:00:${f"$sec%02d"}.000Z","tsInc":$sec,"h":$h,"op":"i","ns":"test.grades","o":"{}","o2":null,"sourceHost":"$host"}"""

  private def writeWave(src: String, name: String, rows: Seq[String]): Unit = {
    Files.write(java.nio.file.Paths.get(s"$src/$name.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    ()
  }

  test("fresh checkpoint is stamped; a same-format restart resumes through it") {
    val root = Files.createTempDirectory("graft-qguard").toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()
    writeWave(src, "w1", Seq(line(1, "r1", 1), line(1, "r2", 1), line(1, "r3", 1)))
    val q1 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
      replicaDepth = 3)
    try q1.processAllAvailable() finally q1.stop()
    val marker = java.nio.file.Paths.get(s"$root/ckpt",
      "_graft_quorum_state_format")
    assert(Files.exists(marker), "the guard must stamp a fresh checkpoint")
    assert(new String(Files.readAllBytes(marker), "UTF-8").trim ==
      QuorumDedup.StateFormatId)
    // restart over the stamped checkpoint: resumes, no re-emit, new ops flow
    writeWave(src, "w2", Seq(line(2, "r1", 5), line(2, "r2", 5), line(2, "r3", 5)))
    val q2 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
      replicaDepth = 3)
    try q2.processAllAvailable() finally q2.stop()
    import spark.implicits._
    val hs = spark.read.json(s"$root/index/oplog")
      .select($"data.h").as[Long].collect().sorted.toSeq
    assert(hs == Seq(1L, 2L), s"exactly-once across the guarded restart: $hs")
  }

  test("a pre-upgrade checkpoint (committed offsets, no marker) raises the upgrade message") {
    val root = Files.createTempDirectory("graft-qguard-pre").toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()
    writeWave(src, "w1", Seq(line(1, "r1", 1), line(1, "r2", 1), line(1, "r3", 1)))
    val q1 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
      replicaDepth = 3)
    try q1.processAllAvailable() finally q1.stop()
    // simulate a pre-r17 checkpoint: committed offsets, marker absent
    Files.delete(java.nio.file.Paths.get(s"$root/ckpt",
      "_graft_quorum_state_format"))
    val e = intercept[IllegalArgumentException] {
      OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
        replicaDepth = 3)
    }
    assert(e.getMessage.contains("predates") &&
      e.getMessage.contains("fresh checkpoint"),
      s"the refusal must name the upgrade and the remedy: ${e.getMessage}")
  }

  test("the operator override stamps a verified marker-less checkpoint and resumes in place") {
    // the round-18 advice cohort: a checkpoint written by a build that
    // already used the current grouping key but PREDATES the marker
    // protocol — committed offsets, no marker, perfectly valid state.
    // The guard cannot prove that, so the default refuses; the
    // operator override (value must NAME the exact format id) stamps
    // it and resumes with the state intact instead of forcing replay.
    val root = Files.createTempDirectory("graft-qguard-ovr").toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()
    // h=1 reaches quorum and emits; h=9 sits at 2/3 copies — live,
    // BELOW-quorum state the override must carry across the resume
    writeWave(src, "w1", Seq(line(1, "r1", 1), line(1, "r2", 1), line(1, "r3", 1),
      line(9, "r1", 40), line(9, "r2", 40)))
    val q1 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
      replicaDepth = 3, watermark = "1000 seconds")
    try q1.processAllAvailable() finally q1.stop()
    // simulate the marker-less current-key cohort
    Files.delete(java.nio.file.Paths.get(s"$root/ckpt",
      "_graft_quorum_state_format"))
    // a WRONG override value never waves anything through (a stale
    // override in an init script must not mute a future format bump)
    sys.props("graft.quorum.assumeStateFormat") = "quorum-state-v99:(bogus)"
    try {
      val e = intercept[IllegalArgumentException] {
        OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
          replicaDepth = 3, watermark = "1000 seconds")
      }
      assert(e.getMessage.contains("assumeStateFormat"),
        s"the refusal must name the override: ${e.getMessage}")
      // the exact-id override stamps and resumes IN PLACE: h=9's third
      // copy completes quorum from the carried state (replay-from-
      // scratch would also emit once, but the stamped marker proves
      // the checkpoint itself was accepted — offsets advance, not reset)
      sys.props("graft.quorum.assumeStateFormat") = QuorumDedup.StateFormatId
      // the third copy of the SAME op identity (h, ts, tsInc)
      writeWave(src, "w2", Seq(line(9, "r3", 40)))
      val q2 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
        replicaDepth = 3, watermark = "1000 seconds")
      try q2.processAllAvailable() finally q2.stop()
    } finally sys.props.remove("graft.quorum.assumeStateFormat")
    val marker = java.nio.file.Paths.get(s"$root/ckpt",
      "_graft_quorum_state_format")
    assert(Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8").trim ==
        QuorumDedup.StateFormatId,
      "the override must stamp the current format id")
    import spark.implicits._
    val hs = spark.read.json(s"$root/index/oplog")
      .select($"data.h").as[Long].collect().sorted.toSeq
    assert(hs == Seq(1L, 9L),
      s"resume-in-place must complete the carried sub-quorum key exactly once: $hs")
    // and a THIRD start passes on the marker alone, no override set
    val q3 = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt",
      replicaDepth = 3, watermark = "1000 seconds")
    try q3.processAllAvailable() finally q3.stop()
  }

  test("a marker with a different format id raises") {
    val root = Files.createTempDirectory("graft-qguard-mis").toFile.getAbsolutePath
    val ckpt = java.nio.file.Paths.get(s"$root/ckpt")
    Files.createDirectories(ckpt)
    Files.write(ckpt.resolve("_graft_quorum_state_format"),
      "quorum-state-v1:(h)".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      QuorumDedup.ensureStateFormat(spark, ckpt.toString)
    }
    assert(e.getMessage.contains("quorum-state-v1:(h)") &&
      e.getMessage.contains(QuorumDedup.StateFormatId),
      s"the refusal must name both format ids: ${e.getMessage}")
  }
}
