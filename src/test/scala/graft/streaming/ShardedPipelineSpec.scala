package graft.streaming

import graft.SparkSuite
import graft.streaming.ShardTopology.parseDescriptor
import java.nio.file.{Files, Paths}

/** Multi-shard fan-in (O2+O9) with PER-SHARD quorum depth — the
  * documented fix over the reference's first-shard-only depth. */
class ShardedPipelineSpec extends SparkSuite {

  private def line(h: Long, host: String, sec: Int): String =
    s"""{"ts":"2024-01-01T00:00:${f"$sec%02d"}.000Z","tsInc":$sec,"h":$h,"op":"i","ns":"t.c","o":"{}","o2":null,"sourceHost":"$host"}"""

  test("two shards with different replica depths dedup independently") {
    val root = Files.createTempDirectory("graft-sharded").toFile.getAbsolutePath
    val topology = Seq(
      parseDescriptor("s0/h1:1,h2:2,h3:3"),   // depth 3
      parseDescriptor("s1/h4:4,h5:5"))        // depth 2
    topology.foreach(sh => new java.io.File(s"$root/src/${sh.shard}").mkdirs())

    // s0: h=10 on 3 members (quorate), h=11 on 2 (not quorate at depth 3)
    Files.write(Paths.get(s"$root/src/s0/b0.json"), Seq(
      line(10, "h1", 1), line(10, "h2", 1), line(10, "h3", 1),
      line(11, "h1", 1), line(11, "h2", 1)
    ).mkString("\n").getBytes("UTF-8"))
    // s1: h=20 on 2 members (quorate at depth 2), h=21 on 1 (not)
    Files.write(Paths.get(s"$root/src/s1/b0.json"), Seq(
      line(20, "h4", 1), line(20, "h5", 1),
      line(21, "h4", 1)
    ).mkString("\n").getBytes("UTF-8"))

    val queries = ShardedOplogPipeline.run(
      spark, topology, sh => s"$root/src/$sh", s"$root/index", s"$root/ckpt")
    try queries.foreach(_.processAllAvailable()) finally queries.foreach(_.stop())

    import spark.implicits._
    // one read per shard index (each is its own per-batch-partitioned
    // store — a multi-root glob would make Spark try to infer ONE
    // partition scheme across unrelated roots)
    val emitted = topology.map(sh => spark.read.json(s"$root/index/${sh.shard}/oplog"))
      .reduce(_ unionByName _)
      .select($"data.h").as[Long].collect().sorted.toSeq
    assert(emitted == Seq(10L, 20L), s"got $emitted")

    // ---- topology REDISCOVERY: member h3 leaves s0 → depth 3 → 2 ----
    // The reference would deadlock h=11 (2 of the old 3 copies) forever
    // (MongoOplogTailMapper.java:64 captures depth once). Here the
    // re-parsed descriptor drives the restart, and the quorum state
    // machine re-checks stuck keys against the NEW depth at their
    // timeout — discovery (O2) wired directly into recovery.
    val topology2 = Seq(
      parseDescriptor("s0/h1:1,h2:2"),        // h3 gone → depth 2
      parseDescriptor("s1/h4:4,h5:5"))
    // fresh traffic from the surviving members advances s0's watermark
    // past the stuck key's timeout (sec 50 − 10 s delay > sec 1)
    Files.write(Paths.get(s"$root/src/s0/b1.json"), Seq(
      line(12, "h1", 50), line(12, "h2", 50)
    ).mkString("\n").getBytes("UTF-8"))
    val queries2 = ShardedOplogPipeline.run(
      spark, topology2, sh => s"$root/src/$sh", s"$root/index", s"$root/ckpt")
    try queries2.foreach(_.processAllAvailable()) finally queries2.foreach(_.stop())
    val emitted2 = topology2.map(sh => spark.read.json(s"$root/index/${sh.shard}/oplog"))
      .reduce(_ unionByName _)
      .select($"data.h").as[Long].collect().sorted.toSeq
    assert(emitted2 == Seq(10L, 11L, 12L, 20L),
      s"stuck key must emit under the rediscovered depth: $emitted2")
  }
}
