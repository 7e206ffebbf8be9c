package graft.sources

import graft.SparkSuite
import graft.model.OplogEntry
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The native DSv2 oplog connector: per-member partition planning (O1/
  * O2), reader-side filter pushdown (O3), resumable per-member offsets
  * (O4), and composition with the quorum dedup (O7). */
class OplogConnectorSpec extends SparkSuite {

  private def line(h: Long, sec: Int, op: String = "i",
      ns: String = "t.c", fm: Option[Boolean] = None): String = {
    val fmj = fm.map(b => s""","fromMigrate":$b""").getOrElse("")
    s"""{"ts":"2024-01-01T00:00:${f"$sec%02d"}.000Z","tsInc":$sec,"h":$h,"op":"$op","ns":"t.c"$fmj,"o":"{}","o2":null,"sourceHost":"ignored"}"""
      .replace(""""ns":"t.c"""", s""""ns":"$ns"""")
  }

  private def writeMember(root: String, shard: String, host: String, port: Int,
      name: String, rows: Seq[String]): Unit = {
    val dir = OplogConnector.memberDir(root, shard, host, port)
    new java.io.File(dir).mkdirs()
    Files.write(Paths.get(s"$dir/$name.json"), rows.mkString("\n").getBytes("UTF-8"))
  }

  private val topology = "s0/r1:1,r2:2,r3:3"

  test("batch read: one partition per member, sourceHost stamped") {
    val root = Files.createTempDirectory("graft-conn").toFile.getAbsolutePath
    writeMember(root, "s0", "r1", 1, "b0", Seq(line(1, 1), line(2, 2)))
    writeMember(root, "s0", "r2", 2, "b0", Seq(line(1, 1)))
    writeMember(root, "s0", "r3", 3, "b0", Seq(line(1, 2), line(3, 3)))

    val df = spark.read.format("graft.sources.OplogSourceProvider")
      .option("topology", topology).load(root)
    assert(df.rdd.getNumPartitions == 3)         // one cursor per member
    assert(df.count() == 5)
    val hosts = df.select("sourceHost").distinct().collect().map(_.getString(0)).toSet
    assert(hosts == Set("s0/r1:1", "s0/r2:2", "s0/r3:3"))
  }

  test("O3 filters are pushed into the reader") {
    val root = Files.createTempDirectory("graft-conn2").toFile.getAbsolutePath
    writeMember(root, "s0", "r1", 1, "b0", Seq(
      line(1, 1), line(2, 2, op = "n"),
      line(3, 3, ns = "time_d.repl_time"), line(4, 4, fm = Some(true))))
    writeMember(root, "s0", "r2", 2, "b0", Seq.empty)
    writeMember(root, "s0", "r3", 3, "b0", Seq.empty)

    val df = spark.read.format("graft.sources.OplogSourceProvider")
      .option("topology", topology).load(root)
      .filter(col("op") =!= "n" && col("ns") =!= "time_d.repl_time" &&
        col("fromMigrate").isNull)
    // pushdown visible in the scan description
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("pushed=[") && physical.contains("Not(EqualTo(op,n))"),
      s"plan missing pushed filters:\n$physical")
    assert(df.count() == 1)
    assert(df.head().getAs[Long]("h") == 1L)
  }

  test("O4 ts range predicate is pushed into the reader") {
    val root = Files.createTempDirectory("graft-conn-ts").toFile.getAbsolutePath
    writeMember(root, "s0", "r1", 1, "b0", Seq(line(1, 1), line(2, 2), line(3, 3), line(4, 4)))
    writeMember(root, "s0", "r2", 2, "b0", Seq.empty)
    writeMember(root, "s0", "r3", 3, "b0", Seq.empty)

    val lastSeen = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:02Z"))
    val df = spark.read.format("graft.sources.OplogSourceProvider")
      .option("topology", topology).load(root)
      .filter(col("ts") > org.apache.spark.sql.functions.lit(lastSeen))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThan(ts"),
      s"plan missing pushed ts filter:\n$physical")
    assert(df.count() == 2)                      // rows dropped at the "cursor"
    assert(df.select("h").collect().map(_.getLong(0)).toSet == Set(3L, 4L))
  }

  test("offsets are file names under natural order: late b10 after b9 is neither lost nor re-read") {
    implicit val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-conn-nat").toFile.getAbsolutePath
    val out = s"$root/out"
    val topo1 = "s0/r1:1"
    writeMember(root, "s0", "r1", 1, "b9", Seq(line(1, 1)))

    def start() = spark.readStream.format("graft.sources.OplogSourceProvider")
      .option("topology", topo1).load(root)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").json(out); ()
      }
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // "b10" sorts BEFORE "b9" lexicographically but AFTER it naturally;
    // an index-based offset would re-read b9 (dup) and never read b10.
    writeMember(root, "s0", "r1", 1, "b10", Seq(line(2, 2)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val hs = spark.read.json(out).select("h").as[Long].collect().sorted.toSeq
    assert(hs == Seq(1L, 2L), s"expected exactly-once [1,2], got $hs")
  }

  test("admission control: maxFilesPerTrigger bounds every micro-batch") {
    val root = Files.createTempDirectory("graft-conn-adm").toFile.getAbsolutePath
    val topo1 = "s0/r1:1"
    (0 until 6).foreach(i =>
      writeMember(root, "s0", "r1", 1, f"b$i%02d", Seq(line(i.toLong, i))))

    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft.sources.OplogSourceProvider")
      .option("topology", topo1)
      .option("maxFilesPerTrigger", "2")
      .load(root)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.synchronized { sizes += b.count() }; ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val nonEmpty = sizes.filter(_ > 0)
    assert(sizes.sum == 6, s"all rows consumed, got $sizes")
    assert(nonEmpty.forall(_ <= 2), s"a batch exceeded the admission bound: $sizes")
    assert(nonEmpty.size >= 3, s"expected >=3 bounded batches, got $sizes")
  }

  test("admission budget is split round-robin: a backlogged member cannot starve the rest") {
    val root = Files.createTempDirectory("graft-conn-rr").toFile.getAbsolutePath
    val topo2 = "s0/r1:1,r2:2"
    // r1 has a deep backlog, r2 a short one; budget 2 per batch
    (0 until 6).foreach(i => writeMember(root, "s0", "r1", 1, f"b$i%02d", Seq(line(100 + i, i))))
    (0 until 2).foreach(i => writeMember(root, "s0", "r2", 2, f"b$i%02d", Seq(line(200 + i, i))))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft.sources.OplogSourceProvider")
      .option("topology", topo2)
      .option("maxFilesPerTrigger", "2")
      .load(root)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val hs = b.collect().map(_.getAs[Long]("h")).toSet
        batches.synchronized { if (hs.nonEmpty) batches += hs }; ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // r2's rows must arrive in the FIRST TWO batches (1 slot per member
    // per batch), not after r1's entire backlog drains
    val firstTwo = batches.take(2).flatten.toSet
    assert(firstTwo.contains(200L) && firstTwo.contains(201L),
      s"backlogged r1 starved r2: $batches")
    assert(batches.flatten.toSet.size == 8, s"all rows exactly once: $batches")
  }

  test("streaming: quorum dedup over the connector, resume reads only the suffix") {
    implicit val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-conn3").toFile.getAbsolutePath
    val out = s"$root/out"
    writeMember(root, "s0", "r1", 1, "b0", Seq(line(1, 1), line(2, 1)))
    writeMember(root, "s0", "r2", 2, "b0", Seq(line(1, 1)))
    writeMember(root, "s0", "r3", 3, "b0", Seq(line(1, 1)))

    def start() = {
      val src = spark.readStream.format("graft.sources.OplogSourceProvider")
        .option("topology", topology).load(root)
        .as[OplogEntry]
      graft.streaming.QuorumDedup(src.withWatermark("ts", "10 seconds"), 3)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[OplogEntry], _: Long) =>
          b.write.mode("append").json(out); ()
        }
        .start()
    }
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.json(out).select("h").as[Long].collect().toSeq == Seq(1L))

    // second batch of files: h=2 completes quorum across members
    // (replica copies carry the op's own clock)
    writeMember(root, "s0", "r2", 2, "b1", Seq(line(2, 1)))
    writeMember(root, "s0", "r3", 3, "b1", Seq(line(2, 1)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val hs = spark.read.json(out).select("h").as[Long].collect().sorted.toSeq
    assert(hs == Seq(1L, 2L), s"got $hs")
  }
}
