package graft.streaming

import graft.SparkSuite
import graft.model.OplogEntry
import java.nio.file.Files

/** SURVEY.md §7.2 minimum slice, end-to-end over real files:
  * json dir source → O3 filter → quorum dedup → JSON-lines index sink,
  * with checkpointed offsets. */
class OplogPipelineSpec extends SparkSuite {

  private def line(h: Long, host: String, sec: Int, op: String = "i",
      ns: String = "test.grades", fromMigrate: Option[Boolean] = None): String = {
    val fm = fromMigrate.map(b => s""","fromMigrate":$b""").getOrElse("")
    s"""{"ts":"2024-01-01T00:00:${f"$sec%02d"}.000Z","tsInc":$sec,"h":$h,"op":"$op","ns":"$ns"$fm,"o":"{}","o2":null,"sourceHost":"$host"}"""
  }

  test("file-modeled pipeline: filter + quorum + index sink + checkpoint") {
    val root = Files.createTempDirectory("graft-pipe").toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()

    val rows = Seq(
      // h=1 replicated on 3 members -> must be emitted once
      line(1, "r1", 1), line(1, "r2", 1), line(1, "r3", 1),
      // h=2 only 2 members -> suppressed
      line(2, "r1", 1), line(2, "r2", 2),
      // noise that O3 must drop even though 3 copies arrive
      line(3, "r1", 4, op = "n"), line(3, "r2", 4, op = "n"), line(3, "r3", 4, op = "n"),
      line(4, "r1", 5, ns = "time_d.repl_time"), line(4, "r2", 5, ns = "time_d.repl_time"),
      line(4, "r3", 5, ns = "time_d.repl_time"),
      line(5, "r1", 6, fromMigrate = Some(true)), line(5, "r2", 6, fromMigrate = Some(true)),
      line(5, "r3", 6, fromMigrate = Some(true))
    )
    Files.write(java.nio.file.Paths.get(s"$src/batch0.json"),
      rows.mkString("\n").getBytes("UTF-8"))

    val q = OplogPipeline.run(spark, src, s"$root/index", s"$root/ckpt", replicaDepth = 3)
    try q.processAllAvailable() finally q.stop()

    import spark.implicits._
    val out = spark.read.json(s"$root/index/oplog")
    assert(out.count() == 1)
    val h = out.select($"data.h").as[Long].head()
    assert(h == 1L)
  }
}
