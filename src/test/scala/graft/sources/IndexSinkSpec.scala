package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The DSv2 write connector: streamed rows land in per-epoch
  * `batch=<id>` dirs exactly once, a REPLAYED epoch commit rewrites
  * instead of appending, aborts leave committed epochs intact, and the
  * batch write path shares the same protocol. */
class IndexSinkSpec extends SparkSuite {

  private def readAll(dir: java.nio.file.Path): Seq[String] = {
    val committed = Option(dir.toFile.listFiles).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("batch=") &&
        new java.io.File(f, "_SUCCESS").exists())
    committed.flatMap { d =>
      d.listFiles.filterNot(_.getName == "_SUCCESS").flatMap { f =>
        scala.io.Source.fromFile(f).getLines().toSeq
      }
    }.toSeq
  }

  test("streaming write: per-epoch dirs, all rows, exactly once") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-idxsink-in")
    val out = java.nio.file.Files.createTempDirectory("graft-idxsink-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-idxsink-ckpt")
    def addFile(rows: Seq[String], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-idx-$name")
      rows.toDF("value").coalesce(1).write.parquet(tmp.resolve("d").toString)
      val part = tmp.resolve("d").toFile.listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      def start() = spark.readStream
        .schema("value STRING").parquet(in.toString)
        .writeStream.format("graft.sources.IndexSinkProvider")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
      addFile(Seq("a1", "a2"), "b1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      addFile(Seq("b1", "b2", "b3"), "b2")
      val q2 = start()   // restart from checkpoint — epochs continue
      try q2.processAllAvailable() finally q2.stop()
      assert(readAll(out).sorted == Seq("a1", "a2", "b1", "b2", "b3"))
      val epochs = out.toFile.listFiles.map(_.getName).filter(_.startsWith("batch="))
      assert(epochs.length >= 2, s"expected per-epoch dirs, saw ${epochs.toSeq}")
    } finally Seq(in, out, ckpt).foreach(p =>
      new scala.reflect.io.Directory(p.toFile).deleteRecursively())
  }

  test("a replayed epoch commit REWRITES its dir — no duplicates") {
    val out = java.nio.file.Files.createTempDirectory("graft-idxsink-replay")
    try {
      // drive the connector API directly: same epoch committed twice
      // (the crash-between-sink-write-and-checkpoint-commit replay)
      def runEpoch(lines: Seq[String], epoch: Long): Unit = {
        val w = new IndexDataWriter(out.toString, 0, epoch * 10 + lines.size, epoch)
        lines.foreach { l =>
          val row = org.apache.spark.sql.catalyst.InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(l))
          w.write(row)
        }
        val msg = w.commit()
        IndexCommit.publish(out.toString, epoch, Array(msg))
      }
      runEpoch(Seq("x1", "x2"), 0L)
      runEpoch(Seq("x1", "x2"), 0L)   // replay
      runEpoch(Seq("y1"), 1L)
      assert(readAll(out).sorted == Seq("x1", "x2", "y1"),
        "replayed epoch must not duplicate")
      // abort leaves committed epochs intact
      val w = new IndexDataWriter(out.toString, 0, 99L, 2L)
      w.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("z")))
      IndexCommit.discard(Array(w.commit()))
      assert(readAll(out).sorted == Seq("x1", "x2", "y1"))
    } finally new scala.reflect.io.Directory(out.toFile).deleteRecursively()
  }

  test("uncommitted writes are invisible; visible epochs always carry _SUCCESS") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-idxsink-atomic")
    try {
      // a writer that finished its task but whose epoch never reached
      // publish (crashed query): nothing outside _tmp, readers see nothing
      val w = new IndexDataWriter(out.toString, 0, 7L, 0L)
      w.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("ghost")))
      w.commit()
      assert(readAll(out).isEmpty, "unpublished epoch leaked")
      assert(!out.toFile.listFiles.exists(_.getName.startsWith("batch=")),
        "no batch= dir may exist before publish")

      // a real publish: the visible dir carries _SUCCESS (staged before
      // the rename, so visibility implies completeness)
      def runEpoch(lines: Seq[String], epoch: Long): Unit = {
        val w = new IndexDataWriter(out.toString, 0, epoch * 10 + lines.size, epoch)
        lines.foreach { l =>
          w.write(org.apache.spark.sql.catalyst.InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(l)))
        }
        IndexCommit.publish(out.toString, epoch, Array(w.commit()))
      }
      runEpoch(Seq("a"), 1L)
      val d = new java.io.File(out.toFile, "batch=1")
      assert(d.exists() && new java.io.File(d, "_SUCCESS").exists())
      assert(readAll(out) == Seq("a"))
    } finally new scala.reflect.io.Directory(out.toFile).deleteRecursively()
  }

  test("commit sweeps stale _tmp scratch of earlier epochs") {
    val out = java.nio.file.Files.createTempDirectory("graft-idxsink-sweep")
    try {
      // zombie leftovers from earlier epochs: writer scratch, a crashed
      // stage, a crashed trash
      val tmp = new java.io.File(out.toFile, "_tmp")
      Seq("epoch=0", "stage-epoch=1", "trash-epoch=0").foreach { n =>
        val dd = new java.io.File(tmp, n); dd.mkdirs()
        val f = new java.io.File(dd, "junk")
        val o = new java.io.FileWriter(f); o.write("x"); o.close()
      }
      val w = new IndexDataWriter(out.toString, 0, 42L, 5L)
      w.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("live")))
      IndexCommit.publish(out.toString, 5L, Array(w.commit()))
      val left = Option(tmp.listFiles).getOrElse(Array.empty).map(_.getName).toSet
      assert(left.isEmpty, s"stale _tmp entries survived: $left")
      assert(readAll(out) == Seq("live"))
    } finally new scala.reflect.io.Directory(out.toFile).deleteRecursively()
  }

  test("batch write shares the protocol (epoch -1)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-idxsink-batch")
    try {
      Seq("m1", "m2").toDF("value")
        .write.format("graft.sources.IndexSinkProvider")
        .option("path", out.toString).mode("append").save()
      assert(readAll(out).sorted == Seq("m1", "m2"))
    } finally new scala.reflect.io.Directory(out.toFile).deleteRecursively()
  }

  test("manifest mode: visibility is the manifest object; replay swaps the file list") {
    val out = java.nio.file.Files.createTempDirectory("graft-idxsink-manifest")
    def read(): Seq[String] =
      IndexSink.readCommitted(spark, out.toString).collect().map(_.getString(0)).toSeq
    def runEpoch(lines: Seq[String], epoch: Long, task: Long): Unit = {
      val w = new IndexDataWriter(out.toString, 0, task, epoch, "manifest")
      lines.foreach { l =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(l)))
      }
      IndexCommit.publishManifest(out.toString, epoch, Array(w.commit()))
    }
    try {
      // a PUT with no manifest entry is invisible
      val ghost = new IndexDataWriter(out.toString, 0, 99L, 0L, "manifest")
      ghost.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("ghost")))
      ghost.commit()
      assert(read().isEmpty, "unmanifested data object leaked")

      runEpoch(Seq("x1", "x2"), 0L, task = 1L)
      assert(read().sorted == Seq("x1", "x2"))
      // the ghost attempt's object was swept by epoch 0's publish
      val dataDir = new java.io.File(out.toFile, "_data/epoch=0")
      assert(dataDir.listFiles.length == 1,
        s"orphan survived: ${dataDir.listFiles.map(_.getName).toSeq}")

      // replayed epoch: new attempt file, manifest swaps wholesale
      runEpoch(Seq("x1", "x2"), 0L, task = 2L)
      runEpoch(Seq("y1"), 1L, task = 3L)
      assert(read().sorted == Seq("x1", "x2", "y1"), "replay must not duplicate")

      // no batch= dirs in manifest mode; everything lives under _ paths
      assert(!out.toFile.listFiles.exists(_.getName.startsWith("batch=")))

      // a zombie PUT landing in an ALREADY-COMMITTED epoch's dir is
      // swept by the next epoch's commit (one-epoch-lag cleanup)
      val zombie = new IndexDataWriter(out.toString, 1, 77L, 1L, "manifest")
      zombie.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("straggler")))
      zombie.commit()
      runEpoch(Seq("z1"), 2L, task = 4L)
      val d1 = new java.io.File(out.toFile, "_data/epoch=1")
      assert(d1.listFiles.length == 1,
        s"zombie survived the next commit: ${d1.listFiles.map(_.getName).toSeq}")
      assert(read().sorted == Seq("x1", "x2", "y1", "z1"))
    } finally new scala.reflect.io.Directory(out.toFile).deleteRecursively()
  }

  test("manifest mode end-to-end: streaming restart continues exactly-once") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-idxmf-in")
    val out = java.nio.file.Files.createTempDirectory("graft-idxmf-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-idxmf-ckpt")
    def addFile(rows: Seq[String], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-idxmf-$name")
      rows.toDF("value").coalesce(1).write.parquet(tmp.resolve("d").toString)
      val part = tmp.resolve("d").toFile.listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, in.resolve(s"$name.parquet"))
    }
    try {
      def start() = spark.readStream
        .schema("value STRING").parquet(in.toString)
        .writeStream.format("graft.sources.IndexSinkProvider")
        .option("path", out.toString)
        .option("commitMode", "manifest")
        .option("checkpointLocation", ckpt.toString)
        .start()
      addFile(Seq("a1", "a2"), "b1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      addFile(Seq("b1", "b2"), "b2")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = IndexSink.readCommitted(spark, out.toString)
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq("a1", "a2", "b1", "b2"))
    } finally Seq(in, out, ckpt).foreach(p =>
      new scala.reflect.io.Directory(p.toFile).deleteRecursively())
  }
}
