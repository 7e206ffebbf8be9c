package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.OplogEntry
import graft.streaming.{OplogPipeline, QuorumDedup}

/** Checkpoint-resume at state scale — the streaming analog of a cold
  * start. CheckpointResumeSpec proves resume CORRECTNESS on 2 keys;
  * this probe measures resume COST with ~keys·(replicas−1) rows of
  * quorum state in flight: phase 1 feeds 2 of 3 replica copies for
  * every key (nothing reaches quorum — the state store ends holding
  * every key), the query stops, and phase 2 restarts from the
  * checkpoint, delivers the third copies, and must emit every key
  * exactly once. Reported: phase-1 ingest time, phase-2
  * restart+drain time (the recovery-dominated number), and the
  * emitted-count correctness check.
  *
  * Usage: runMain graft.tools.StateResumeProbe [keys] [partitions] [hdfs|rocksdb]
  *
  * The third arg picks the state-store provider: `hdfs` (default,
  * JVM-heap maps + full-snapshot checkpoints) or `rocksdb` (off-heap
  * native store + CHANGELOG checkpointing — commits ship only the
  * batch's delta, snapshots happen in background maintenance). The
  * crossover is measured in SCALING.md: HDFSBacked wins while a
  * store's keys fit comfortably in executor heap (≤ ~100k keys/
  * partition); RocksDB wins once per-partition state outgrows that —
  * the 100 TB dial is provider choice per state volume, set via
  * `spark.sql.streaming.stateStore.providerClass` (see
  * [[graft.GraftSession]]).
  */
object StateResumeProbe {

  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args(0).toLong else 100000L
    val parts = if (args.length > 1) args(1).toInt else 4
    val provider = if (args.length > 2) args(2) else "hdfs"
    val b0 = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-resumeprobe"), 32)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val spark = (if (provider == "rocksdb")
      b0.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
    else b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val s: SparkSession = spark

    val root = java.nio.file.Files.createTempDirectory("graft-resume-scale")
      .toFile.getAbsolutePath
    val src = s"$root/oplog"
    new java.io.File(src).mkdirs()

    // oplog-shaped JSON straight from range(): key i at second i%86400
    def writeCopies(hosts: Seq[String], file: String): Unit =
      spark.range(keys).select($"id".as("h"))
        .withColumn("sourceHost", explode(array(hosts.map(lit): _*)))
        .select(
          to_json(struct(
            date_format(
              timestamp_seconds(lit(1704067200L) + $"h" % 86400L),
              "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("ts"),
            ($"h" % 1000).cast("int").as("tsInc"),
            $"h", lit("i").as("op"), lit("probe.docs").as("ns"),
            lit("{}").as("o"), lit(null).cast("string").as("o2"),
            $"sourceHost")).as("line"))
        .coalesce(8)
        .write.mode("overwrite").text(s"$src/$file")

    def runDrain(label: String): (Long, Double) = {
      val emitted = new java.util.concurrent.atomic.AtomicLong(0L)
      val t0 = System.nanoTime()
      val q = QuorumDedup(
        OplogPipeline.staticFilter(
          spark.readStream.schema(OplogEntry.schema).json(s"$src/*")
        ).withWatermark("ts", "3650 days").as[OplogEntry],
        depth = 3)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[OplogEntry], _: Long) =>
          emitted.addAndGet(b.count()); ()
        }
        .start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[resumeprobe] $label keys=$keys parts=$parts provider=$provider emitted=${emitted.get()} elapsed=$dt%.1f s")
      (emitted.get(), dt)
    }

    try {
      // phase 1: 2/3 copies -> every key pending in the state store
      writeCopies(Seq("r1", "r2"), "phase1")
      val (e1, _) = runDrain("phase1-ingest")
      require(e1 == 0, s"phase 1 must emit nothing (got $e1)")
      // phase 2: restart from checkpoint, third copy completes each quorum
      writeCopies(Seq("r3"), "phase2")
      val (e2, t2) = runDrain("phase2-resume")
      require(e2 == keys, s"resume must emit every key exactly once (got $e2 of $keys)")
      println(f"[resumeprobe] OK resume drained $keys%d in-flight keys in $t2%.1f s " +
        f"(${keys / t2}%.0f keys/s through restored state)")
    } finally {
      scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      spark.stop()
    }
  }
}
