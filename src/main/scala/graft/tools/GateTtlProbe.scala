package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Prices the TTL-bounded near-dup gate's RECALL trade
  * ([[graft.streaming.NearDupStream.flagExpiring]]): every sf0.001
  * document gets one planted near-dup copy arriving Δ=600 s of EVENT
  * time later, the merged stream lands in event-time order, and the
  * sweep measures what fraction of the late dups each ttl still
  * catches. The geometry under test: a bucket expires when the
  * watermark passes `max(wm, batch max ets) + ttl`, so the EFFECTIVE
  * horizon is ttl plus up to one batch of watermark lag — ttl ≥ Δ
  * should flag ~everything, ttl ≪ Δ admits ~everything, and the
  * transition width IS the batch-granularity term the chain's
  * 3-wave-plateau-for-a-2-wave-ttl already hinted at.
  *
  * Usage: `runMain graft.tools.GateTtlProbe [lww] [ttlSec...]`
  * (default 60 120 240 480 960; Δ fixed at 600 s; sf dir from
  * SPARK_GRAFT_SF_DIR, default sf0.001). `lww` sweeps the COMPOSED
  * update-aware form instead
  * ([[graft.streaming.NearDupStream.registerExpiringLww]] →
  * [[graft.streaming.NearDupStream.applyLww]], the chain's two-query
  * wiring with the epoch handoff, wave-stepped so epochs apply in
  * order): its horizon is PER-DOC (the registry ages on arrivals of
  * the doc itself and retires the doc's claims everywhere), vs
  * flagExpiring's per-bucket granularity — on this fixture (each
  * class its own buckets) the recall curves should coincide, and the
  * lww rows additionally price the composed form's fee: wall time
  * (two stateful queries + epoch IO) and resident state split across
  * the registry and bucket ledgers.
  *
  * `base_corpus_flags` counts ORIGINALS the gate flagged — on a
  * corpus seeded with planted near-dup pairs those are CORRECT
  * verdicts (originals banding with other originals), not false
  * positives; the field exists so a reader can separate the base
  * corpus's own dup mass from the planted-late-dup recall the sweep
  * is pricing. */
object GateTtlProbe {

  private val DeltaSec = 600L
  private val CopyOffset = 100000L

  def main(args: Array[String]): Unit = {
    val lww = args.headOption.contains("lww")
    val rest = if (lww) args.drop(1) else args
    val ttls = if (rest.nonEmpty) rest.map(_.toLong).toSeq
               else Seq(60L, 120L, 240L, 480L, 960L)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val base = graft.Tables.load(spark, sfDir, "documents")
        .select($"doc_id", $"text")
      val orig = base.select($"doc_id", $"text", $"doc_id".as("etsSec"))
      val copies = base.select(($"doc_id" + CopyOffset).as("doc_id"),
        concat($"text", lit(" zz")).as("text"),
        ($"doc_id" + DeltaSec).as("etsSec"))
      val merged = orig.unionAll(copies)
        .withColumn("ets", timestamp_micros(($"etsSec" + 86400L) * 1000000L))
        .drop("etsSec")
      if (lww) { runLww(spark, merged, ttls); return }
      val nCopies = copies.count()

      ttls.foreach { ttl =>
        val scratch = java.nio.file.Files
          .createTempDirectory(s"graft-gatettl-$ttl").toFile.getAbsolutePath
        try {
          // stage in EVENT-TIME order across zero-padded file names so
          // the file source's batches advance the watermark realistically
          val files = 25
          val inDir = s"$scratch/in"
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
          val staged = merged.withColumn("f",
            ntile(files).over(org.apache.spark.sql.expressions.Window.orderBy($"ets")))
          (1 to files).foreach { f =>
            val tmp = java.nio.file.Paths.get(scratch, s"stage$f")
            staged.filter($"f" === f).drop("f")
              .coalesce(1).write.parquet(tmp.toString)
            val part = tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get
            java.nio.file.Files.move(part.toPath,
              java.nio.file.Paths.get(inDir, f"f$f%03d.parquet"))
          }
          val schema = spark.read.parquet(inDir).schema
          val flaggedCopies = new java.util.concurrent.atomic.AtomicLong(0L)
          val flaggedOrig = new java.util.concurrent.atomic.AtomicLong(0L)
          val t0 = System.nanoTime()
          val src = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "4").parquet(inDir)
          val q = graft.streaming.NearDupStream
            .flagExpiring(src, ttl * 1000L, delay = "10 seconds")
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$scratch/ckpt")
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: Dataset[graft.streaming.NearDupBand], _: Long) =>
              val v = graft.streaming.NearDupStream.fold(b.toDF())
                .filter($"dup_of".isNotNull).cache()
              flaggedCopies.addAndGet(v.filter($"doc_id" >= CopyOffset).count())
              flaggedOrig.addAndGet(v.filter($"doc_id" < CopyOffset).count())
              v.unpersist()
              ()
            }
            .start()
          try q.awaitTermination() finally q.stop()
          val wallSec = (System.nanoTime() - t0) / 1e9
          val stateRows = Option(q.lastProgress).toSeq
            .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
          val caught = flaggedCopies.get()
          println(f"""{"probe":"gate_ttl","ttl_sec":$ttl,"delta_sec":$DeltaSec,"late_dups":$nCopies,"flagged":$caught,"admitted":${nCopies - caught},"recall_pct":${100.0 * caught / nCopies}%.1f,"base_corpus_flags":${flaggedOrig.get()},"wall_sec":$wallSec%.1f,"bucket_rows":$stateRows}""")
        } finally {
          scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
          ()
        }
      }
    } finally spark.stop()
  }

  /** the composed update-aware sweep: same fixture, same staging, but
    * the gate is the chain's two-query LWW wiring and the drive is
    * wave-stepped (one staged file per registry trigger, bucket drain
    * after each) so the sweep prices the steady-state cadence. The
    * catch-up hazard this stepping used to be the only defense
    * against — a bundled trigger applying a LATE timeout-retire ahead
    * of an EARLY arrival — is now closed structurally: the bucket
    * kernel replays a trigger's messages in stamped-epoch order
    * ([[graft.streaming.NearDupStream.applyLww]], round 17), so even
    * an AvailableNow collapse adjudicates identically. */
  private def runLww(spark: SparkSession,
      merged: org.apache.spark.sql.DataFrame, ttls: Seq[Long]): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.types.{StructField, StructType}
    val src = merged
      .select($"doc_id", lit(1L).as("ver"), lit("en").as("lang"), $"text", $"ets")
    val nCopies = src.filter($"doc_id" >= CopyOffset).count()
    ttls.foreach { ttl =>
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-gatettl-lww-$ttl").toFile.getAbsolutePath
      try {
        val files = 25
        val inDir = s"$scratch/in"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
        val staged = src.withColumn("f",
          ntile(files).over(org.apache.spark.sql.expressions.Window.orderBy($"ets")))
        val parts = (1 to files).map { f =>
          val tmp = java.nio.file.Paths.get(scratch, s"stage$f")
          staged.filter($"f" === f).drop("f")
            .coalesce(1).write.parquet(tmp.toString)
          tmp.toFile.listFiles.find(_.getName.endsWith(".parquet")).get.toPath
        }
        val schema = spark.read.parquet(parts.head.getParent.toString).schema
        new java.io.File(s"$scratch/dedup/bands/batch=0").mkdirs()
        val flaggedCopies = new java.util.concurrent.atomic.AtomicLong(0L)
        val flaggedOrig = new java.util.concurrent.atomic.AtomicLong(0L)
        val t0 = System.nanoTime()
        val reg = graft.streaming.NearDupStream.registerExpiringLww(
            spark.readStream.schema(schema).parquet(inDir),
            ttl * 1000L, delay = "10 seconds")
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$scratch/ckpt-reg")
          .foreachBatch {
            (b: Dataset[graft.streaming.NearDupStream.RegMsg], id: Long) =>
              graft.streaming.OplogPipeline.writeIndexBatch(
                b.toDF().withColumn("epoch", lit(id)), s"$scratch/dedup", id, "bands")
              ()
          }
          .start()
        val bandLineSchema = StructType(Seq(StructField("data",
          StructType.fromDDL(graft.streaming.NearDupStream.RegMsgDdl))))
        val buckets = graft.streaming.NearDupStream.applyLww(
            spark.readStream.schema(bandLineSchema)
              .json(s"$scratch/dedup/bands/batch=*").select("data.*"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$scratch/ckpt-buk")
          .foreachBatch {
            (b: Dataset[graft.streaming.NearDupStream.NearDupBandP], _: Long) =>
              val v = graft.streaming.NearDupStream.fold(b.toDF())
                .filter($"dup_of".isNotNull).cache()
              flaggedCopies.addAndGet(v.filter($"doc_id" >= CopyOffset).count())
              flaggedOrig.addAndGet(v.filter($"doc_id" < CopyOffset).count())
              v.unpersist()
              ()
          }
          .start()
        try {
          parts.zipWithIndex.foreach { case (p, i) =>
            java.nio.file.Files.move(p,
              java.nio.file.Paths.get(inDir, f"f${i + 1}%03d.parquet"))
            reg.processAllAvailable()
            buckets.processAllAvailable()
          }
        } finally { buckets.stop(); reg.stop() }
        val wallSec = (System.nanoTime() - t0) / 1e9
        def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
          Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
            .map(_.numRowsTotal).sum
        val caught = flaggedCopies.get()
        println(f"""{"probe":"gate_ttl_lww","ttl_sec":$ttl,"delta_sec":$DeltaSec,"late_dups":$nCopies,"flagged":$caught,"admitted":${nCopies - caught},"recall_pct":${100.0 * caught / nCopies}%.1f,"base_corpus_flags":${flaggedOrig.get()},"wall_sec":$wallSec%.1f,"registry_rows":${stateRows(reg)},"bucket_rows":${stateRows(buckets)}}""")
      } finally {
        scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
        ()
      }
    }
  }
}
