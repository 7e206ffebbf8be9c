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
  * Usage: `runMain graft.tools.GateTtlProbe [ttlSec...]` (default
  * 60 120 240 480 960; Δ fixed at 600 s; sf dir from
  * SPARK_GRAFT_SF_DIR, default sf0.001).
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
    val ttls = if (args.nonEmpty) args.map(_.toLong).toSeq
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
          val caught = flaggedCopies.get()
          println(f"""{"probe":"gate_ttl","ttl_sec":$ttl,"delta_sec":$DeltaSec,"late_dups":$nCopies,"flagged":$caught,"admitted":${nCopies - caught},"recall_pct":${100.0 * caught / nCopies}%.1f,"base_corpus_flags":${flaggedOrig.get()}}""")
        } finally {
          scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
          ()
        }
      }
    } finally spark.stop()
  }
}
