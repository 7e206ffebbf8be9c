package graft.tools

import org.apache.spark.sql.functions._

/** Sizes the RECALL GATE's one declared dial: how large must the held
  * query fixture be for a STABLE verdict? For each fixture size the
  * probe draws several disjoint deterministic fixtures from the
  * corpus, measures mean recall@k of the RETRAINED codebook at
  * production nprobe against a published version
  * ([[graft.streaming.ManagedIndex.recallMicro]] — the exact quantity
  * the gate thresholds), and reports the per-size spread: the verdict
  * is stable once the spread no longer straddles plausible bars.
  *
  * Usage: `runMain graft.tools.RecallGateProbe [sizes...]` (default
  * 2 5 10 20 40; corpus = the sf embeddings replicated ×8 with a
  * planted 300-copy blob so the retrain is the realistic breach-fired
  * one; sf dir from SPARK_GRAFT_SF_DIR, default sf0.001). */
object RecallGateProbe {

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(2, 5, 10, 20, 40)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-rgp")
      .toFile.getAbsolutePath
    try {
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select($"vec_id",
          expr("transform(embedding, x -> cast(x as double))").as("embedding"))
        .localCheckpoint()
      val baseN = base.count()
      // corpus: ×8 replicas + a 300-copy blob of one vector (the
      // clustered-drift shape a breach-fired retrain actually faces)
      val corpus = base
        .crossJoin(broadcast((0L until 8L).toDF("k")))
        .select(($"vec_id" + $"k" * 1000000L).as("doc_id"), $"embedding")
        .unionByName(
          base.filter($"vec_id" === 130L)
            .crossJoin(broadcast((0L until 300L).toDF("k")))
            .select(($"k" + 50000000L).as("doc_id"), $"embedding"))
      corpus.select($"doc_id", lit("en").as("lang"), lit(10L).as("n_tokens"),
          lit(0L).as("rank_key"), lit(0L).as("cum_tokens"), $"embedding")
        .write.parquet(s"$root/manifest")
      val cb0 = graft.streaming.VectorServeStream.codebookFrom(
        spark, s"$sfDir/embeddings.parquet")
      graft.streaming.MmrServeStream.reindexAdmitted(
        spark, s"$root/manifest", cb0, s"$root/v1")
      val candidate = graft.streaming.ManagedIndex.lloydRound(
        spark, s"$root/v1", cb0)
      val allVecs = base.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      sizes.foreach { s =>
        val recalls = (0 until 5).map { rep =>
          // disjoint deterministic fixtures: stride through the base
          // vector table
          val fixture = (0 until s).map { i =>
            allVecs(((rep * 97 + i * 13) % baseN).toInt)
          }.toArray
          graft.streaming.ManagedIndex.recallMicro(spark, fixture,
            s"$root/v1", candidate, k = 10, nprobe = 2)
        }
        println(f"""{"probe":"recall_gate","fixture_size":$s,"recalls_micro":${recalls.mkString("[", ",", "]")},"min":${recalls.min},"max":${recalls.max},"spread":${recalls.max - recalls.min}}""")
      }
    } finally {
      spark.stop()
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      ()
    }
  }
}
