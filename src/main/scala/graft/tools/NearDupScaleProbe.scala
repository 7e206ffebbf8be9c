package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** State-scaling probe for the live near-dup gate: the corpus
  * replicated R× with PER-REPLICA-DISTINCT SHINGLES (every token
  * prefixed `r<rep>_`, so replicas share no 3-shingles and are NOT
  * near-dups of each other — each replica reproduces the base
  * corpus's planted dup classes in its own shingle space), which
  * multiplies the gate's occupied-bucket state linearly while keeping
  * flagged mass proportional. The question: does per-doc cost stay
  * flat as state grows — and where does the default HDFS state store
  * (whole-store re-snapshot per commit, superlinear past ~25k
  * keys/store, SCALING.md "provider crossover") force the RocksDB
  * provider, exactly as the CDC chain's StateResumeProbe found?
  *
  * Usage: `runMain graft.tools.NearDupScaleProbe [hdfs|rocksdb] [reps...]`
  * (default `hdfs 1 4 16`), sf dir from SPARK_GRAFT_SF_DIR
  * (default sf0.1).
  */
object NearDupScaleProbe {

  /** replicas with disjoint shingle spaces: prefix every token. */
  private def replicateDistinct(docs: DataFrame, k: Int): DataFrame =
    if (k == 1) docs
    else {
      val stride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      docs.select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(k - 1))).as("rep"))
        .select((col("doc_id") + col("rep") * stride).as("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(array_join(
              transform(split(col("text"), " "),
                t => concat(lit("r"), col("rep"), lit("_"), t)), " "))
            .as("text"))
    }

  def main(args: Array[String]): Unit = {
    val provider = args.headOption.filter(Set("hdfs", "rocksdb")).getOrElse("hdfs")
    val repArgs = if (args.headOption.exists(Set("hdfs", "rocksdb"))) args.drop(1) else args
    val reps = if (repArgs.nonEmpty) repArgs.map(_.toInt).toSeq else Seq(1, 4, 16)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    if (provider == "rocksdb") {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    try {
      val base = graft.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      reps.foreach { k =>
        val scratch = java.nio.file.Files
          .createTempDirectory(s"graft-ndscale-$provider-$k").toFile.getAbsolutePath
        try {
          val docs = replicateDistinct(base, k).localCheckpoint()
          val n = docs.count()
          val r = graft.streaming.StreamBench.benchNearDupDocs(
            spark, docs, scratch, files = 16 * k)
          println(f"""{"probe":"neardup_scale","provider":"$provider","rep":$k,"docs":$n,"docs_per_sec":${r.rowsPerSec}%.0f,"flagged":${r.appliedRows},"band_rows":${r.emittedRows},"batches":${r.batches},"batch_ms_p50":${r.batchMsP50},"batch_ms_max":${r.batchMsMax},"elapsed_sec":${r.elapsedSec}%.3f}""")
        } finally {
          scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
          ()
        }
      }
    } finally spark.stop()
  }
}
