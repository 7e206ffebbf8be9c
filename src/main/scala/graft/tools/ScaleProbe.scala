package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Measured-scaling probe: generates a deterministic synthetic corpus
  * N× the sf0.1 shape (documents / events / embeddings with the same
  * schemas, vocab and value ranges, near-dups planted at 0.5%), then
  * times catalog operators from `SparkEntry.queries` against it
  * unmodified. Two probe sizes give a measured scaling ratio for
  * SCALING.md — evidence that the operator shapes are linear(ish) in
  * corpus size, not just asserted to be.
  *
  * Determinism: every value is a splitmix64 function of its row id —
  * no RNG state, no wall clock — so runs are reproducible and
  * comparable.
  *
  * Usage: runMain graft.tools.ScaleProbe <multiplier> <workDir> <query...>
  */
object ScaleProbe {

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private val vocab: Array[String] = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  private def docText(seed: Long, nTok: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < nTok) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(((mix(seed + i) >>> 8) % vocab.length).toInt))
      i += 1
    }
    sb.toString
  }

  def generate(spark: SparkSession, mult: Int, dir: String): Unit = {
    import spark.implicits._
    val nDocs = 5000L * mult
    val nEvents = 100000L * mult
    val nVecs = 2000L * mult

    // documents: ~54 tokens from the fixture vocab; every 200th doc gets
    // a planted near-dup twin. 3 token edits perturb up to ~7 of ~52
    // shingles => shingle-Jaccard ~ 0.75, where the 16x4 banding miss
    // probability is ~(1-0.75^4)^16 ~ 2e-3 per pair — a couple of the
    // 500 planted pairs legitimately go unfound (matches the measured
    // 498/500 in SCALING.md)
    spark.range(nDocs).select($"id".as("doc_id")).as[Long]
      .mapPartitions(_.flatMap { d =>
        val nTok = 40 + ((mix(d) >>> 16) % 30).toInt
        val base = docText(d * 1000L, nTok)
        val main = (d, base, s"l${(mix(d + 7) >>> 8) % 5}", s"src${(mix(d + 13) >>> 8) % 20}",
          base.length.toLong)
        if (d % 200 == 0) {
          val toks = base.split(' ')
          var i = 0
          while (i < 3 && i < toks.length) {
            toks(i * 7 % toks.length) = vocab(((mix(d * 31 + i) >>> 8) % vocab.length).toInt)
            i += 1
          }
          val twin = toks.mkString(" ")
          Iterator(main, (nDocs + d, twin, main._3, main._4, twin.length.toLong))
        } else Iterator(main)
      })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")

    // events: 30 days from a fixed epoch, 2-decimal values, 5 types
    val types = Array("view", "click", "purchase", "signup", "error")
    spark.range(nEvents).select($"id").as[Long]
      .mapPartitions(_.map { i =>
        val tsUs = 1704067200000000L + (mix(i) >>> 8) % (30L * 86400 * 1000000)
        (i, tsUs, (mix(i + 3) >>> 8) % (nEvents / 40),
          types(((mix(i + 5) >>> 8) % types.length).toInt),
          // heavy-tailed (exponential-ish) so the 2-sigma outlier set is
          // non-empty — a uniform value column has no tail beyond 2 sigma
          math.rint(-math.log(((mix(i + 9) >>> 8) % 1000000 + 1).toDouble / 1000001.0) * 5000.0) / 100.0 + 0.01,
          s"""{"k": ${(mix(i + 11) >>> 8) % 100}}""")
      })
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      // the fixture's events.ts is TIMESTAMP(NANOS), surfaced as int64
      // nanos under nanosAsLong — write raw nanos so Tables.load's
      // `ts div 1000` conversion applies to this corpus identically
      .withColumn("ts", ($"ts_us" * 1000L)).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")

    // lineitem (basket columns only — ReadSchema pruning means the
    // probe queries never touch the rest): ~4 lines/order, part space
    // scaled WITH the corpus so pair supports stay sparse like TPC-H
    val nLines = 600000L * mult
    spark.range(nLines).select($"id").as[Long]
      .mapPartitions(_.map { i =>
        ((mix(i) >>> 8) % (nLines / 4), (mix(i + 23) >>> 8) % (2000L * mult))
      })
      .toDF("l_orderkey", "l_partkey")
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")

    // embeddings: 64-dim floats in [-1, 1]
    spark.range(nVecs).select($"id").as[Long]
      .mapPartitions(_.map { v =>
        val arr = Array.tabulate(64)(d =>
          (((mix(v * 64L + d) >>> 8) % 2000000).toFloat / 1000000.0f) - 1.0f)
        (v, arr, ((mix(v + 17) >>> 8) % 8).toInt)
      })
      .toDF("vec_id", "embedding", "label")
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val mult = args(0).toInt
    val dir = args(1)
    val queries = args.drop(2)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-scaleprobe"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // opt-in reliable-checkpoint dial for the iterative CC ops, so the
    // fault-tolerant-lineage premium is measurable: GRAFT_CC_CHECKPOINT_DIR=<dir>
    sys.env.get("GRAFT_CC_CHECKPOINT_DIR")
      .foreach(d => spark.conf.set("graft.dedup.cc.checkpointDir", d))
    // kNN-graph cell-count dial (C must grow with the corpus to keep
    // per-cell pair volume constant): GRAFT_KNN_CELLS=<n>
    sys.env.get("GRAFT_KNN_CELLS")
      .foreach(c => spark.conf.set("graft.vector.knn.cells", c))

    val t0 = System.nanoTime()
    generate(spark, mult, dir)
    println(f"[scaleprobe] mult=$mult generated in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    queries.foreach { name =>
      (1 to 2).foreach { run =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val t = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"[scaleprobe] mult=$mult $name run$run ${(System.nanoTime() - t) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
