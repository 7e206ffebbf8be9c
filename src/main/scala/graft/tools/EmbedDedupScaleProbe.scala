package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Embedding-dedup scale probe: measures the claim in
  * [[graft.operators.Dedup.embeddingLsh]]'s scaladoc that the PLANE
  * COUNT is the sub-quadratic dial — the hamming≤2 multiprobe verify
  * term is ~masks·n²/2ᵖ pair evaluations, so candidate volume must
  * fall ~2ᵖ-fold (per mask) as planes grow while planted-dup recall
  * holds.
  *
  * Corpus: `nPairs` planted near-identical pairs (copy = base + small
  * deterministic perturbation, cos ≈ 0.99 — the dup regime the
  * operator is for) over an isotropic background (cos ≈ 0 — the
  * regime the bucketing must NOT pair), generated with the same
  * seedless splitmix64/Box–Muller determinism as
  * [[VectorScaleProbe]].
  *
  * Usage: runMain graft.tools.EmbedDedupScaleProbe <workDir> <mult...>
  * (planes swept at 8/12/16 per mult; background = 2000·mult vectors,
  * planted pairs = 200).
  */
object EmbedDedupScaleProbe {

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private def gauss(seed: Long): Double = {
    val u1 = ((mix(seed) >>> 11).toDouble + 1.0) / 9007199254740993.0
    val u2 = ((mix(seed + 0x632be59bd9b4e019L) >>> 11).toDouble + 0.5) / 9007199254740992.0
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  private val Dim = 64
  private val NPairs = 200

  private def unit(seed: Long): Array[Double] = {
    val v = Array.tabulate(Dim)(d => gauss(seed * 131L + d))
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** planted dup pairs occupy ids (2k, 2k+1), background follows. */
  def generate(spark: SparkSession, mult: Int, dir: String): Long = {
    import spark.implicits._
    val planted = (0 until NPairs).flatMap { k =>
      val b = unit(4000L + k)
      val dup = b.indices.map(d => b(d) + gauss(k * 733L + d) * 0.03).toArray
      Seq((k.toLong * 2, b.map(_.toFloat), 0),
        (k.toLong * 2 + 1, dup.map(_.toFloat), 0))
    }
    val firstBg = NPairs.toLong * 2
    val nBg = 2000L * mult
    val bg = spark.range(nBg).as[Long]
      .mapPartitions(_.map(i => (firstBg + i, unit(9000000L + i).map(_.toFloat), 9)))
      .toDF("vec_id", "embedding", "label")
    planted.toDF("vec_id", "embedding", "label").union(bg)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    firstBg + nBg
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mults = args.drop(1).map(_.toInt)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-embdedupprobe"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mults.foreach { mult =>
      val n = generate(spark, mult, dir)
      val allPairs = n * (n - 1) / 2.0
      Seq(8, 12, 16).foreach { planes =>
        def drop(): Unit = {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        }
        def timed[T](f: => T): (T, Double) = {
          val t1 = System.nanoTime(); val r = f; val d1 = (System.nanoTime() - t1) / 1e9
          drop()
          val t2 = System.nanoTime(); f; val d2 = (System.nanoTime() - t2) / 1e9
          drop()
          (r, math.min(d1, d2))
        }
        // candidate volume: the bucket-join output BEFORE the verify cut
        val (cand, _) =
          timed(graft.operators.Dedup.embeddingLshPairs(spark, dir, planes, -1.0).count())
        val (verifiedRows, tVer) =
          timed(graft.operators.Dedup.embeddingLshPairs(spark, dir, planes).collect())
        val got = verifiedRows.map(r => (r.getLong(0), r.getLong(1))).toSet
        val plantedPairs = (0 until NPairs).map(k => (k.toLong * 2, k.toLong * 2 + 1)).toSet
        val recall = (got & plantedPairs).size.toDouble / plantedPairs.size
        println(f"[embdedupprobe] mult=$mult n=$n planes=$planes " +
          f"cand=$cand cand_frac=${cand / allPairs}%.6f " +
          f"verified=${got.size} planted_recall=$recall%.3f sec=$tVer%.2f")
      }
    }
    spark.stop()
  }
}
