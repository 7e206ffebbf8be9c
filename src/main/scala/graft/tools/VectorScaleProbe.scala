package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-path scale probe: planted-neighbor corpora N× the sf0.1
  * embedding count, measuring — for the exact baseline and both
  * ORACLE-able bucketed ANN paths at their default dials — wall time,
  * planted recall@10 vs the exact top-k, and the candidate fraction
  * (rows scored per query / corpus size). The candidate fraction is
  * the number that must NOT grow with corpus size for the bucketed
  * paths to be the 100 TB story; recall is the number that must not
  * collapse while it shrinks.
  *
  * Corpus shape mirrors VectorPlantedSpec: 8 unit query vectors
  * (vec_id 0..7), 12 planted cos≈0.93 neighbors each, and 2000·mult
  * isotropic background vectors (Box–Muller over splitmix64 — fully
  * deterministic, no RNG state).
  *
  * Usage: runMain graft.tools.VectorScaleProbe <workDir> <mult...>
  */
object VectorScaleProbe {

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** deterministic standard normal from a seed (Box–Muller). */
  private def gauss(seed: Long): Double = {
    val u1 = ((mix(seed) >>> 11).toDouble + 1.0) / 9007199254740993.0
    val u2 = ((mix(seed + 0x632be59bd9b4e019L) >>> 11).toDouble + 0.5) / 9007199254740992.0
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  private val Dim = 64

  // object-level (not nested in generate): executor closures then reach
  // it through the module's static field instead of capturing an
  // enclosing non-serializable frame
  private def unit(seed: Long): Array[Double] = {
    val v = Array.tabulate(Dim)(d => gauss(seed * 131L + d))
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  def generate(spark: SparkSession, mult: Int, dir: String): Long = {
    import spark.implicits._
    // 8 queries + 96 planted neighbors: tiny, built on the driver
    val queries = (0 until 8).map(i => unit(1000L + i))
    val planted = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Int)]
    queries.zipWithIndex.foreach { case (q, i) =>
      planted += ((i.toLong, q.map(_.toFloat), i))
    }
    var id = 8L
    queries.zipWithIndex.foreach { case (q, i) =>
      (0 until 12).foreach { _ =>
        val v = q.indices.map(d => q(d) + gauss(id * 977L + d) * 0.05).toArray
        planted += ((id, v.map(_.toFloat), i))
        id += 1
      }
    }
    val nBackground = 2000L * mult
    val head = planted.toSeq.toDF("vec_id", "embedding", "label")
    val firstBg = id
    val bg = spark.range(nBackground).select($"id").as[Long]
      .mapPartitions(_.map { i =>
        (firstBg + i, unit(7000000L + i).map(_.toFloat), 9)
      })
      .toDF("vec_id", "embedding", "label")
    head.union(bg)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    firstBg + nBackground
  }

  private def topSets(spark: SparkSession, q: graft.operators.Q, dir: String): Map[Long, Set[Long]] =
    q.run(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap

  private def recall(ann: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val rs = exact.keys.toSeq.map { k =>
      exact(k).count(ann.getOrElse(k, Set.empty).contains).toDouble / exact(k).size
    }
    rs.sum / rs.size
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mults = args.drop(1).map(_.toInt)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-vectorprobe"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.VectorSearch

    mults.foreach { mult =>
      val n = generate(spark, mult, dir)
      def timed[T](f: => T): (T, Double) = {
        // min of two runs: this box randomly inflates single runs
        val t1 = System.nanoTime(); val r = f; val d1 = (System.nanoTime() - t1) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val t2 = System.nanoTime(); f; val d2 = (System.nanoTime() - t2) / 1e9
        (r, math.min(d1, d2))
      }
      val (exact, tExact) = timed(topSets(spark, VectorSearch.topK, dir))
      val (lsh, tLsh) = timed(topSets(spark, VectorSearch.annLsh, dir))
      val (ivf, tIvf) = timed(topSets(spark, VectorSearch.annIvfFlat, dir))
      val (pq, tPq) = timed(topSets(spark, VectorSearch.pqAdc, dir))
      val (ivfpq, tIvfPq) = timed(topSets(spark, VectorSearch.annIvfPq, dir))
      val (candLsh, _) = timed(VectorSearch.lshCandidates(spark, dir).count())
      val (candIvf, _) = timed(VectorSearch.ivfFlatCandidates(spark, dir).count())
      val denom = 8.0 * n
      println(f"[vectorprobe] mult=$mult n=$n exact_s=$tExact%.2f " +
        f"lsh_s=$tLsh%.2f lsh_recall=${recall(lsh, exact)}%.3f lsh_cand_frac=${candLsh / denom}%.4f " +
        f"ivfflat_s=$tIvf%.2f ivfflat_recall=${recall(ivf, exact)}%.3f ivfflat_cand_frac=${candIvf / denom}%.4f " +
        f"pq_s=$tPq%.2f pq_recall=${recall(pq, exact)}%.3f " +
        f"ivfpq_s=$tIvfPq%.2f ivfpq_recall=${recall(ivfpq, exact)}%.3f")
    }
    spark.stop()
  }
}
