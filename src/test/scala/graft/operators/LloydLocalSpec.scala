package graft.operators

import graft.SparkSuite

/** Property gate for the round-20 driver-local Lloyd fast path
  * (`vector_ivf_retrain_k`, the CC-star size-guarded-hybrid pattern):
  * the local trace must equal the distributed trace ROW-EXACTLY —
  * same HALF_UP micro rounding, same quot integral division (`div`),
  * same `min(struct(score, cell))` argmin tie-breaks, same
  * Double→Long SSE cast — on the fixture and on random corpora with
  * NEGATIVE components, which exercise exactly the edges where a
  * floor-based division or a floor(x+0.5) rounding implementation
  * would diverge from Spark's semantics. */
class LloydLocalSpec extends SparkSuite {

  private def trace(dir: String): Seq[(Long, Long, Long, Long)] =
    VectorSearch.ivfRetrainK.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  /** run the query through the LOCAL path (default threshold covers
    * every test corpus) and the DISTRIBUTED path (threshold = 0 is the
    * force-distributed dial), returning both traces. */
  private def bothPaths(dir: String): (Seq[(Long, Long, Long, Long)], Seq[(Long, Long, Long, Long)]) = {
    val local = trace(dir)
    spark.conf.set("graft.vector.lloyd.localVecThreshold", "0")
    try (local, trace(dir))
    finally spark.conf.unset("graft.vector.lloyd.localVecThreshold")
  }

  test("fixture: local Lloyd trace == distributed trace, row-exact") {
    val (local, dist) = bothPaths(sf0001)
    assert(local.map(_._1) == Seq(1L, 2L, 3L))
    assert(local == dist, s"local $local vs distributed $dist")
  }

  test("random corpora with negative components: local == distributed") {
    import spark.implicits._
    val rnd = new scala.util.Random(20250818L)
    (1 to 4).foreach { trial =>
      val n = 20 + rnd.nextInt(120)
      val dim = if (trial % 2 == 0) 64 else 8
      val rows = (0 until n).map { id =>
        (id.toLong, Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft-lloyd").toFile
      try {
        rows.toDF("vec_id", "embedding").coalesce(1)
          .write.mode("overwrite")
          .parquet(s"${tmp.getAbsolutePath}/embeddings.parquet")
        val (local, dist) = bothPaths(tmp.getAbsolutePath)
        assert(local == dist,
          s"trial $trial (n=$n dim=$dim): local $local vs distributed $dist")
        assert(local.map(_._1) == Seq(1L, 2L, 3L))
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(tmp)
      }
    }
  }
}
