package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the DISTRIBUTED PageRank walk above the hybrid threshold:
  * synthetic undirected graphs (ring + content-addressed chords, so the
  * degree distribution is non-uniform but deterministic) at growing
  * edge counts, timing the 10-round walk end to end. Usage:
  *   sbt "runMain graft.tools.PageRankScaleProbe [nVerts ...]"
  */
object PageRankScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100000, 400000)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-prprobe"), 32)
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    sizes.foreach { n =>
      // ring edges keep the graph connected; 2 hash chords per vertex
      // clump degrees (hub-ish structure) deterministically
      val v = spark.range(0, n).toDF("i")
      val half = v.select($"i".as("a"), (($"i" + 1) % n).as("b"))
        .union(v.select($"i".as("a"),
          (abs(hash($"i".cast("string"))) % n).cast("long").as("b")))
        .union(v.select($"i".as("a"),
          (abs(hash(concat($"i".cast("string"), lit("x")))) % n).cast("long").as("b")))
        .filter($"a" =!= $"b")
      val und = half.union(half.select($"b".as("a"), $"a".as("b")))
      val t0 = System.nanoTime()
      val out = graft.operators.VectorSearch.pageRankWalk(spark, und)
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val edges = 2L * (3L * n)   // upper bound before self-chord filter
      println(f"[prprobe] verts=$n%d rankRows=$rows%d (~edges<=$edges%d) " +
        f"walk10=$sec%.1f s (${sec / 10}%.2f s/round)")
    }
    spark.stop()
  }
}
