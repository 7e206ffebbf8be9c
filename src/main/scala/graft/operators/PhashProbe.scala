package graft.operators
import org.apache.spark.sql.{SparkSession, functions => F}

/** Stage-by-stage profiler for the image near-dup pipeline — the probe
  * that located the round-9 fixed-overhead findings: decode cost was
  * ImageIO's disk-backed stream cache (temp file per image), and CC
  * cost was per-round scheduler overhead on a 127-vertex contracted
  * hash graph (~1.5 s/round), which motivated the size-guarded driver
  * union-find fast path. Kept as a runnable tool: re-run after any
  * change to the decode kernel or `connectedComponentsStar` to see
  * where the wall-clock actually goes. */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("phash-probe"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val sig = t("phash") { graft.multimodal.Multimodal.phash.run(spark, dir)
      .select($"doc_id", $"phash").persist() }
    println("[probe] rows=" + sig.count())
    val hstats = t("hstats") { sig.groupBy($"phash")
      .agg(F.min($"doc_id").as("dmin"), F.count(F.lit(1)).as("ndocs")).localCheckpoint() }
    println("[probe] distinct hashes=" + hstats.count())
    val chunks = hstats.select($"phash",
      F.explode(F.expr("transform(sequence(0, 2), c -> named_struct('c', c, 'cv', shiftright(phash, c*8) & 255))")).as("ch"))
      .select($"phash", $"ch.c".as("c"), $"ch.cv".as("cv"))
    val hpairs = t("hpairs") { chunks.as("x").join(chunks.as("y"),
        $"x.c" === $"y.c" && $"x.cv" === $"y.cv" && $"x.phash" < $"y.phash")
      .select($"x.phash".as("d1"), $"y.phash".as("d2")).distinct()
      .filter(F.expr("bit_count(d1 ^ d2) <= 2")).localCheckpoint() }
    println("[probe] hpairs=" + hpairs.count())
    val (hlab, rounds) = t("cc") { Dedup.connectedComponentsStar(spark, hpairs) }
    println("[probe] cc rounds=" + rounds + " verts=" + hlab.count())
    spark.stop()
  }
}
