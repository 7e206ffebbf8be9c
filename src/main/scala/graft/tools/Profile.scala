package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFns

/** scratch profiler for operator internals (not part of the API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val sh = Tables.load(spark, sfDir, "documents")
      .repartition($"doc_id")
      .select($"doc_id", TextFns.shingleSet($"text").as("sh"))
      .filter(size($"sh") > 0)
      .persist()
    time("shingleSets materialize")(sh.count())

    val minhashes = sh
      .select($"doc_id", explode($"sh").as("s"))
      .withColumn("f", xxhash64($"s"))
      .groupBy($"doc_id")
      .agg(min(xxhash64($"f", lit(0))).as("mh0"),
        (1 until 64).map(i => min(xxhash64($"f", lit(i))).as(s"mh$i")): _*)
      .persist()
    time("minhash agg")(minhashes.count())

    val bandStructs = (0 until 16).map { b =>
      struct(lit(b).as("b"),
        xxhash64(col(s"mh${4 * b}"), col(s"mh${4 * b + 1}"),
          col(s"mh${4 * b + 2}"), col(s"mh${4 * b + 3}")).as("bh"))
    }
    val bands = minhashes
      .select($"doc_id", explode(array(bandStructs: _*)).as("band"))
      .select($"doc_id", $"band.b".as("b"), $"band.bh".as("bh"))
      .persist()
    time("bands")(bands.count())

    val cand = bands.as("x")
      .join(bands.as("y"), $"x.b" === $"y.b" && $"x.bh" === $"y.bh" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"))
      .distinct()
      .persist()
    println(s"[prof] candidates = ${time("cand join")(cand.count())}")

    val s1 = sh.select($"doc_id".as("d1"), $"sh".as("sh1"))
    val s2 = sh.select($"doc_id".as("d2"), $"sh".as("sh2"))
    val verified = cand.join(s1, "d1").join(s2, "d2")
      .withColumn("inter", size(array_intersect($"sh1", $"sh2")))
      .withColumn("n1", size($"sh1")).withColumn("n2", size($"sh2"))
      .filter($"inter" * 3 >= $"n1" + $"n2")
    println(s"[prof] verified = ${time("verify")(verified.count())}")
    spark.stop()
  }
}
