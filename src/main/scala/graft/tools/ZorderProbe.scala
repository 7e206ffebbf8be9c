package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what `corpus_zorder` buys at the FILE level: writes the
  * corpus in three 16-file layouts — linear (doc_id ranges), 1-D
  * lang-sorted, and zkey-sorted — then counts how many files a
  * lang-equality scan and an n_chars-band scan actually have to read
  * in each (files CONTAINING matching rows ≈ what footer min/max
  * pruning admits, since a sorted layout makes stats tight).
  *
  * The triangle this proves: linear prunes NEITHER dimension, the 1-D
  * sort prunes its own dimension perfectly and the other not at all,
  * the Morton layout prunes BOTH — the reason ZORDER BY exists.
  *
  * Usage: runMain graft.tools.ZorderProbe <workDir> [sfDir]
  */
object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val work = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-zorder"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val z = graft.operators.Pipeline.corpusZorder.run(spark, sfDir)
      .select($"doc_id", $"lang", $"n_chars", $"zkey").localCheckpoint()

    def write(name: String, keyed: org.apache.spark.sql.Column): String = {
      val path = s"$work/$name"
      z.repartitionByRange(16, keyed).sortWithinPartitions(keyed)
        .write.mode(SaveMode.Overwrite).parquet(path)
      path
    }
    val linear = write("linear", $"doc_id")
    val byLang = write("bylang", $"lang")
    val byZ = write("zorder", $"zkey")

    def filesFor(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(path)
      val total = df.select(input_file_name()).distinct().count()
      val hit = df.filter(pred).select(input_file_name()).distinct().count()
      (hit, total)
    }
    val langPred = $"lang" === "de"
    // one 64-wide n_chars bucket (y ∈ {4}): the size-band scan
    val sizePred = $"n_chars" >= 256 && $"n_chars" < 320
    Seq(("linear", linear), ("bylang", byLang), ("zorder", byZ)).foreach {
      case (name, path) =>
        val (lh, lt) = filesFor(path, langPred)
        val (sh, st) = filesFor(path, sizePred)
        println(s"[zorder] layout=$name lang_files=$lh/$lt size_files=$sh/$st")
    }
    spark.stop()
  }
}
