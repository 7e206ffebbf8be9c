package graft.operators

import org.apache.spark.sql.SparkSession

/** stagewise timing of the IVF-PQ build/serve pipeline over a probe
  * corpus — pinpoints which stage scales badly when the end-to-end
  * number moves (used to diagnose the round-9 ivfpq 6→14 s growth). */
object PqStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.builderDefaults(
      SparkSession.builder().master("local[32]").appName("graft-pqstage"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqstage] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val (a0, cents) = VectorSearch.ivfFlatAssign(spark, dir)
    val assigned = t("assign+checkpoint") { a0.localCheckpoint() }
    val cbsub = VectorSearch.pqCodebookSub(assigned)
    t("cbsub.count") { cbsub.count() }
    val codes = t("encode") {
      val c = VectorSearch.pqEncode(assigned, cbsub).localCheckpoint(); c.count(); c
    }
    t("encode-again") { VectorSearch.pqEncode(assigned, cbsub).count() }
    import spark.implicits._
    val withCell = t("codes-join-cell") {
      val j = codes.join(assigned.select($"vec_id", $"cell"), "vec_id").localCheckpoint()
      j.count(); j
    }
    val q = assigned.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qnrm"))
    val probes = t("probes") {
      val p = VectorSearch.probeCells(spark, q, cents, 2).select($"qid", $"cell")
        .localCheckpoint()
      p.count(); p
    }
    val luts = t("luts") {
      val l = VectorSearch.pqQueryLuts(assigned, cbsub).localCheckpoint(); l.count(); l
    }
    t("serve") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"qid").orderBy($"ip_micro".desc, $"vec_id")
      withCell.join(broadcast(probes), Seq("cell"))
        .filter($"vec_id" =!= $"qid")
        .join(broadcast(luts), Seq("qid"))
        .withColumn("ip_micro", expr(
          "aggregate(transform(codes, (c, m) -> element_at(lut, m * 16 + c + 1)), 0L, (a, x) -> a + x)"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 10)
        .count()
    }
    spark.stop()
  }
}
