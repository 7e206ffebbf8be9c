package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSuite {

  test("split assignment is deterministic and near the 80/10/10 design") {
    val a = Pipeline.splitAssign.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Pipeline.splitAssign.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b, "assignment must be reproducible")
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac ${frac("train")}")
    assert(frac.keySet == Set("train", "val", "test"))
  }

  test("filtered top-k only ever scores vectors passing the predicate") {
    val rows = Pipeline.filteredTopK.run(spark, sf0001).collect()
    val allowed = graft.Tables.load(spark, sf0001, "embeddings")
      .filter(col("label").isin(1, 2, 3))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rows.nonEmpty)
    assert(rows.forall(r => allowed.contains(r.getLong(2))),
      "a result escaped the metadata filter")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.values.foreach(rs => assert(rs.length == 10))
  }

  test("stratified sample is balanced: every stratum contributes exactly min-stratum-size rows") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val counts = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = counts.values.min
    val sampled = Pipeline.sampleStratified.run(spark, sf0001).collect()
    val perLang = sampled.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perLang.keySet == counts.keySet, "a stratum vanished")
    perLang.foreach { case (lang, n) => assert(n == target, s"$lang: $n != $target") }
    // content-addressed: the same run again keeps exactly the same docs
    val again = Pipeline.sampleStratified.run(spark, sf0001).collect().map(_.getLong(0)).toSet
    assert(again == sampled.map(_.getLong(0)).toSet)
  }

  test("token percentiles are ordered and cover every lang") {
    val rows = Pipeline.tokenPercentiles.run(spark, sf0001).collect()
    val langs = graft.Tables.load(spark, sf0001, "documents")
      .select("lang").distinct().count()
    assert(rows.length == langs)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p50 <= p90 && p90 <= p99, s"${r.getString(0)}: $p50 $p90 $p99")
    }
  }
}
