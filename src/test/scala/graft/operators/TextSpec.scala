package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextSpec extends SparkSuite {

  test("token counts are consistent with the raw text") {
    val df = TextAnalysis.tokenCount.run(spark, sf0001)
    val bad = df.filter(col("n_tokens") < col("n_distinct") || col("n_chars") <= 0).count()
    assert(bad == 0)
    val one = df.filter(col("doc_id") === 0).head()
    val text = graft.Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    assert(one.getAs[Int]("n_tokens") == text.split(" ").count(_.nonEmpty))
  }

  test("quality score stays in [0, 1]") {
    val df = TextAnalysis.quality.run(spark, sf0001)
    assert(df.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
  }

  test("langid is deterministic and total") {
    val df = TextAnalysis.langId.run(spark, sf0001)
    assert(df.filter(col("predicted").isNull).count() == 0)
    assert(df.count() == 500)
  }

  test("top terms: exactly k per lang, ranked by exact tf/df with term tiebreak") {
    val rows = TextAnalysis.topTerms.run(spark, sf0001).collect()
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == 10, s"$lang: ${rs.length} rows")
      val ordered = rs.sortBy(_.getInt(1))
      ordered.sliding(2).foreach { case Array(a, b) =>
        val (sa, sb) = (a.getDouble(5), b.getDouble(5))
        assert(sa > sb || (sa == sb && a.getString(2) < b.getString(2)),
          s"$lang rank ${a.getInt(1)}->${b.getInt(1)} not (score desc, term asc)")
      }
      // score is the exact rational tf/df
      rs.foreach(r => assert(r.getDouble(5) == r.getLong(3).toDouble / r.getLong(4)))
    }
  }

  test("fingerprint is order- and duplication-insensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "b a a c"), (2L, "a b c"), (3L, "c b a x")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFns.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }
}
