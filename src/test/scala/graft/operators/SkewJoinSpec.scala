package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSuite {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val hot = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(42L)).as("k"), $"id".as("v"))
    val cold = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (6L, "c")).toDF("ck", "name")
    val plain = hot.join(cold, $"k" === $"ck").select($"v", $"name")
    val salted = SkewJoin.salted(hot, col("k"), cold, col("ck"), salts = 8)
      .select($"v", $"name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("approx distinct stays within the declared error bound") {
    val df = Advanced.approxDistinct.run(spark, sf0001).collect()
    val exact = graft.Tables.load(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.foreach { r =>
      val (flag, approx) = (r.getString(0), r.getLong(1))
      val err = math.abs(approx - exact(flag)).toDouble / exact(flag)
      assert(err <= 0.1, s"$flag: approx=$approx exact=${exact(flag)} err=$err")
    }
  }
  test("deterministic md5 HLL estimate stays within 10% of exact") {
    val rows = Advanced.hllDistinct.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getLong(2).toDouble
      val exact = r.getLong(3).toDouble
      assert(math.abs(est - exact) / exact <= 0.10,
        s"${r.getString(0)}: hll $est vs exact $exact")
    }
  }
}
