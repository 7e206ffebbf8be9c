package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Proof of the co-located-join scale lever SCALING.md promises for the
  * fact-fact joins (q3's orders⋈lineitem): bucketing both tables on the
  * join key at write time gives every downstream join on that key a
  * shuffle-free plan — at 100 TB the once-per-dataset bucketed write
  * replaces a per-query shuffle of the two largest tables.
  *
  * The spec disables broadcast (which at fixture scale would hide the
  * shuffle) and asserts the physical plan joins the two bucketed scans
  * with ZERO shuffle exchanges on the join side — the only Exchange in
  * the plan is the final single-partition presentation sort, which is
  * O(result), not O(data).
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed fact-fact join on the bucket key plans with no join-side shuffle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // once-per-dataset preparation: co-bucket both facts on orderkey
      graft.Tables.load(spark, sf0001, "lineitem")
        .select($"l_orderkey", $"l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/li").saveAsTable("graft_li_bucketed")
      graft.Tables.load(spark, sf0001, "orders")
        .select($"o_orderkey", $"o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/ord").saveAsTable("graft_ord_bucketed")

      // join on the bucket key, then aggregate on the SAME key: bucket
      // partitioning satisfies the join AND the agg, so neither needs
      // an exchange — per-order rollup over two co-bucketed facts is
      // the 100 TB shape this buys
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey", $"o_orderpriority")
        .agg(sum($"l_quantity").as("qty"))

      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 0,
        s"expected a fully co-located join+agg (bucket partitioning satisfies " +
          s"both the join and the agg keys); plan had $exchanges hash exchanges:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join over the bucketed scans:\n$plan")

      // and the shuffle-free plan computes the same result as the
      // straightforward (shuffling) one
      val expect = graft.Tables.load(spark, sf0001, "lineitem")
        .join(graft.Tables.load(spark, sf0001, "orders"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey", $"o_orderpriority")
        .agg(sum($"l_quantity").as("qty"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
      // external-table files survive DROP TABLE — remove the temp dir
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
