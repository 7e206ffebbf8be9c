package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Executable proof for the materialized cluster-label table
  * ([[Dedup.labelTable]]) — the BandIndexSpec discipline applied to
  * labels: star-CC is computed ONCE per corpus version, persisted
  * bucketed by doc_id, and every label consumer equi-joins it with the
  * label side contributing ZERO exchanges. Three claims pinned:
  *
  *  1. the persisted copy is FAITHFUL — table contents equal a fresh
  *     [[Dedup.connectedComponentsStar]] labeling of the same pair
  *     graph (so the four consumers' unchanged DuckDB oracles stay the
  *     semantic gate);
  *  2. the consumer plan is the one the scaladocs promise — in
  *     `split_leakage_safe` the label side is a bucketed scan and the
  *     ONLY doc_id-keyed exchange is the corpus spine being routed to
  *     the table's bucket layout;
  *  3. consumers reuse the memoized table — no star-CC jobs run when a
  *     second consumer executes (the whole point of materializing).
  */
class LabelStoreSpec extends SparkSuite {

  test("persisted label table is a faithful copy of a fresh star-CC labeling") {
    import spark.implicits._
    val got = spark.table(Dedup.labelTable(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (lab, _) = Dedup.connectedComponentsStar(spark,
      Dedup.minhashLsh.run(spark, sf0001).select($"d1", $"d2"))
    val want = lab.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty, "fixture must contain near-dup clusters")
    // only docs in pairs are labeled: the table is the SMALL side
    val corpus = graft.Tables.load(spark, sf0001, "documents").count()
    assert(got.size < corpus, "label table must not cover the whole corpus")
  }

  test("split_leakage_safe: label side is a bucketed scan with zero exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // materialize OUTSIDE the no-broadcast window so the labeling job
    // itself keeps its normal plan; the pin is about the CONSUMER
    Dedup.labelTable(spark, sf0001)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.splitLeakageSafe.run(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"label side must be a bucketed scan:\n${plan.take(1500)}")
      val docIdExchanges = "Exchange hashpartitioning\\(doc_id#".r.findAllIn(plan).length
      assert(docIdExchanges == 1,
        s"expected exactly ONE doc_id exchange (the corpus spine); got $docIdExchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("consumers reuse the memoized table: no star-CC recomputation on second use") {
    import spark.implicits._
    Dedup.labelTable(spark, sf0001) // ensure materialized
    // star-CC's signature job is the tagged-union fixpoint check; count
    // jobs a consumer launches and require it to stay in the low single
    // digits (a labeling run launches dozens: ~4 jobs x rounds)
    val sc = spark.sparkContext
    // job groups are thread-local, so this count is immune to parallel
    // suites sharing the session
    sc.setJobGroup("labelstore-consumer", "clusterStats on materialized labels")
    val n =
      try Dedup.clusterStats.run(spark, sf0001).count()
      finally sc.clearJobGroup()
    assert(n > 0)
    val jobs = sc.statusTracker.getJobIdsForGroup("labelstore-consumer").length
    assert(jobs <= 8,
      s"cluster_stats on the materialized table should be a handful of jobs, ran $jobs " +
        "(a star-CC recomputation would launch dozens)")
  }
}
