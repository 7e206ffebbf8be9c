package graft.operators

import graft.SparkSuite

/** Locks the performance-critical physical-plan shapes (PLANS.md) into
  * the test suite: these are the properties that make the operators
  * 100 TB-viable — pushdown reaching the scan, top-k planned as
  * TakeOrderedAndProject, dimension/benchmark sides broadcast, window
  * ranks pruned map-side. A refactor that silently loses one (e.g. a
  * filter moved above a join barrier, a broadcast hint dropped) fails
  * HERE instead of surfacing as an unexplained bench regression.
  *
  * Assertions are substring checks on the statically-planned execution
  * plan; under AQE the initial plan already contains the static
  * broadcast/top-k/window choices asserted. Plan construction is
  * usually job-free, but not always — events_outliers runs its stats
  * collect (the overflow fence) while building the frame.
  *
  * Broadcast assertions are made under autoBroadcastJoinThreshold=-1:
  * at fixture scale EVERY side fits the session's 64 MB auto threshold,
  * so without disabling it a dropped broadcast() hint would still
  * auto-broadcast here and the regression would only surface at
  * production scale — the exact blindness this spec exists to prevent.
  */
class PlanHygieneSpec extends SparkSuite {

  private def plan(name: String): String = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try graft.SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString
    finally spark.conf.set(key, prior)
  }

  test("q1: shipdate filter is pushed to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(400))
  }

  test("q3: top-10 is TakeOrderedAndProject, customer side broadcast") {
    val p = plan("q3_top_revenue")
    assert(p.contains("TakeOrderedAndProject"), "top-k fell back to a global sort")
    assert(p.contains("BroadcastHashJoin"), "dimension broadcast was lost")
  }

  test("contamination: benchmark gram set is the broadcast build side") {
    val p = plan("dedup_contamination")
    assert(p.contains("BroadcastHashJoin"), "benchmark probe must not shuffle the corpus")
    assert(p.contains("BroadcastExchange"), p.take(400))
  }

  test("mix_sample: rate table broadcast, no corpus shuffle before the filter") {
    val p = plan("mix_sample")
    assert(p.contains("BroadcastHashJoin"), "rate-table join must broadcast")
  }

  test("curation: both keyed windows get map-side WindowGroupLimit pruning") {
    val p = plan("curation_e2e")
    val n = "WindowGroupLimit".r.findAllIn(p).size
    // two windows × (partial below exchange + final above) = 4 nodes
    assert(n >= 4, s"expected >=4 WindowGroupLimit nodes, found $n")
  }

  test("cdc_apply_state: per-key rank pruned below the exchange") {
    val p = plan("cdc_apply_state")
    assert(p.contains("WindowGroupLimit"), "LWW rank must prune map-side")
  }

  test("events_outliers: stats enter as a broadcast local relation") {
    val p = plan("events_outliers")
    assert(p.contains("BroadcastHashJoin"), "z-test must stay a per-row broadcast filter")
    assert(p.contains("LocalTableScan"), "fenced stats should be a literal local relation")
  }

  test("doc_source_cap_2phase: both window stages prune map-side, survivors filtered before re-rank") {
    val p = plan("doc_source_cap_2phase")
    // (source, shard) local rank + source global re-rank, each with a
    // partial WindowGroupLimit below its exchange — 4 nodes total
    val n = "WindowGroupLimit".r.findAllIn(p).size
    assert(n >= 4, s"expected >=4 WindowGroupLimit nodes, found $n:\n${p.take(600)}")
  }

  test("dedup_containment: candidates are count-filtered map-side before any array moves") {
    val p = plan("dedup_containment")
    // the k-prefix count filter must partial-aggregate (a regression to
    // distinct-then-verify leaves a functions=[] HashAggregate and ships
    // shingle arrays to the full collision cross-product — the measured
    // 94s-vs-3.6s difference at 5x in SCALING.md)
    assert(p.contains("partial_count"),
      "candidate count filter lost its map-side partial aggregation")
    // toString prints the tree top-down, so every verify-stage
    // occurrence of array_intersect (Catalyst inlines it into both the
    // filter predicate and the projection of that one stage) must sit
    // ABOVE the candidate count aggregate — arrays never reach it
    assert(p.lastIndexOf("array_intersect") < p.indexOf("partial_count"),
      "set intersection leaked below the candidate count filter")
  }

  test("threshold samplers: per-stratum threshold table broadcast, corpus never shuffles") {
    for (name <- Seq("sample_stratified_threshold", "mix_temperature", "mix_to_target")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: threshold join must broadcast")
      // the corpus side reaches the broadcast join scan->filter only: no
      // Exchange may sit between the documents scan and the keep-filter
      // (the whole point of the threshold relaxation is zero corpus shuffle)
      val corpusSide = p.substring(p.indexOf("BroadcastHashJoin"))
      assert(!corpusSide.replaceAll("(?s)BroadcastExchange.*", "")
        .contains("Exchange hashpartitioning"),
        s"$name: corpus shuffled before the threshold filter")
    }
  }

  test("dedup_survivors: per-cluster sizes broadcast; dup removal is an anti join") {
    val p = plan("dedup_survivors")
    assert(p.contains("BroadcastHashJoin"), "cluster-size join must broadcast")
    assert(p.contains("LeftAnti"), "dup removal must be an anti join, not a subtract")
  }

  test("dedup_semantic: codebook broadcast; pair join is a keyed equi-join on cell") {
    val p = plan("dedup_semantic")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "centroid assignment must scan a broadcast codebook")
    // the within-cell pair join must key on cell (n^2/C, parallel per
    // cell) — a nested-loop pair join would be the all-pairs O(n^2)
    // this operator exists to avoid
    val tail = p.substring(p.indexOf("BroadcastNestedLoopJoin").max(0))
    assert(p.contains("SortMergeJoin [cell") || p.contains("ShuffledHashJoin [cell")
      || p.contains("SortMergeJoin [coalesce(cell") || tail.contains("hashpartitioning(cell"),
      s"pair join must be keyed on cell\n${p.take(600)}")
  }

  test("dedup_boilerplate: one corpus scan, df via window (no self-join)") {
    val p = plan("dedup_boilerplate")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      "boilerplate must read the corpus exactly once")
    assert(p.contains("Window"), "document frequency must be a window count")
    assert(!p.contains("Join"), "no join anywhere in the single-scan form")
  }

  test("q30_range_frame: single user_id exchange feeding the RANGE window") {
    val p = plan("q30_range_frame")
    assert(p.contains("RANGE BETWEEN -600 FOLLOWING AND CURRENT ROW")
      || p.contains("specifiedwindowframe(RangeFrame"),
      s"frame must be a RANGE frame\n${p.take(600)}")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      "both frame aggregates must share ONE user_id exchange")
  }

  test("dedup_incremental_bloom: codegen'd bloom prefilter gates the anti join") {
    val p = plan("dedup_incremental_bloom")
    // the membership test runs as our native expression inside the
    // filter (codegen), not a UDF
    assert(p.contains("bloom_might_contain"),
      s"prefilter must be the native bloom expression\n${p.take(600)}")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      "prefilter must not be a UDF")
    // history must never be exchanged: the exact check is a broadcast
    // semi probe of history by the candidate keys, then a broadcast
    // anti join of the hits — both survive autoBroadcastJoinThreshold=-1
    // because the hints are explicit
    assert(p.contains("LeftAnti"), "FP removal must be an anti join")
    assert(p.contains("LeftSemi"), "history probe must be a semi join")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"both history-side joins must broadcast\n${p.take(800)}")
  }

  test("text_search_topk: ranking is TakeOrderedAndProject, not a global sort") {
    val p = plan("text_search_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not materialize a global sort\n${p.take(400)}")
  }

  test("vector_rag_retrieve: ranked winners broadcast into the payload join; doc scan pruned") {
    val p = plan("vector_rag_retrieve")
    // the O(k·q) ranked result must be the build side — the document
    // store is probed in place, never shuffled
    assert(p.contains("BroadcastHashJoin"), "payload join must broadcast the top-k side")
    // column pruning: the documents scan (the one reading `lang`) must
    // not read `text` — the payload projection reaches the reader
    val docSchemas = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("lang")).toSeq
    assert(docSchemas.nonEmpty, s"expected a documents ReadSchema line\n${p.take(600)}")
    assert(docSchemas.forall(!_.contains("text")),
      s"documents scan must prune the text column\n${docSchemas.mkString("\n")}")
  }

  test("corpus_shuffle: exactly one hash exchange (the shard window)") {
    val p = plan("corpus_shuffle")
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p).length == 1,
      s"shard assignment must be a projection; only the window may shuffle\n${p.take(600)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"no other hash exchange may appear\n${p.take(600)}")
  }

  test("text_quality_classifier: stateless projection — no join, no aggregate, no hash exchange") {
    val p = plan("text_quality_classifier")
    assert(!p.contains("Join"), "classifier must not join")
    assert(!p.contains("HashAggregate"), "classifier must not aggregate")
    assert(!p.contains("Exchange hashpartitioning"),
      s"classifier must be shuffle-free (output sort aside)\n${p.take(600)}")
  }

  test("events_retention: one user_id exchange feeds the cohort window; no join") {
    val p = plan("events_retention")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      s"cohort must ride the single user_id exchange\n${p.take(600)}")
    assert(p.contains("Window"), "first-week must be a window min, not a join")
    assert(!p.contains("Join"), "no join anywhere — the window subsumes it")
  }

  test("text_unigram_logprob: vocabulary logprob table broadcast onto the token stream") {
    val p = plan("text_unigram_logprob")
    assert(p.contains("BroadcastHashJoin"),
      s"term scoring must broadcast the vocab table, not shuffle the corpus\n${p.take(600)}")
  }

  test("mix_upsample: weight table broadcast; corpus never shuffles before explode") {
    val p = plan("mix_upsample")
    assert(p.contains("BroadcastHashJoin"), "weight join must broadcast")
    assert(p.contains("Generate explode"), "copies must come from a generator, not a join")
    // final orderBy is the only exchange: no hashpartitioning of the corpus
    assert(!p.contains("Exchange hashpartitioning"),
      s"corpus must not hash-shuffle\n${p.take(600)}")
  }

  test("cdc_time_travel: scalar cutoff broadcast (hinted); LWW rank pruned map-side") {
    val p = plan("cdc_time_travel")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"as-of cutoff must reach the log as a broadcast scalar, not a shuffle\n${p.take(600)}")
    assert(p.contains("WindowGroupLimit"), "LWW rank must prune below the key exchange")
  }

  test("market_basket_pairs: ONE fact scan (basket form, not self-join); top-k is TakeOrdered") {
    val p = plan("market_basket_pairs")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"basket form scans lineitem once; found $scans scans")
    assert(p.contains("TakeOrderedAndProject"), "thresholded top-100 fell back to a global sort")
  }

  test("text_inverted_index: both cap windows prune map-side (two-phase skew discipline)") {
    val p = plan("text_inverted_index")
    val n = "WindowGroupLimit".r.findAllIn(p).size
    // two cap windows × (partial below exchange + final above) = 4 nodes
    assert(n >= 4, s"expected >=4 WindowGroupLimit nodes, found $n\n${p.take(600)}")
    // df join deliberately UNHINTED (heaps-law vocabulary): with auto
    // broadcast disabled it must degrade to a keyed join, not a forced
    // driver broadcast — both sides already term-keyed aggregates
    assert(!p.contains("BroadcastExchange"),
      s"df join must stay planner-chosen, no forced broadcast\n${p.take(600)}")
  }

  test("corpus_snapshot_diff: only (doc_id, 32-char hash) cross the exchanges, never text") {
    // Exchange payload columns aren't in the plan STRING, so this pin
    // inspects the tree (AQE off so the exchanges are collectible)
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = graft.SparkEntry.queries("corpus_snapshot_diff")(spark, sf0001)
        .queryExecution.executedPlan
      val exchanges = p.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "expected shuffle exchanges in the diff plan")
      exchanges.foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"document text crossed an exchange: ${e.output.map(_.name)}")
      }
      assert(p.toString.contains("SortMergeJoin") && p.toString.contains("FullOuter"),
        "diff must be one full-outer keyed join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("text_pii_redact: stateless projection — regex scan+replace fused, no join, no aggregate") {
    val p = plan("text_pii_redact")
    assert(!p.contains("Join"), "pii scrub must not join")
    assert(!p.contains("HashAggregate"), "pii scrub must not aggregate")
    // the only exchange is the presentation sort's range partitioning
    assert(!p.contains("hashpartitioning"),
      "pii scrub must not hash-shuffle the corpus")
  }

  test("split_leakage_safe: narrow columns only — text never crosses an exchange") {
    val exec = graft.SparkEntry.queries("split_leakage_safe")(spark, sf0001)
      .queryExecution.executedPlan
    val exchanges = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name == "text"),
        s"document text crossed an exchange: ${e.output.map(_.name)}")
    }
    assert(!exec.toString.contains("CartesianProduct"))
  }

  test("dedup_snapshot_neardup: equi-joins only, no cartesian, text stays out of exchanges") {
    val exec = graft.SparkEntry.queries("dedup_snapshot_neardup")(spark, sf0001)
      .queryExecution.executedPlan
    val s = exec.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      "band/verify joins degenerated to a product")
    val exchanges = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name == "text"),
        s"raw text crossed an exchange: ${e.output.map(_.name)}")
    }
  }
  test("dedup_normalized: one hash aggregation on the digest; raw text never shuffles") {
    val p = plan("dedup_normalized")
    assert(p.contains("HashAggregate"), "normalization must feed a hash aggregation")
    val df = graft.SparkEntry.queries("dedup_normalized")(spark, sf0001)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name == "text"),
        s"raw text crossed an exchange: ${e.output.map(_.name)}")
    }
  }

  test("corpus_interleave: source index broadcast onto the ranked corpus") {
    val p = plan("corpus_interleave")
    assert(p.contains("BroadcastHashJoin"), "source-index join must broadcast")
    assert(p.contains("Window"), "per-source rank must be a window, not a global sort")
  }

  test("keyword extract: idf table broadcast, per-doc top-3 pruned map-side") {
    val p = plan("text_keyword_extract")
    assert(p.contains("BroadcastHashJoin"), "idf join must broadcast the vocab table")
    assert(p.contains("WindowGroupLimit"), "doc top-3 must prune below the exchange")
  }

  test("ood filter: centroids broadcast; the embedding corpus joins without shuffling") {
    val p = plan("vector_ood_filter")
    assert(p.contains("BroadcastHashJoin"), "centroid join must broadcast")
    val df = graft.SparkEntry.queries("vector_ood_filter")(spark, sf0001)
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // centroid partial-agg exchange (tiny, label-keyed) + the output
    // range sort: the corpus-sized scoring path itself must not add one
    assert(shuffles.size <= 2, s"unexpected exchanges: ${shuffles.size}")
  }

  test("mix_epochs: epoch-threshold table broadcast; the corpus never shuffles") {
    val p = plan("mix_epochs")
    assert(p.contains("BroadcastHashJoin"), "threshold join must broadcast")
    val df = graft.SparkEntry.queries("mix_epochs")(spark, sf0001)
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // per-source count partial agg (tiny) + the output range sort only
    assert(shuffles.size <= 2, s"unexpected exchanges: ${shuffles.size}")
  }

  test("events_k_anonymity: two plain hash aggs — no distinct Expand in the plan") {
    val p = plan("events_k_anonymity")
    assert(!p.contains("Expand"), "count_distinct Expand crept back in")
    val n = "HashAggregate".r.findAllIn(p).size
    assert(n >= 4, s"expected two partial+final agg pairs, saw $n HashAggregate nodes")
  }

  test("corpus_zorder: lang index broadcast; interleave is a stateless projection") {
    val p = plan("corpus_zorder")
    assert(p.contains("BroadcastHashJoin"), "lang-index join must broadcast")
  }

  test("events_heavy_hitters: per-type totals broadcast back onto the per-user agg") {
    val p = plan("events_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), "totals join must broadcast")
    assert(!p.contains("Expand"), "the exact plan must not pay a distinct Expand")
  }

  test("vector_pq_adc: serve side is codes x broadcast LUT — no join over embeddings") {
    val p = plan("vector_pq_adc")
    // the only join touching the corpus codes at serve time is the
    // broadcast nested-loop against the 8-row LUT frame
    assert(p.contains("BroadcastNestedLoopJoin"), "LUT side must broadcast")
    // scoring must be integer LUT adds, not float dot products: the
    // serve projection carries no zip_with over embedding vectors
    val serve = p.substring(0, p.indexOf("BroadcastNestedLoopJoin"))
    assert(!serve.contains("zip_with"), "float vectors leaked into the serve path")
  }

  test("vector_ann_ivfpq: probes and LUTs broadcast onto the codes table; no cartesian") {
    val p = plan("vector_ann_ivfpq")
    assert(p.contains("BroadcastHashJoin"), "probe/LUT joins must broadcast")
    assert(!p.contains("CartesianProduct"), "serve path grew a cartesian product")
  }

  test("corpus_stats_profile: one scan feeds all five distinct aggregates via Expand") {
    val p = plan("corpus_stats_profile")
    assert(p.contains("Expand"), "multi-distinct should share one scan through Expand")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"profile must read the table once, saw $scans scans")
  }

  test("dq_referential: one lineitem scan, dimension FKs broadcast") {
    val p = plan("dq_referential")
    // the fused form reads the fact table ONCE for all three FK checks
    val liScans = "Scan parquet".r.findAllIn(p).size
    assert(liScans == 6, s"expected 6 scans (li, part, supp, ord x2, cust), saw $liScans")
    // part + supplier + customer ride broadcast left joins
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"dimension FK joins must broadcast, saw $bhj")
  }

  test("dq_constraints: row-local audit is one scan; uniqueness carries no Expand") {
    val p = plan("dq_constraints")
    assert(!p.contains("Expand"), "uniqueness must be the two-level agg, not a distinct Expand")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 2, s"one scan for row-local + one for uniqueness, saw $scans")
  }

  test("events_attribution: join-free — one window exchange, no join operator") {
    val p = plan("events_attribution")
    assert(!p.contains("Join"), "attribution must not plan a join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    // one user_id exchange for the window + one for the channel agg
    assert(exchanges <= 2, s"attribution grew extra shuffles: $exchanges")
  }

  test("vector_knn_graph: top-3 window reuses the cell partitioning side-by-side") {
    val p = plan("vector_knn_graph")
    assert(!p.contains("CartesianProduct"), "pair generation must stay within cells")
    // mutuality is a semi-join over the tiny top-k edge set
    assert(p.contains("LeftSemi"), "mutual filter should plan as a semi join")
  }

  test("vector_coreset: per-cell top-2 gets map-side WindowGroupLimit pruning") {
    val p = plan("vector_coreset")
    assert(p.contains("WindowGroupLimit"),
      "the rn <= 2 filter should prune map-side, not post-window")
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_crossmodal: no cartesian product anywhere in the merged-edge plan") {
    val p = plan("dedup_crossmodal")
    assert(!p.contains("CartesianProduct"),
      "both modality edge generators must stay banded/cell-keyed")
  }

  test("events_rfm_2phase: bin tables broadcast back; no user-frame global window") {
    val p = plan("events_rfm_2phase")
    val bcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bcasts >= 3, s"three histogram bin tables must broadcast, saw $bcasts")
    // the only windows run over DISTINCT-VALUE histograms; NTILE over
    // the per-user frame (the twin's scale-killer) must not appear
    assert(!p.contains("ntile"), "NTILE crept back into the production form")
  }

  test("multi-touch attribution: user-keyed join (no cartesian); both windows share one exchange") {
    for (q <- Seq("events_attribution_position", "events_attribution_timedecay")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q: the touch-window predicate must ride the user_id equi-join")
      assert("""SortMergeJoin \[user_id""".r.findFirstIn(p).isDefined,
        s"$q: the touch join must keep user_id as its equi key")
      // (user_id, p_id) clustering is satisfied by the join's user_id
      // hash partitioning — the rank/count/weight windows must NOT
      // re-shuffle on the refined key
      assert("""hashpartitioning\(user_id#\d+L?, p_id""".r.findAllIn(p).isEmpty,
        s"$q: windows re-shuffled on (user_id, p_id) instead of reusing the join exchange")
    }
  }

  test("text_vocab_coverage: rank window runs over a TakeOrdered prefix, not the vocab") {
    val p = plan("text_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-max(k) prefix must be TakeOrdered, not a global sort of the vocabulary")
  }

  test("sample_weighted: keys map-side, top-200 is TakeOrdered, no shuffle grows with the corpus") {
    val p = plan("sample_weighted")
    assert(p.contains("TakeOrderedAndProject"), "the draw must not global-sort the corpus")
    assert(!"""Exchange hashpartitioning""".r.findFirstIn(p).isDefined,
      "a weighted draw is a stateless projection + heap merge — no hash exchange")
  }

  test("text_zipf_fit: regression runs over a TakeOrdered head with map-side moments") {
    val p = plan("text_zipf_fit")
    assert(p.contains("TakeOrderedAndProject"), "the top-1000 head must be TakeOrdered")
    assert(p.contains("partial_sum"), "regression moments must partial-aggregate map-side")
  }

  test("vector_ivf_retrain: codebooks broadcast to both scans, argmin folds map-side") {
    val p = plan("vector_ivf_retrain")
    // the initial assignment AND the retrained re-assignment each scan
    // a BROADCAST codebook — the corpus never shuffles for scoring
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2,
      "both codebook scans must be broadcast scans")
    assert(p.contains("partial_min"),
      "argmin(score, cell) must partial-aggregate so <=1 row/vector crosses the shuffle")
  }

  test("pack_ffd: one lang window, per-stream fold is MapGroups, merges broadcast") {
    val p = plan("pack_ffd")
    assert("\\bWindow\\b".r.findAllIn(p).size == 1,
      "exactly the contiguous layout's one lang-keyed window")
    assert(p.contains("MapGroups"), "the FFD fold is the per-stream group walk")
    assert(p.contains("BroadcastHashJoin"),
      "the per-lang result merges are lang-sized — must broadcast")
  }

  test("pack_ffd_layout: assignment via MapGroups, oversized tail window only over big docs") {
    val p = plan("pack_ffd_layout")
    assert(p.contains("MapGroups"), "the assignment fold is the per-stream group walk")
    assert(p.contains("BroadcastHashJoin"),
      "the bins_small base offsets are lang-sized — must broadcast back")
  }

  test("events_cohort_ltv: cumulative window is cohort-keyed, sizes broadcast") {
    val p = plan("events_cohort_ltv")
    assert(p.contains("windowspecdefinition(cohort_day"),
      s"the LTV window must partition by cohort, never a global frame: ${p.take(400)}")
    assert(p.contains("BroadcastHashJoin"),
      "the cohort-size join is day-sized — must broadcast")
  }

  test("cdc_schema_evolution: per-field max_by partials combine map-side") {
    val p = plan("cdc_schema_evolution")
    assert(p.contains("partial_max_by"),
      "union-schema fold must partial-aggregate — one folded row per user crosses")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "one keyed agg, no join anywhere")
  }

  test("cdc_payload_embedding: hash-aggregated micro sums, no sort-based fallback") {
    val p = plan("cdc_payload_embedding")
    assert(p.contains("HashAggregate"),
      "the per-lang report must hash-aggregate with map-side partials")
    assert(!p.contains("SortAggregate"),
      "micro-round-before-sum exists precisely so the aggregate stays " +
        "hash-based (a sort-based fallback would also inline the " +
        s"serialize/parse into the sorter): ${p.take(400)}")
    assert(!p.contains("CartesianProduct"),
      "documents-embeddings is a keyed equi-join")
  }

  test("corpus_budget_update_lww: cap prunes map-side, LWW partial-aggregates, no join") {
    val p = plan("corpus_budget_update_lww")
    assert(p.contains("WindowGroupLimit"),
      "the per-source cap's row_number <= 10 must compile to the " +
        "group-limit rewrite — a hub source must never materialize " +
        "more than 10 rows per side of its exchange")
    assert(p.contains("partial_max_by") || p.contains("Partial"),
      "the LWW collapse must partial-aggregate before its doc_id exchange")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastHashJoin"),
      "LWW -> cap -> budget is union + aggregates + windows — no join anywhere")
  }

}
