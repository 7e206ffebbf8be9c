package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2): the
  * reference's CDC surface as batch analogs, the relational coverage
  * checklist, and the LLM-data-pipeline extension operators. Every
  * SQL-expressible query carries a DuckDB oracle in `oracleSql` — 181 of
  * 183, including simhash (md5-based signature reproduced in SQL), LSH
  * ANN (literal hyperplanes), the multimodal decode/resize paths and
  * the substring-granularity dedup; only the two inherently
  * engine-specific ops (q23's HLL++ sketch state, IVF KMeans cells) are
  * rows-only here, each strictly pinned by ScalaTest — and both
  * families also carry fully-oracled deterministic members
  * (hll_distinct, vector_ann_ivf_flat).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the CDC quorum-dedup batch analog — the reference's essence
    * (filter → keyed quorum → emit-once) in one plan. */
  def entry(spark: SparkSession): DataFrame =
    operators.CdcBatch.quorumBatch.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap

  /** headline subset for the benchmark: at least one query per operator
    * family — relational, window, interval join, CDC analogs, every
    * dedup variant, vector exact + bucketed ANN, text analysis, sketch,
    * pipeline stats, multimodal — weighted toward the scale-critical
    * ones (including the two most expensive catalog queries,
    * ngram-jaccard and interval join), so a perf regression in any
    * family shows up in the round-over-round bench diff. */
  def benchQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_revenue", "q5_region_revenue",
    "q8_window_rank", "q24_interval_join", "cdc_quorum_batch",
    "cdc_offsets", "cdc_apply_state", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_clusters", "dedup_contamination", "vector_topk", "vector_filtered_topk",
    "vector_ann_ivf_flat", "hll_distinct", "text_tokens",
    "text_fingerprint", "text_bm25", "text_bigrams", "events_funnel",
    "token_percentiles", "multimodal_meta", "curation_e2e",
    "pack_sequences", "pack_sequences_sharded", "mix_sample",
    "cdc_pseudonymize", "doc_chunks",
    // round 6: the O(log d) CC form benched alongside the propagation
    // walker (judge ask), the two production skew variants, and the
    // five new operators
    "dedup_clusters_star", "doc_source_cap_2phase", "sample_stratified_threshold",
    "cdc_scd2", "cdc_payload_redact", "dedup_survivors",
    "quality_filter_reasons", "mix_temperature", "dedup_embedding_lsh",
    "q28_session_window", "token_percentiles_binned", "q29_unpivot", "multimodal_resize",
    "dedup_substring", "dedup_substring_clean",
    // round 6 late adds: SemDeDup-style semantic dedup on the IVF
    // codebook, boilerplate-chunk detection, time-RANGE window frame
    "dedup_semantic", "dedup_boilerplate", "q30_range_frame",
    // round 6: incremental-ingest dedup (exact + bloom-prefiltered —
    // benched as a pair so the sketch's shuffle savings are measured)
    // and epoch-weighted upsampling
    "dedup_incremental", "dedup_incremental_bloom", "mix_upsample",
    // round 6: incremental near-dup vs history, BM25 retrieval top-k
    "dedup_incremental_minhash", "text_search_topk",
    // round 6: RAG retrieval composition, linear quality gate,
    // deterministic corpus shuffle
    "vector_rag_retrieve", "text_quality_classifier", "corpus_shuffle",
    // round 6: cohort retention, unigram-LM quality scoring
    "events_retention", "text_unigram_logprob",
    // round 6: point-in-time replay, basket co-occurrence mining,
    // capped-postings index build, snapshot versioning diff
    "cdc_time_travel", "market_basket_pairs", "text_inverted_index",
    "corpus_snapshot_diff",
    // round 6: asymmetric containment (prefix-vs-full-index join) and
    // edit-distance verify (order-aware fuzzy-dedup cascade)
    "dedup_containment", "dedup_editdist",
    // round 6: target-mix rebalancing and the dedup savings report
    "mix_to_target", "dedup_cluster_stats",
    // round 8: cross-snapshot near-dup diff (band index × version diff),
    // leakage-safe cluster-addressed split, PII detect+redact scrub,
    // sqrt-weighted soft-dedup mix, event-log behavior sequences
    "dedup_snapshot_neardup", "split_leakage_safe", "text_pii_redact",
    "mix_dedup_weighted", "events_sequences",
    // round 8: behavior-LM transition matrix, per-lang token-budget selection
    "events_markov", "corpus_token_budget",
    // round 8: perceptual image hash (decode→resize→dHash, image-dedup input)
    // and contrastive negative sampling (neighbor-excluded hash draw)
    "multimodal_phash", "vector_negatives",
    // round 8: the histogram-cut production form of the budget selection,
    // benched beside the global-window form so the premium is measured
    "corpus_token_budget_2phase",
    // round 9: the once-per-corpus-version labeling job, benched with
    // force-rematerialization so its time IS the star-CC + bucketed
    // write cost; the four label consumers above (dedup_survivors,
    // dedup_cluster_stats, split_leakage_safe, mix_dedup_weighted) now
    // read the persisted table, so their entries show what a pipeline
    // pays AFTER materialization
    "dedup_labels",
    // round 9: image near-dup end to end (decode → 24-bit dHash →
    // hamming-band candidates → star-CC clusters)
    "dedup_image_phash",
    // round 9: normalization-aware exact dedup, source-interleaved
    // training order, per-doc TF-IDF keywords, embedding-space OOD gate
    "dedup_normalized", "corpus_interleave", "text_keyword_extract",
    "vector_ood_filter",
    // round 9: vocabulary-coverage curve, annealed epoch mixture schedule
    "text_vocab_coverage", "mix_epochs",
    // round 9: incremental label refresh — re-label only the components
    // the snapshot diff touches, carry every other label over verbatim
    "dedup_labels_incremental",
    // round 9: corpus-drift monitor (unigram JSD between snapshot
    // versions) and RFM behavioral segmentation
    "text_jsd_drift", "events_rfm",
    // round 9: the audio modality — PCM byte-decode kernel + features
    "multimodal_audio_features",
    // round 9: the dedup-centric curation flagship — survivors →
    // token budget → interleaved training order in one plan
    "corpus_curate_order",
    // round 9 (late): privacy gate, z-order layout key, BPE merge
    // table, and PQ/ADC vector serving
    "events_k_anonymity", "corpus_zorder", "text_bpe_merges",
    "vector_pq_adc",
    // round 9 (late): frequent items, langid eval, ANALYZE stats, and
    // the composed production ANN index
    "events_heavy_hitters", "text_langid_confusion", "corpus_stats_profile",
    "vector_ann_ivfpq", "dedup_audio_fp",
    // round 9 (late): data-quality gates (fused FK audit, one-scan
    // constraint audit), last-touch attribution, mutual kNN graph
    "dq_referential", "dq_constraints", "events_attribution",
    "vector_knn_graph",
    // round 9 (late): cross-modal duplicate consolidation — its cost is
    // ~additive over the text (minhash) and image (phash) pipelines it
    // unions, plus one star-CC over the merged edge set
    "dedup_crossmodal",
    // round 9 (late): exact-integer PageRank over the mutual kNN graph
    // and the per-cell coreset selection it feeds
    "vector_pagerank", "vector_coreset",
    // round 9 (late): ANN quality evaluation as a catalog operator
    // and the MMR diversity re-rank on the serving side
    "vector_recall_eval", "vector_mmr_rerank",
    // round 9 (late): experimentation analytics — content-addressed A/B
    // assignment with an engine-mirrored two-proportion z-test
    "events_ab_test",
    // round 9 (late): time-series resampling with gap fill
    "events_resample",
    // round 10: the histogram-cut RFM production form benched beside
    // the NTILE twin so the two-phase premium is measured
    "events_rfm_2phase",
    // round 10: multi-touch attribution (U-shaped position credit and
    // integer time-decay) over the shared touch-window join
    "events_attribution_position", "events_attribution_timedecay",
    // round 10: snapshot volume-drift DQ gate and PMI collocations
    "dq_volume_drift", "text_pmi_collocations",
    // round 10: content-addressed weighted sampling and the Zipf fit
    "sample_weighted", "text_zipf_fit",
    // round 10: the dedup threshold planning curve (one candidate pass,
    // three integer-exact threshold points)
    "dedup_threshold_curve",
    // round 10: matryoshka prefix-dimension retrieval eval
    "vector_matryoshka_eval",
    // round 10: replica-lag observability and embedding centroid drift
    "cdc_lag", "vector_centroid_drift",
    // round 10: the IVF cell-balance monitor and packing efficiency
    "vector_cell_profile", "pack_efficiency",
    // round 10: exact DAU/WAU engagement curves + the HLL WAU twin
    "events_active_users", "events_active_users_hll",
    // round 11: the deterministic Lloyd-round centroid retrain, the
    // first-fit-decreasing packing twin, and the union-schema CDC apply
    "vector_ivf_retrain", "vector_ann_ivf_retrained", "pack_ffd", "pack_ffd_layout", "cdc_schema_evolution",
    "events_cohort_ltv", "vector_pq_retrain",
    // round 12: the retrain decision gate (breach AND recall-retained),
    // the k-round Lloyd iteration, and the streaming cohort-LTV twin's
    // batch anchor is events_cohort_ltv above
    "vector_retrain_gate", "vector_ivf_retrain_k",
    // round 14: the admitted-restricted MMR (batch twin of the
    // chain-restricted serves) and the vector payload round-trip
    // (the serve-from-chain carriage discipline, oracled)
    "vector_mmr_admitted", "cdc_payload_embedding",
    // round 15: update-aware cap/budget accounting (LWW → cap → budget
    // — an updated doc consumes cap and budget once, newest version)
    "corpus_budget_update_lww",
    // round 16: update-aware near-dup (LWW collapse → MinHash LSH —
    // a pair whose member was updated away disappears; the batch twin
    // of the streaming gate's claim-retirement form)
    "dedup_minhash_lsh_lww"
  )
}
