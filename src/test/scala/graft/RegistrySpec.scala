package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-18 registry split (VERDICT r17 #6): SparkEntry's two maps
  * are now composed from per-family parts, and `++` would SILENTLY let a
  * later part shadow an earlier one's key — so this spec (a) asserts the
  * parts are pairwise key-disjoint, and (b) pins the composed key sets to
  * the known surface (207 queries / 203 oracles — the 204/200 pre-split
  * sets plus round 18's semantic_dedup_cells, edit_join_wide, blocklist_gate), so the split provably
  * changed nothing and future additions are a conscious edit of the
  * pinned lists. */
class RegistrySpec extends AnyFunSuite {

  private val expectedQueries: Set[String] = Set(
    "acf_daily", "ann_filtered", "ann_hamming", "ann_index_stale", "ann_ivf",
    "ann_ivf_fixed", "ann_ivfpq", "ann_ivfpq_fixed", "ann_ivfpq_res",
    "ann_lsh", "ann_pq", "ann_pq_fixed", "ann_recall", "ann_topk",
    "anomaly_mad", "anomaly_zscore", "approx_stats", "asof_last_error",
    "audit_tail", "benford_digits", "benford_stat", "blocklist_gate", "bloom_decontam",
    "bm25_topk", "boilerplate_scrub", "bootstrap_ci", "bpe_fertility",
    "bpe_segment", "bpe_segment_fixed", "bpe_train", "centroid_outliers",
    "chao1_richness", "chunk_docs", "cms_counts", "coerce_types",
    "cohort_retention", "containment_join", "containment_join_hashed",
    "corpus_diff", "corpus_gate", "corpus_report", "corpus_shuffle",
    "cube_revenue", "cusum_daily", "decontam_ngram", "decontam_substr",
    "decontaminate", "dedup_cdc", "dedup_cluster", "dedup_exact",
    "dedup_keep_best", "dedup_span", "dedup_stats", "dedup_substr",
    "dim_date", "doc_fingerprint", "domain_gate", "dow_profile",
    "dsir_weights", "dual_format_dispatch", "edit_join", "edit_join_wide", "embedding_cov",
    "embedding_cov_hd", "embedding_jl", "embedding_matryoshka",
    "embedding_norms", "embedding_pca", "embedding_quantize", "entropy_rate",
    "error_audit", "event_pagerank", "event_route", "event_transitions",
    "ewma_daily", "f2_by_source", "f2_sketch", "fragment_pairs",
    "frame_sample", "funnel_steps", "gap_fill", "gate_agreement",
    "heaps_law", "heavy_hitters", "hll_by_source", "hll_estimate",
    "hll_registers", "hll_set_ops", "hybrid_rrf", "ingest_discovery",
    "jackknife_mean", "join_size_est", "js_divergence", "ks_binned",
    "ks_binned_by_source", "ks_by_source", "ks_drift", "label_centroids",
    "lang_id", "len_histogram", "ljung_box", "lm_bigram", "lm_kn_trigram",
    "lm_kneser_ney", "lm_score", "lm_stupid_backoff", "mann_whitney",
    "margin_mine", "merged_union", "mix_epochs", "mix_waterfill",
    "mix_weights", "mmr_topk", "mojibake_gate", "monitor_feed", "moving_avg",
    "multimodal_meta", "neardup_embedding", "neardup_minhash",
    "neardup_simhash", "ngram_jaccard", "ngram_novelty", "normalize_strings",
    "parse_timestamps", "pctl_prices", "per_source_agg", "pii_luhn",
    "pii_scrub", "pipeline_report", "pipeline_stats", "pit_fact",
    "pivot_status", "pmi_collocations", "ppl_buckets", "profile_columns",
    "psi_by_source", "psi_drift", "quality_catalog", "quality_classify",
    "quality_clean", "quality_deciles", "quality_errors",
    "quality_length_corr", "quantile_sketch", "quantile_sketch_by",
    "range_join", "recon_fuzzy", "recon_inner", "recon_only_left",
    "recon_only_right", "rep_filter", "rollup_revenue", "runs_test",
    "salted_agg", "salted_join", "sample_priority", "sample_priority_strat",
    "sample_stratified", "sample_weighted", "scd2_dim", "scd2_merge",
    "schema_drift", "script_profile", "self_bleu", "semantic_dedup", "semantic_dedup_cells",
    "seq_pack", "sessionize", "setsim_join", "setsim_join_hashed",
    "shard_assign", "skew_profile", "source_cap", "source_overlap",
    "source_overlap_hashed", "source_overlap_sketch", "source_token_mi",
    "split_assign", "staged_read", "star_fact", "star_full",
    "star_inventory_fact", "star_orders_fact", "star_rollup", "text_quality",
    "tfidf_top", "token_burstiness", "token_count", "token_entropy",
    "topn_agg", "topn_per_group", "unicode_norm", "unigram_segment",
    "upsert_latest", "vocab_gini", "vocab_top", "window_agg",
    "winnow_fingerprint", "winnow_overlap", "winsorize_prices",
    "wordpiece_segment", "yule_k", "zipf_by_source", "zipf_fit",
    "zipf_theil_sen", "zone_preview", "zorder_cluster")

  private val expectedOracles: Set[String] = Set(
    "acf_daily", "ann_filtered", "ann_hamming", "ann_index_stale", "ann_ivf",
    "ann_ivf_fixed", "ann_ivfpq", "ann_ivfpq_fixed", "ann_ivfpq_res",
    "ann_lsh", "ann_pq", "ann_pq_fixed", "ann_recall", "ann_topk",
    "anomaly_mad", "anomaly_zscore", "asof_last_error", "audit_tail",
    "benford_digits", "benford_stat", "blocklist_gate", "bloom_decontam",
    "bm25_topk", "boilerplate_scrub", "bootstrap_ci", "bpe_fertility",
    "bpe_segment_fixed", "centroid_outliers", "chao1_richness", "chunk_docs",
    "cms_counts", "coerce_types", "cohort_retention", "containment_join",
    "containment_join_hashed", "corpus_diff", "corpus_gate", "corpus_report",
    "corpus_shuffle", "cube_revenue", "cusum_daily", "decontam_ngram",
    "decontam_substr", "decontaminate", "dedup_cdc", "dedup_cluster",
    "dedup_exact", "dedup_keep_best", "dedup_span", "dedup_stats",
    "dedup_substr", "dim_date", "doc_fingerprint", "domain_gate",
    "dow_profile", "dsir_weights", "dual_format_dispatch", "edit_join", "edit_join_wide",
    "embedding_cov", "embedding_cov_hd", "embedding_jl",
    "embedding_matryoshka", "embedding_norms", "embedding_pca",
    "embedding_quantize", "entropy_rate", "error_audit", "event_pagerank",
    "event_route", "event_transitions", "ewma_daily", "f2_by_source",
    "f2_sketch", "fragment_pairs", "frame_sample", "funnel_steps",
    "gap_fill", "gate_agreement", "heaps_law", "heavy_hitters",
    "hll_by_source", "hll_estimate", "hll_registers", "hll_set_ops",
    "hybrid_rrf", "jackknife_mean", "join_size_est", "js_divergence",
    "ks_binned", "ks_binned_by_source", "ks_by_source", "ks_drift",
    "label_centroids", "lang_id", "len_histogram", "ljung_box", "lm_bigram",
    "lm_kn_trigram", "lm_kneser_ney", "lm_score", "lm_stupid_backoff",
    "mann_whitney", "margin_mine", "merged_union", "mix_epochs",
    "mix_waterfill", "mix_weights", "mmr_topk", "mojibake_gate",
    "monitor_feed", "moving_avg", "multimodal_meta", "neardup_embedding",
    "neardup_minhash", "neardup_simhash", "ngram_jaccard", "ngram_novelty",
    "normalize_strings", "parse_timestamps", "pctl_prices", "per_source_agg",
    "pii_luhn", "pii_scrub", "pipeline_report", "pipeline_stats", "pit_fact",
    "pivot_status", "pmi_collocations", "ppl_buckets", "profile_columns",
    "psi_by_source", "psi_drift", "quality_catalog", "quality_classify",
    "quality_clean", "quality_deciles", "quality_errors",
    "quality_length_corr", "quantile_sketch", "quantile_sketch_by",
    "range_join", "recon_fuzzy", "recon_inner", "recon_only_left",
    "recon_only_right", "rep_filter", "rollup_revenue", "runs_test",
    "salted_agg", "salted_join", "sample_priority", "sample_priority_strat",
    "sample_stratified", "sample_weighted", "scd2_dim", "scd2_merge",
    "schema_drift", "script_profile", "self_bleu", "semantic_dedup", "semantic_dedup_cells",
    "seq_pack", "sessionize", "setsim_join", "setsim_join_hashed",
    "shard_assign", "skew_profile", "source_cap", "source_overlap",
    "source_overlap_hashed", "source_overlap_sketch", "source_token_mi",
    "split_assign", "staged_read", "star_fact", "star_full",
    "star_inventory_fact", "star_orders_fact", "star_rollup", "text_quality",
    "tfidf_top", "token_burstiness", "token_count", "token_entropy",
    "topn_agg", "topn_per_group", "unicode_norm", "unigram_segment",
    "upsert_latest", "vocab_gini", "vocab_top", "window_agg",
    "winnow_fingerprint", "winnow_overlap", "winsorize_prices",
    "wordpiece_segment", "yule_k", "zipf_by_source", "zipf_fit",
    "zipf_theil_sen", "zone_preview", "zorder_cluster")

  test("registry parts are pairwise key-disjoint (no silent ++ shadowing)") {
    val qParts = Seq("QueriesDwh" -> QueriesDwh.entries.keySet,
      "QueriesDedupAnn" -> QueriesDedupAnn.entries.keySet,
      "QueriesTextLm" -> QueriesTextLm.entries.keySet)
    val oParts = Seq("OraclesDwh" -> OraclesDwh.entries.keySet,
      "OraclesDedupLm" -> OraclesDedupLm.entries.keySet,
      "OraclesTextMix" -> OraclesTextMix.entries.keySet)
    for { parts <- Seq(qParts, oParts); Seq((an, a), (bn, b)) <- parts.combinations(2) } {
      val overlap = a intersect b
      assert(overlap.isEmpty, s"$an and $bn both define: $overlap")
    }
  }

  test("composed queries map equals the pinned surface (207 keys)") {
    assert(SparkEntry.queries.keySet == expectedQueries)
  }

  test("composed oracle map equals the pinned surface (203 keys)") {
    assert(SparkEntry.oracleSql.keySet == expectedOracles)
  }

  test("every oracle key has a query; rows-only set is exactly the documented four") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ==
      Set("ingest_discovery", "approx_stats", "bpe_train", "bpe_segment"))
  }
}
