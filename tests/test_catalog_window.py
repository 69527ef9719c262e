"""The driver's correctness gate checks roughly the FIRST 50 registry
entries, so the _PRIORITY ordering is a per-round contract (VERDICT
item 2 every round).  Pin the round-15 window so a refactor or a
mid-round gate insertion can never silently reorder it."""

from dataclass_array_spark.workload.catalog import QUERIES

_R15_WINDOW = [
    # 7 never-driver-verified round-14 gates (VERDICT r14 item 2 order)
    "classifier_train_docs", "pack_ffd_docs", "streaming_kn_score_docs",
    "classifier_auc_docs", "classifier_pr_docs", "ann_recall_ivf_docs",
    "classifier_calibration_docs",
    # remaining 31 r11-cohort queries (stalest block), catalog order
    "linkage_entity_clusters", "linkage_part_entities",
    "multimodal_decode", "multimodal_metadata", "nucleus_select_docs",
    "ols_price_vs_quantity", "outlier_mad_quantity",
    "pack_context_windows", "pagerank_event_hotspots",
    "pipeline_quality_corpus", "scd2_customer_history",
    "simhash_fingerprints", "split_train_val_test",
    "stratified_sample_docs", "streaming_incremental_dedup",
    "text_stats", "tfidf_top_terms", "triangle_counts_events",
    "vocab_top_words", "weighted_sample_docs", "winsorize_price_stats",
    "hilbert3d_orders_layout", "bigram_lm_docs",
    "bigram_lm_heldout_docs", "countmin_token_freq",
    "streaming_countmin_tokens", "hll_distinct_users",
    "token_entropy_docs", "bloom_filter_orders", "ols2_price_model",
    "streaming_hll_users",
    # first 12 r12-cohort entries
    "dedup_keep_best_docs", "embedding_ann_sq8",
    "hist_quantiles_prices", "hll_overlap_users",
    "streaming_bloom_orders", "streaming_hist_prices",
    "gap_fill_events", "embedding_kmeans_clusters",
    "embedding_kmeans_two_level", "semantic_dedup_auto",
    "semantic_dedup_embeddings", "text_cluster_topics",
]


def test_round15_driver_window_is_pinned():
    assert list(QUERIES)[:50] == _R15_WINDOW


def test_new_round15_gates_sit_after_the_window():
    """Gates added during round 15 must be queued in the never-verified
    cohort right after the window, never inside it."""
    names = list(QUERIES)
    n_new = len(names) - 188
    for g in names[50:50 + n_new]:
        # every post-window pre-r12 entry must be a round-15 addition
        assert g not in _R15_WINDOW
    # the remaining r12 cohort follows the round-15 block
    assert names[50 + n_new] == "embedding_ann_ivf_kmeans"


def test_every_query_has_full_oracle():
    """Full-oracle discipline: no rows-only checks anywhere."""
    assert len(QUERIES) >= 188
    missing = [k for k, q in QUERIES.items() if not q.oracle]
    assert missing == [], missing
