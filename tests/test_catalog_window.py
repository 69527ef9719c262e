"""The driver's correctness gate checks roughly the FIRST 50 registry
entries, so the _PRIORITY ordering is a per-round contract (VERDICT
item every round).  Pin the round-16 window so a refactor or a
mid-round gate insertion can never silently reorder it."""

from dataclass_array_spark.workload.catalog import QUERIES

_R16_WINDOW = [
    # 15 round-15 optimizer-touched gates the r15 driver window missed
    # (VERDICT r15 item 1 order): BPE family, KN/KN3 scorers,
    # pmi/ccnet/dsir, dedup_components/incremental, auc_by_source.
    "bpe_train_docs", "bpe_train_batched_docs", "bpe_encode_docs",
    "bpe_heldout_encode_docs", "bpe_fertility_langs",
    "kneser_ney3_lm_docs", "kneser_ney3_heldout_docs",
    "kneser_ney_heldout_docs", "kn_perplexity_docs",
    "pmi_collocations_docs", "ccnet_buckets_docs", "dsir_weights_docs",
    "dedup_components", "dedup_incremental_docs",
    "classifier_auc_by_source_docs",
    # remaining 6 never-driver-verified round-15 gates
    "classifier_ece_docs", "classifier_ece_by_source_docs",
    "classifier_brier_docs", "classifier_ks_docs",
    "classifier_f1_best_docs", "classifier_brier_by_source_docs",
    # first 29 of the remaining 38 r12-cohort entries, catalog order
    "embedding_ann_ivf_kmeans", "embedding_knn_join_kmeans",
    "dedup_ngram_jaccard", "shape_vectorize_mat",
    "streaming_purchase_clicks", "streaming_quality_filter",
    "streaming_tumbling_hourly", "streaming_session_windows",
    "streaming_dedup_events", "streaming_user_totals_stateful",
    "streaming_sliding_hourly", "streaming_decontam_docs",
    "domain_mixture_sample", "multimodal_frames",
    "pipeline_pretrain_corpus", "tokenize_docs", "token_rarity_docs",
    "lm_quality_docs", "shape_mask_filter", "shape_gather",
    "shape_transpose", "shape_slice", "shape_concat_mapfield",
    "median_quantity_by_flag", "approx_sketches",
    "q2_min_cost_supplier", "q11_important_parts",
    "q16_supplier_counts", "q20_promotion_suppliers",
]


def test_round16_driver_window_is_pinned():
    assert list(QUERIES)[:50] == _R16_WINDOW


def test_r15_verified_block_sits_after_the_window():
    """The 50 gates the r15 driver window verified are the freshest —
    they queue immediately after the r16 window, never inside it."""
    names = list(QUERIES)
    assert names[50] == "classifier_train_docs"
    assert names[56] == "classifier_calibration_docs"
    for g in names[50:100]:
        assert g not in _R16_WINDOW


def test_every_query_has_full_oracle():
    """Full-oracle discipline: no rows-only checks anywhere."""
    assert len(QUERIES) >= 188
    missing = [k for k, q in QUERIES.items() if not q.oracle]
    assert missing == [], missing
