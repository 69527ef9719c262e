"""The driver's correctness gate checks roughly the FIRST 50 registry
entries, so the _PRIORITY ordering is a per-round contract (VERDICT
item 1 every round).  Pin the round-13 window so a refactor or a
mid-round gate insertion can never silently reorder it."""

from dataclass_array_spark.workload.catalog import QUERIES

_R13_WINDOW = [
    # 9 never-driver-verified round-12 gates
    "bpe_train_docs", "bpe_encode_docs", "bpe_heldout_encode_docs",
    "url_dedup_docs", "url_domain_stats_docs", "skew_zipf_salted_agg",
    "qdigest_quantiles_prices", "streaming_qdigest_prices",
    "kneser_ney_lm_docs",
    # 6 r9-era stalest
    "ewma_user_values", "hilbert_orders_layout", "repetition_filter_docs",
    "semantic_dedup_two_level", "shape_vectorize", "zorder_orders_layout",
    # 35 r10-era alphabetical from asof_purchase_last_click
    "asof_purchase_last_click", "budget_select_docs",
    "cohort_retention_events", "corr_price_quantity", "cube_nation_segment",
    "date_functions", "dedup_apply_minhash", "dedup_apply_simhash",
    "dedup_components", "dedup_embedding_neardup", "dedup_exact_docs",
    "dedup_incremental_docs", "dedup_minhash_lsh", "dedup_minhash_lsh_auto",
    "dedup_simhash_pairs", "distinct_parts_per_supplier",
    "dq_validate_orders", "embedding_knn_join", "funnel_conversion_events",
    "grouping_sets_revenue", "join_variants_nulls", "json_extract_props",
    "merge_upsert_customers", "ntile_price_quartiles", "pii_scrub_docs",
    "pivot_user_event_counts", "profile_lineitem", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q8_market_share", "q9_product_profit",
    "range_join_price_buckets", "rank_functions",
]


def test_round13_driver_window_is_pinned():
    assert list(QUERIES)[:50] == _R13_WINDOW


def test_new_round13_gates_sit_after_the_window():
    """The second-wave gates must be queued in the never-verified
    cohort right after the window, never inside it."""
    names = list(QUERIES)
    for g in (
        "kneser_ney_heldout_docs", "bpe_train_batched_docs",
        "classifier_quality_docs", "pmi_collocations_docs",
        "dsir_weights_docs", "ccnet_buckets_docs", "grouped_rank_prices",
        "blocklist_filter_docs", "domain_cap_docs", "kneser_ney3_lm_docs",
        "kneser_ney3_heldout_docs", "bpe_fertility_langs",
        "kn_perplexity_docs", "classifier_sigmoid_docs",
        "streaming_trigram_counts_docs", "temperature_mixture_alpha_docs",
    ):
        assert 50 <= names.index(g) < 50 + 16, g


def test_every_query_has_full_oracle():
    """181/181 full-oracle discipline: no rows-only checks anywhere."""
    assert len(QUERIES) == 181
    missing = [k for k, q in QUERIES.items() if not q.oracle]
    assert missing == [], missing
