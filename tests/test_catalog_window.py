"""The driver's correctness gate checks roughly the FIRST 50 registry
entries, so the _PRIORITY ordering is a per-round contract (VERDICT
item 1 every round).  Pin the round-14 window so a refactor or a
mid-round gate insertion can never silently reorder it."""

from dataclass_array_spark.workload.catalog import QUERIES

_R14_WINDOW = [
    # 16 never-driver-verified round-13 gates (VERDICT r13 item 1 order)
    "kneser_ney_heldout_docs", "bpe_train_batched_docs",
    "classifier_quality_docs", "pmi_collocations_docs",
    "dsir_weights_docs", "ccnet_buckets_docs", "grouped_rank_prices",
    "blocklist_filter_docs", "domain_cap_docs", "kneser_ney3_lm_docs",
    "kneser_ney3_heldout_docs", "bpe_fertility_langs",
    "kn_perplexity_docs", "classifier_sigmoid_docs",
    "streaming_trigram_counts_docs", "temperature_mixture_alpha_docs",
    # 15 r10-era leftovers (stalest block)
    "rollup_flag_status", "salted_revenue_by_flag", "scalar_functions",
    "semi_anti_customers", "sessionize_events", "setops_repeat_customers",
    "sliding_hourly_stats", "string_functions2",
    "topk_orders_per_segment", "tumbling_hourly_stats",
    "udtf_bigram_counts", "unpivot_part_metrics", "window_moving_avg",
    "window_range_frame", "window_running_total",
    # first 19 r11-cohort queries, catalog order
    "order_quantity_arrays", "q13_customer_distribution",
    "q15_top_supplier", "q21_waiting_supplier", "bm25_doc_ranking",
    "chunk_documents", "community_user_states", "decontam_ngram_overlap",
    "dedup_chunks_exact", "doc_fingerprints", "duplicate_spans_docs",
    "embedding_ann_ivf", "embedding_ann_ivf_pq", "embedding_ann_pq",
    "embedding_ann_srp", "embedding_topk_cosine", "fuzzy_join_part_names",
    "kcore_user_states", "lang_id_docs",
]


def test_round14_driver_window_is_pinned():
    assert list(QUERIES)[:50] == _R14_WINDOW


def test_new_round14_gates_sit_after_the_window():
    """Gates added during round 14 must be queued in the never-verified
    cohort right after the window, never inside it."""
    names = list(QUERIES)
    n_new = len(names) - 181
    for g in names[50:50 + n_new]:
        # every post-window pre-r11 entry must be a round-14 addition
        assert g not in _R14_WINDOW
    # the remaining r11 cohort follows the round-14 block
    assert names[50 + n_new] == "linkage_entity_clusters"


def test_every_query_has_full_oracle():
    """Full-oracle discipline: no rows-only checks anywhere."""
    assert len(QUERIES) >= 181
    missing = [k for k, q in QUERIES.items() if not q.oracle]
    assert missing == [], missing
