"""Central query registry.  Every operator claimed in SURVEY.md §2 gets a
named entry here with its Spark callable and (where SQL-expressible) the
DuckDB oracle — the pair is what the driver's correctness gate checks."""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from dataclass_array_spark.workload.base import load_tables  # re-export


@dataclasses.dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    tags: Tuple[str, ...] = ()
    bench: bool = True  # include in bench.py headline timing


# The driver's per-round correctness gate checks roughly the first 50
# registry entries, so the window is ROTATED each round to keep every
# query under recurring driver verification.  Round 16 ordering
# (VERDICT r15 item 1, followed exactly): the 15 optimizer-touched
# gates whose physical plans changed in round 15 (BPE family, KN/KN3
# scorers, pmi/ccnet/dsir, dedup_components/incremental,
# classifier_auc_by_source) but which the rotated r15 window did not
# cover come FIRST — they convert the round-15 wins from
# builder-attested to driver-attested.  Then the remaining 6
# never-driver-verified round-15 gates, then the first 29 of the 38
# r12-cohort entries the original r16 plan targeted — exactly 50.
# Just past the window: the 50 gates the r15 driver window verified
# (freshest, lowest re-verification urgency is wrong — they are
# freshly verified, so they sit behind the stale blocks), then the
# last 9 r12-cohort entries, the rest of the r13 cohort and the
# r14-verified block.  Python dicts preserve insertion order, so this
# ordering is exactly what ``queries()`` exposes to the driver.
#
# r17 rotation plan: last 9 r12-cohort entries + the remainder of the
# r13 cohort, then the head of the r14-verified block.
_PRIORITY: Tuple[str, ...] = (
    # ---- 15 round-15 optimizer-touched, driver-unverified gates ----
    "bpe_train_docs",
    "bpe_train_batched_docs",
    "bpe_encode_docs",
    "bpe_heldout_encode_docs",
    "bpe_fertility_langs",
    "kneser_ney3_lm_docs",
    "kneser_ney3_heldout_docs",
    "kneser_ney_heldout_docs",
    "kn_perplexity_docs",
    "pmi_collocations_docs",
    "ccnet_buckets_docs",
    "dsir_weights_docs",
    "dedup_components",
    "dedup_incremental_docs",
    "classifier_auc_by_source_docs",
    # ---- remaining 6 never-driver-verified round-15 gates ----
    "classifier_ece_docs",
    "classifier_ece_by_source_docs",
    "classifier_brier_docs",
    "classifier_ks_docs",
    "classifier_f1_best_docs",
    "classifier_brier_by_source_docs",
    # ---- first 29 of the remaining 38 r12-cohort entries ----
    "embedding_ann_ivf_kmeans",
    "embedding_knn_join_kmeans",
    "dedup_ngram_jaccard",
    "shape_vectorize_mat",
    "streaming_purchase_clicks",
    "streaming_quality_filter",
    "streaming_tumbling_hourly",
    "streaming_session_windows",
    "streaming_dedup_events",
    "streaming_user_totals_stateful",
    "streaming_sliding_hourly",
    "streaming_decontam_docs",
    "domain_mixture_sample",
    "multimodal_frames",
    "pipeline_pretrain_corpus",
    "tokenize_docs",
    "token_rarity_docs",
    "lm_quality_docs",
    "shape_mask_filter",
    "shape_gather",
    "shape_transpose",
    "shape_slice",
    "shape_concat_mapfield",
    "median_quantity_by_flag",
    "approx_sketches",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q16_supplier_counts",
    "q20_promotion_suppliers",
    # ==== window boundary (50) ====
    # ---- driver-verified in round 15 ----
    "classifier_train_docs",
    "pack_ffd_docs",
    "streaming_kn_score_docs",
    "classifier_auc_docs",
    "classifier_pr_docs",
    "ann_recall_ivf_docs",
    "classifier_calibration_docs",
    "linkage_entity_clusters",
    "linkage_part_entities",
    "multimodal_decode",
    "multimodal_metadata",
    "nucleus_select_docs",
    "ols_price_vs_quantity",
    "outlier_mad_quantity",
    "pack_context_windows",
    "pagerank_event_hotspots",
    "pipeline_quality_corpus",
    "scd2_customer_history",
    "simhash_fingerprints",
    "split_train_val_test",
    "stratified_sample_docs",
    "streaming_incremental_dedup",
    "text_stats",
    "tfidf_top_terms",
    "triangle_counts_events",
    "vocab_top_words",
    "weighted_sample_docs",
    "winsorize_price_stats",
    "hilbert3d_orders_layout",
    "bigram_lm_docs",
    "bigram_lm_heldout_docs",
    "countmin_token_freq",
    "streaming_countmin_tokens",
    "hll_distinct_users",
    "token_entropy_docs",
    "bloom_filter_orders",
    "ols2_price_model",
    "streaming_hll_users",
    "dedup_keep_best_docs",
    "embedding_ann_sq8",
    "hist_quantiles_prices",
    "hll_overlap_users",
    "streaming_bloom_orders",
    "streaming_hist_prices",
    "gap_fill_events",
    "embedding_kmeans_clusters",
    "embedding_kmeans_two_level",
    "semantic_dedup_auto",
    "semantic_dedup_embeddings",
    "text_cluster_topics",
    # ---- last 9 r12-cohort entries (head of the r17 window) ----
    "q10_returned_items",
    "q4_order_priority",
    "q12_shipmode_priority",
    "q14_promo_revenue",
    "q18_large_orders",
    "q17_below_avg_parts",
    "q19_disjunctive_revenue",
    "q22_in_subquery",
    "q7_nation_volume",
    # ---- r13/r14-verified blocks, minus gates moved into the
    #      window above, original order ----
    "url_dedup_docs",
    "url_domain_stats_docs",
    "skew_zipf_salted_agg",
    "qdigest_quantiles_prices",
    "streaming_qdigest_prices",
    "kneser_ney_lm_docs",
    "ewma_user_values",
    "hilbert_orders_layout",
    "repetition_filter_docs",
    "semantic_dedup_two_level",
    "shape_vectorize",
    "zorder_orders_layout",
    "asof_purchase_last_click",
    "budget_select_docs",
    "cohort_retention_events",
    "corr_price_quantity",
    "cube_nation_segment",
    "date_functions",
    "dedup_apply_minhash",
    "dedup_apply_simhash",
    "dedup_embedding_neardup",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_auto",
    "dedup_simhash_pairs",
    "distinct_parts_per_supplier",
    "dq_validate_orders",
    "embedding_knn_join",
    "funnel_conversion_events",
    "grouping_sets_revenue",
    "join_variants_nulls",
    "json_extract_props",
    "merge_upsert_customers",
    "ntile_price_quartiles",
    "pii_scrub_docs",
    "pivot_user_event_counts",
    "profile_lineitem",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "range_join_price_buckets",
    "rank_functions",
    "classifier_quality_docs",
    "grouped_rank_prices",
    "blocklist_filter_docs",
    "domain_cap_docs",
    "classifier_sigmoid_docs",
    "streaming_trigram_counts_docs",
    "temperature_mixture_alpha_docs",
    "rollup_flag_status",
    "salted_revenue_by_flag",
    "scalar_functions",
    "semi_anti_customers",
    "sessionize_events",
    "setops_repeat_customers",
    "sliding_hourly_stats",
    "string_functions2",
    "topk_orders_per_segment",
    "tumbling_hourly_stats",
    "udtf_bigram_counts",
    "unpivot_part_metrics",
    "window_moving_avg",
    "window_range_frame",
    "window_running_total",
    "order_quantity_arrays",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q21_waiting_supplier",
    "bm25_doc_ranking",
    "chunk_documents",
    "community_user_states",
    "decontam_ngram_overlap",
    "dedup_chunks_exact",
    "doc_fingerprints",
    "duplicate_spans_docs",
    "embedding_ann_ivf",
    "embedding_ann_ivf_pq",
    "embedding_ann_pq",
    "embedding_ann_srp",
    "embedding_topk_cosine",
    "fuzzy_join_part_names",
    "kcore_user_states",
    "lang_id_docs",
)


def _collect() -> Dict[str, Query]:
    out: Dict[str, Query] = {}
    # Import errors must be LOUD: a swallowed ImportError here would
    # silently shrink the query registry and the gate would just see
    # fewer queries instead of a failure.
    for modname in (
        "tpch", "tpch2", "tpch3", "relational", "relational2",
        "events", "llm", "llm2", "llm3", "llm4", "llm5", "streaming",
        "shapes",
    ):
        mod = __import__(
            f"dataclass_array_spark.workload.{modname}", fromlist=["QUERIES"]
        )
        for k, v in mod.QUERIES.items():
            if k in out:
                raise ValueError(f"duplicate query name {k}")
            out[k] = v
    missing = [k for k in _PRIORITY if k not in out]
    if missing:
        raise ValueError(f"_PRIORITY names unknown queries: {missing}")
    ordered = {k: out[k] for k in _PRIORITY}
    ordered.update((k, v) for k, v in out.items() if k not in ordered)
    return ordered


QUERIES: Dict[str, Query] = _collect()


def query_fns() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: q.fn for k, q in QUERIES.items()}


def oracle_sqls() -> Dict[str, str]:
    return {k: q.oracle for k, q in QUERIES.items() if q.oracle}
