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
# query under recurring driver verification.  Round 7 ordering (the
# round-6 rule, kept): queries whose IMPLEMENTATION changed this round
# go at the very front — regardless of when they were last checked —
# then the 54 queries that sat out the r06 window (all local-green this
# session), then the r06-driver-verified remainder.  Changed this
# round: five NEW gates (PQ/IVF-PQ ANN, chunk-level dedup, SimHash
# banded pairs + apply), kmeans_fit gained sampled training + cached
# Lloyd frames + the driver-side Lloyd fast path (all four
# clustering/SemDeDup gates), minhash_lsh_pairs dropped the shingle
# payload from the band shuffle (three minhash gates),
# connected_components gained pin= (dedup_components), the vectorize
# tracer gained float()/int() coercion + IEEE NaN parity (both shape
# gates), and knn_join/ivf_topk/srp_lsh_topk gained trained-centroid
# options (three ANN gates).  Python dicts preserve insertion order,
# so this ordering is exactly what ``queries()`` exposes to the driver.
_PRIORITY: Tuple[str, ...] = (
    # ---- implementations changed in round 7: driver-verify FIRST
    # (sampled k-means training + cached Lloyd frames, MinHash band-
    # payload fix, pin= plumbing, NaN-parity + float()/int() tracing,
    # trained-centroid ANN options) ----
    "embedding_ann_pq",  # NEW round 7: product-quantization ADC, exact oracle
    "embedding_ann_ivf_pq",  # NEW round 7: FAISS-style IVFADC, exact oracle
    "dedup_chunks_exact",  # NEW round 7: chunk-level (C4 line) dedup
    "dedup_simhash_pairs",  # NEW round 7: banded Hamming SimHash join
    "dedup_apply_simhash",  # NEW round 7: SimHash pairs -> surviving corpus
    "dedup_incremental_docs",  # NEW round 7: batch-vs-store dedup flags
    "fuzzy_join_part_names",  # NEW round 7: edit-distance string join
    "pagerank_event_hotspots",  # NEW round 7: weighted PageRank, exact oracle
    "text_cluster_topics",  # NEW round 7: vocab features -> k-means topics
    "triangle_counts_events",  # NEW round 7: once-each triangle enumeration
    "funnel_conversion_events",  # NEW round 7: ordered-funnel analysis
    "gap_fill_events",  # NEW round 7: dense-grid LOCF
    "cohort_retention_events",  # NEW round 7: cohort matrix
    "dq_validate_orders",  # NEW round 7: data-quality checks
    "profile_lineitem",  # NEW round 7: single-pass column profiler
    "budget_select_docs",  # NEW round 7: per-source token-budget curation
    "embedding_knn_join_kmeans",
    "semantic_dedup_embeddings",
    "semantic_dedup_auto",
    "embedding_kmeans_clusters",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_auto",
    "dedup_apply_minhash",
    "dedup_components",
    "shape_vectorize",
    "shape_vectorize_mat",
    "embedding_knn_join",
    "embedding_ann_ivf",
    "embedding_ann_ivf_kmeans",  # NEW round 7: trained-cell IVF, exact oracle
    "embedding_ann_srp",
    # ---- sat out r06 (r05/local-green), unchanged this round ----
    "corr_price_quantity",
    "pii_scrub_docs",
    "merge_upsert_customers",
    "join_variants_nulls",
    "string_functions2",
    "asof_purchase_last_click",
    "sessionize_events",
    "json_extract_props",
    "tumbling_hourly_stats",
    "sliding_hourly_stats",
    "dedup_exact_docs",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q21_waiting_supplier",
    "order_quantity_arrays",
    "dedup_ngram_jaccard",
    "simhash_fingerprints",
    "text_stats",
    "lang_id_docs",
    "doc_fingerprints",
    "embedding_topk_cosine",
    "multimodal_metadata",
    "multimodal_decode",
    "pipeline_quality_corpus",
    "chunk_documents",
    "vocab_top_words",
    "tfidf_top_terms",
    "split_train_val_test",
    "stratified_sample_docs",
    "pack_context_windows",
    "bm25_doc_ranking",
    "decontam_ngram_overlap",
    "repetition_filter_docs",
    "domain_mixture_sample",
    "multimodal_frames",
    "pipeline_pretrain_corpus",
    "tokenize_docs",
    "token_rarity_docs",
    "streaming_quality_filter",
    "streaming_tumbling_hourly",
    "streaming_session_windows",
    "streaming_dedup_events",
    "shape_mask_filter",
    "shape_gather",
    "shape_transpose",
    # ---- r06-driver-verified, unchanged (overflow the ~50 window) ----
    "shape_slice",
    "shape_concat_mapfield",
    "median_quantity_by_flag",
    "approx_sketches",
    "streaming_purchase_clicks",
    "lm_quality_docs",
    "streaming_decontam_docs",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q16_supplier_counts",
    "q20_promotion_suppliers",
    "q10_returned_items",
    "q4_order_priority",
    "q12_shipmode_priority",
    "q14_promo_revenue",
    "q18_large_orders",
    "q17_below_avg_parts",
    "q19_disjunctive_revenue",
    "q22_in_subquery",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "window_running_total",
    "window_moving_avg",
    "topk_orders_per_segment",
    "rollup_flag_status",
    "cube_nation_segment",
    "setops_repeat_customers",
    "semi_anti_customers",
    "pivot_user_event_counts",
    "range_join_price_buckets",
    "distinct_parts_per_supplier",
    "scalar_functions",
    "window_range_frame",
    "rank_functions",
    "date_functions",
    "dedup_embedding_neardup",
    "udtf_bigram_counts",
    "grouping_sets_revenue",
    "unpivot_part_metrics",
    "salted_revenue_by_flag",
    "ntile_price_quartiles",
)


def _collect() -> Dict[str, Query]:
    out: Dict[str, Query] = {}
    # Import errors must be LOUD: a swallowed ImportError here would
    # silently shrink the query registry and the gate would just see
    # fewer queries instead of a failure.
    for modname in (
        "tpch", "tpch2", "tpch3", "relational", "relational2",
        "events", "llm", "llm2", "llm3", "streaming", "shapes",
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
