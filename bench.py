#!/usr/bin/env python
"""Headline benchmark: runs the bench-tagged workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Each query is fully materialized via collect() (results are small by
construction — aggregates or limited top-k).  A warm-up run of q6 is
excluded so JVM/codegen startup doesn't pollute the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataclass_array_spark.session import get_spark
from dataclass_array_spark.workload import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Second bench pass at sf1 (generated under the repo by tools/make_sf1.py:
# sf0.1 ×10 with key offsets) — per-query overhead swamps sf0.1, so
# round-over-round regressions only show at sf1.  Subset spans every
# operator family; set SPARK_GRAFT_SF1=off to skip.
SF1_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    "q18_large_orders",
    "window_running_total",
    "topk_orders_per_segment",
    "asof_purchase_last_click",
    "sessionize_events",
    "salted_revenue_by_flag",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "embedding_topk_cosine",
    "text_stats",
    "shape_mask_filter",
    "shape_vectorize_mat",
    # round-2 training-pipeline ops
    "decontam_ngram_overlap",
    "repetition_filter_docs",
    "embedding_kmeans_clusters",
)


def main() -> None:
    spark = get_spark("bench")
    # warm-up (excluded from timings): JVM JIT + codegen + parquet footer
    # reads, plus one mapInPandas query so the Python worker pool and
    # Arrow serde are spun up before anything is measured
    QUERIES["q6_forecast_revenue"].fn(spark, SF_DIR).collect()
    QUERIES["multimodal_decode"].fn(spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, q in QUERIES.items():
        if not q.bench:
            continue
        t0 = time.time()
        rows = q.fn(spark, SF_DIR).collect()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        _ = len(rows)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Per-query timings go to a file + an EARLIER stdout line; the driver
    # tail-captures stdout and round 1 showed the full 74-query dict
    # overflows its capture window ("parsed": null).  The LAST stdout line
    # must be a short, self-contained headline JSON.
    detail = {
        "metric": "workload_total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    # ---- optional sf1 pass ----
    if os.environ.get("SPARK_GRAFT_SF1", "auto") != "off":
        try:
            from tools.make_sf1 import ensure_sf1

            sf1_dir = ensure_sf1(spark)
            t1: dict[str, float] = {}
            tot1 = 0.0
            for name in SF1_QUERIES:
                t0 = time.time()
                _ = QUERIES[name].fn(spark, sf1_dir).collect()
                dt = time.time() - t0
                t1[name] = round(dt, 3)
                tot1 += dt
            detail["sf1"] = {
                "value": round(tot1, 3),
                "n_queries": len(t1),
                "queries": t1,
            }
        except Exception as e:  # sf1 is best-effort; never fail the bench
            detail["sf1"] = {"error": f"{type(e).__name__}: {e}"}

    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    print(json.dumps(detail))
    headline = {
        "metric": "workload_total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "n_queries": len(timings),
        "median_sec": round(sorted(timings.values())[len(timings) // 2], 3),
        "max_sec": round(max(timings.values()), 3),
        "sf": sf_val,
    }
    sf1_info = detail.get("sf1", {})
    if "value" in sf1_info:
        headline["sf1_subset_sec"] = sf1_info["value"]
        headline["sf1_n_queries"] = sf1_info["n_queries"]
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
