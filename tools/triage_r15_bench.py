#!/usr/bin/env python
"""Round-15 triage of the queries the closing bench flagged >30% and
>0.5s over their round-14 builder medians (4 streaming gates, 3
shape_* entries, tfidf_top_terms, pmi_collocations_docs,
pipeline_pretrain_corpus).  None of their implementing files changed
in round 15 (the only touched operator files are metrics.py /
packing.py::grouped_cumsum / streaming/core.py's driver-side dir
check) and every plan is test-pinned, so the prior mechanism —
sweep/host contention — is the hypothesis; the closing-run samples
already show drifting passes (e.g. streaming_purchase_clicks
5.4/18.1/5.5, pmi 2.3/2.2/4.8).

Protocol (judge recipe, round-14 verdict): ONE fresh process on a
quiet box, explicit warm-up, n>=5 isolated-warm repeats, medians,
WITH flat control queries (q18_large_orders, domain_cap_docs) timed
alongside — a heavy mixed replay loop contaminates small gates ~2x,
and flat controls at their records prove the box is actually quiet.

Usage: python tools/triage_r15_bench.py [n]
Reference (sf0.1 r14 builder medians): see R14_MEDIAN below.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclass_array_spark.session import get_spark
from dataclass_array_spark.workload import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
R14_MEDIAN = {
    "streaming_user_totals_stateful": 2.90,
    "streaming_purchase_clicks": 3.55,
    "streaming_dedup_events": 3.17,
    "streaming_tumbling_hourly": 1.70,
    "shape_vectorize": 1.88,
    "shape_transpose": 1.58,
    "shape_concat_mapfield": 1.58,
    "tfidf_top_terms": 1.27,
    "pmi_collocations_docs": 1.75,
    "pipeline_pretrain_corpus": 2.12,
}
CONTROLS = {"q18_large_orders": 1.06, "domain_cap_docs": 0.73}


def _run(spark, name: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, SF_DIR).collect()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("triage-r15")
    # warm-up: JVM/codegen + Python worker pool + parquet footers
    QUERIES["q6_forecast_revenue"].fn(spark, SF_DIR).collect()
    QUERIES["multimodal_decode"].fn(spark, SF_DIR).collect()
    out = {}
    for name, ref in list(CONTROLS.items()) + list(R14_MEDIAN.items()):
        samples = [round(_run(spark, name), 3) for _ in range(n)]
        med, mn = statistics.median(samples), min(samples)
        kind = "CONTROL" if name in CONTROLS else "suspect"
        verdict = (
            "at-ref"
            if med <= ref * 1.25
            else ("floor-at-ref" if mn <= ref * 1.25 else "ELEVATED")
        )
        out[name] = {
            "ref": ref, "median": round(med, 3), "min": round(mn, 3),
            "samples": samples, "kind": kind, "verdict": verdict,
        }
        print(f"{kind:7s} {name}: ref {ref} med {med:.2f} min {mn:.2f} "
              f"{verdict} {samples}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
