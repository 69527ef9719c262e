#!/usr/bin/env python
"""Round-14 triage of the four queries VERDICT r13 flagged ``weak`` as
bench-record entries (plus ``url_domain_stats_docs``, whose PERF
receipt under-measured): driver r13 showed 2-4x vs the r12 record on
`embedding_kmeans_clusters` (21.9s vs 5.5), `embedding_kmeans_two_level`
(3.9 vs 1.8), `streaming_user_totals_stateful` (7.3 vs 2.0) and
`semantic_dedup_two_level` (4.9 vs 3.1), with judge quiet-box replays
confirming a residual.  None of their implementing files changed in
r13 and their plans are test-pinned, so the candidate mechanisms are
environmental: Arrow/Python worker pool startup, state-store dir
churn, codegen/GC debt from sweep context, or a real constant (the
PSL rules re-parse for url_domain_stats_docs).

Protocol (the one that cracked the r9/r10 regressions): ONE fresh
process on a quiet box, explicit warm-up, n>=5 repeats, medians, three
orderings:
  A. isolated-warm: each suspect alone after warm-up.  At ~r12 level
     => the code is fine and the driver number is sweep contention.
  B. alternate order: suspects re-timed in REVERSED order (catches
     order-dependent contamination between the suspects themselves).
  C. post-load: re-time after the heavy gates the driver sweep
     interleaves (process-lifetime contamination: worker pool growth,
     GC debt, shuffle-dir accretion).

Usage: python tools/triage_r14_bench.py [n]
Reference records (sf0.1 driver r12): embedding_kmeans_clusters 5.5,
embedding_kmeans_two_level 1.8, streaming_user_totals_stateful 2.0,
semantic_dedup_two_level 3.1, url_domain_stats_docs 1.65 (PERF r13).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclass_array_spark.session import get_spark
from dataclass_array_spark.workload import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
R12_RECORD = {
    "embedding_kmeans_clusters": 5.5,
    "embedding_kmeans_two_level": 1.8,
    "streaming_user_totals_stateful": 2.0,
    "semantic_dedup_two_level": 3.1,
    "url_domain_stats_docs": 1.65,
}
SUSPECTS = list(R12_RECORD)
LOAD = [
    "linkage_entity_clusters",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "pack_context_windows",
    "bm25_doc_ranking",
    "kneser_ney3_heldout_docs",
]


def t(spark, name: str) -> float:
    t0 = time.perf_counter()
    _ = QUERIES[name].fn(spark, SF_DIR).collect()
    return time.perf_counter() - t0


def stats(samples) -> str:
    return (
        f"med {round(statistics.median(samples), 2)} "
        f"min {round(min(samples), 2)} max {round(max(samples), 2)}"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("triage14")
    QUERIES["q6_forecast_revenue"].fn(spark, SF_DIR).collect()
    QUERIES["multimodal_decode"].fn(spark, SF_DIR).collect()
    for s in SUSPECTS:
        t(spark, s)  # first-touch codegen per suspect

    print(f"--- phase A: isolated warm (n={n}) ---")
    for s in SUSPECTS:
        xs = [t(spark, s) for _ in range(n)]
        print(f"A {s}: {stats(xs)} (r12 record {R12_RECORD[s]})")

    print(f"--- phase B: reversed order (n={n}) ---")
    bs = {s: [] for s in SUSPECTS}
    for _ in range(n):
        for s in reversed(SUSPECTS):
            bs[s].append(t(spark, s))
    for s in SUSPECTS:
        print(f"B {s}: {stats(bs[s])}")

    print(f"--- phase C: after heavy-load gates (n={n}) ---")
    for name in LOAD:
        print(f"  load {name}: {round(t(spark, name), 2)} s")
    for s in SUSPECTS:
        xs = [t(spark, s) for _ in range(n)]
        print(f"C {s}: {stats(xs)}")


if __name__ == "__main__":
    main()
