#!/usr/bin/env python
"""Round-10 triage of the driver-measured k-means-family regression
(VERDICT r9 item 1): embedding_kmeans_clusters 5.41 -> 9.08 s and
semantic_dedup_auto 5.66 -> 7.61 s sf0.1 driver-to-driver across
r8 -> r9, while the builder's isolated closing bench showed the family
flat.  Protocol = the one that cracked streaming in r9: ONE process,
no other JVM on the box, explicit warm-up, n repeats, medians.

Three phases separate the candidate mechanisms:
  A. isolated-warm: warm-up pass, then n repeats of each gate alone.
     If these sit at the r8 level, the CODE is not the regression.
  B. family-sequence: run the whole 8-gate kmeans family back-to-back
     (bench interleaving order) and re-time the two suspects inside
     that context — catches per-family contamination (Python worker
     pool growth, codegen cache, GC debt from prior collects).
  C. post-load: run a slice of OTHER heavy gates first (the ones the
     driver interleaves before the family), then re-time — catches
     process-lifetime contamination (the driver times queries inside
     a 140-query x3 sweep; the builder's isolated replays don't).

Usage: python tools/triage_kmeans_bench.py [n]
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
SUSPECTS = ["embedding_kmeans_clusters", "semantic_dedup_auto"]
FAMILY = [
    "embedding_kmeans_clusters",
    "embedding_kmeans_two_level",
    "semantic_dedup_auto",
    "semantic_dedup_embeddings",
    "semantic_dedup_two_level",
    "text_cluster_topics",
    "embedding_ann_ivf_kmeans",
    "embedding_knn_join_kmeans",
]
# heavy non-family gates the driver interleaves before/around the family
LOAD = [
    "linkage_entity_clusters",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "hilbert_orders_layout",
    "pack_context_windows",
    "bm25_doc_ranking",
]


def t(spark, name: str) -> float:
    t0 = time.perf_counter()
    _ = QUERIES[name].fn(spark, SF_DIR).collect()
    return time.perf_counter() - t0


def med(spark, name: str, n: int) -> float:
    return round(statistics.median(t(spark, name) for _ in range(n)), 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("triage")
    # warm-up: JIT + parquet footers + Python worker pool
    QUERIES["q6_forecast_revenue"].fn(spark, SF_DIR).collect()
    QUERIES["multimodal_decode"].fn(spark, SF_DIR).collect()
    for s in SUSPECTS:
        t(spark, s)  # first-touch codegen for the suspects themselves

    print(f"--- phase A: isolated warm (n={n}) ---")
    for s in SUSPECTS:
        print(f"A {s}: {med(spark, s, n)} s")

    print(f"--- phase B: inside family sequence (n={n} passes) ---")
    fam_samples = {s: [] for s in SUSPECTS}
    for _ in range(n):
        for name in FAMILY:
            el = t(spark, name)
            if name in fam_samples:
                fam_samples[name].append(el)
    for s in SUSPECTS:
        print(f"B {s}: {round(statistics.median(fam_samples[s]), 2)} s")

    print(f"--- phase C: after heavy-load gates (n={n}) ---")
    for name in LOAD:
        el = t(spark, name)
        print(f"  load {name}: {round(el, 2)} s")
    for s in SUSPECTS:
        print(f"C {s}: {med(spark, s, n)} s")


if __name__ == "__main__":
    main()
