#!/usr/bin/env python
"""Round-11 audit of the remaining interpreted-HOF folds (VERDICT r10
item 3) under the round-10 finding: Catalyst higher-order functions
(``aggregate``/``transform`` let-bindings) are interpreted, allocating
per element — the Hilbert key's fixed-depth fold got 3.2→1.2 s at
sf0.1 when rewritten as chained projections.

The question per fold: (a) does the fold DOMINATE its gate, and
(b) is it expressible as chained projections?  (b) is structural:
only a fold whose depth is a PLAN-TIME CONSTANT unrolls (Hilbert's 13
levels).  Every remaining fold runs over a VARIABLE-LENGTH array
(per-doc bigrams / characters, per-key event history), so the
projection-chain rewrite cannot apply; what this script measures is
(a) — the fold's cost share, by timing each gate against a structural
twin with the fold replaced by a same-shape cheap expression — so the
PERF.md table can say "fold costs X% of the gate" with receipts, and
flag any gate where an Arrow-kernel rewrite (the other escape hatch)
would actually pay.

Protocol: one process, no other JVM, explicit warm-up, n repeats,
medians (the r9/r10 protocol).  Usage: python tools/audit_hof_folds.py [n]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataclass_array_spark.session import get_spark
from dataclass_array_spark.workload import QUERIES
from dataclass_array_spark.workload.base import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# fold-bearing gates: (gate, the fold it exercises)
GATES = [
    ("repetition_filter_docs", "quality._top_run + _grams folds"),
    ("lm_quality_docs", "quality folds via repetition_flag"),
    ("ewma_user_values", "timeseries.ewma_last per-key recurrence"),
    ("doc_fingerprints", "text.rolling_fingerprint char fold"),
    ("token_rarity_docs", "text xent ordered sum fold"),
    ("lang_id_docs", "text lang-ID scoring"),
    ("text_stats", "text token folds"),
]


def timed(fn, n):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return xs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("audit-hof")
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    events = load_tables(spark, SF_DIR, ["events"])["events"]
    for d in (docs, events):
        d.count()  # warm scan cache / JIT

    print(f"== gate timings (isolated warm, n={n}, median) sf={SF_DIR}")
    gate_med = {}
    for g, what in GATES:
        QUERIES[g].fn(spark, SF_DIR).collect()  # warm
        xs = timed(lambda: QUERIES[g].fn(spark, SF_DIR).collect(), n)
        gate_med[g] = statistics.median(xs)
        print(f"{g:28s} {gate_med[g]:6.2f}s  [{what}]  raw={['%.2f' % x for x in xs]}")

    print("\n== fold cost share (gate vs structural twin, fold -> cheap expr)")

    # 1. quality: repetition_metrics vs twin with _top_run -> size()
    from dataclass_array_spark.operators.quality import repetition_metrics
    from dataclass_array_spark.operators.text import let, tokens

    def quality_full():
        repetition_metrics(docs, "text", "doc_id").agg(
            F.sum("top_bigram_count"), F.sum(F.col("flagged").cast("long"))
        ).collect()

    def quality_nofold():
        # same tokenization + bigram build + sort, fold replaced by size
        from dataclass_array_spark.operators.quality import _grams

        t = F.col("text")
        m = let(
            tokens(t),
            lambda toks: F.struct(
                F.size(toks).cast("long").alias("n_tokens"),
                F.size(F.array_sort(_grams(toks, 2))).cast("long").alias("cnt"),
            ),
        )
        docs.select("doc_id", m.cnt.alias("c")).agg(F.sum("c")).collect()

    quality_full()
    quality_nofold()
    a = statistics.median(timed(quality_full, n))
    b = statistics.median(timed(quality_nofold, n))
    print(f"repetition_metrics           full={a:6.2f}s  nofold-twin={b:6.2f}s  fold-share~{max(0.0, a - b):.2f}s")

    # 2. rolling_fingerprint vs md5 (same normalize, no char fold)
    from dataclass_array_spark.operators.text import md5_fingerprint, rolling_fingerprint

    def roll():
        docs.select(rolling_fingerprint(F.col("text")).alias("h")).agg(
            F.sum("h")
        ).collect()

    def md5():
        docs.select(md5_fingerprint(F.col("text")).alias("h")).agg(
            F.count(F.col("h"))
        ).collect()

    roll(); md5()
    a = statistics.median(timed(roll, n))
    b = statistics.median(timed(md5, n))
    print(f"rolling_fingerprint          fold={a:6.2f}s  md5-baseline={b:6.2f}s  char-fold~{max(0.0, a - b):.2f}s")

    # 3. EWMA vs groupBy collect_list+sort only (no fold)
    from dataclass_array_spark.operators.timeseries import ewma_last

    def ewma():
        ewma_last(events, "user_id", ["ts_us", "event_id"], "value").agg(
            F.sum("ewma")
        ).collect()

    def ewma_nofold():
        ev = events.filter(F.col("value").isNotNull()).select(
            "user_id",
            F.struct("ts_us", "event_id", F.col("value").alias("_v")).alias("_s"),
        )
        ev.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.size(F.sort_array(F.collect_list("_s"))).alias("z"),
        ).agg(F.sum("z")).collect()

    ewma(); ewma_nofold()
    a = statistics.median(timed(ewma, n))
    b = statistics.median(timed(ewma_nofold, n))
    print(f"ewma_last                    full={a:6.2f}s  nofold-twin={b:6.2f}s  fold-share~{max(0.0, a - b):.2f}s")

    spark.stop()


if __name__ == "__main__":
    main()
