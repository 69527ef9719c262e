#!/usr/bin/env python
"""Per-query profile: split wall time into fn() definition time (driver
loops, collects inside the query builder) vs the final collect, and
count Spark jobs each phase launches (statusTracker + job groups).
High job counts at tiny sf = sequential-action overhead; high def time
= driver-side iteration (kmeans/BPE/classifier loops).

Usage: python tools/profile_queries.py [query ...]   (default: all bench)
       SPARK_GRAFT_PROFILE_N=1 repeats
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclass_array_spark.core.table import release_pins
from dataclass_array_spark.session import get_spark
from dataclass_array_spark.workload import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = max(1, int(os.environ.get("SPARK_GRAFT_PROFILE_N", "1")))


def _jobs_in_group(spark, group: str) -> tuple[int, int]:
    st = spark.sparkContext.statusTracker()
    jids = st.getJobIdsForGroup(group)
    n_stages = 0
    for j in jids:
        info = st.getJobInfo(j)
        if info is not None:
            n_stages += len(info.stageIds)
    return len(jids), n_stages


def main() -> None:
    only = sys.argv[1:]
    spark = get_spark("profile")
    names = only or sorted(n for n, q in QUERIES.items() if q.bench)
    # warm-up
    QUERIES["q6_forecast_revenue"].fn(spark, SF_DIR).collect()
    QUERIES["multimodal_decode"].fn(spark, SF_DIR).collect()
    out = {}
    for name in names:
        best = None
        for _ in range(N):
            gdef = f"def-{name}-{uuid.uuid4().hex[:6]}"
            spark.sparkContext.setJobGroup(gdef, f"def {name}")
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, SF_DIR)
            t1 = time.perf_counter()
            gact = f"act-{name}-{uuid.uuid4().hex[:6]}"
            spark.sparkContext.setJobGroup(gact, f"act {name}")
            rows = df.collect()
            t2 = time.perf_counter()
            spark.sparkContext.setJobGroup(None, None)
            # drop this run's pinned localCheckpoint blocks (bench.py
            # discipline): without this, repeats accumulate dead blocks
            # and later runs measure block-manager pressure, not the query
            release_pins()
            jd, sd = _jobs_in_group(spark, gdef)
            ja, sa = _jobs_in_group(spark, gact)
            rec = {
                "def_s": round(t1 - t0, 3),
                "act_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "def_jobs": jd,
                "def_stages": sd,
                "act_jobs": ja,
                "act_stages": sa,
                "rows": len(rows),
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        out[name] = best
        print(
            f"{best['total_s']:7.2f}s  def={best['def_s']:6.2f}s/{best['def_jobs']:3d}j/{best['def_stages']:3d}st  "
            f"act={best['act_s']:6.2f}s/{best['act_jobs']:3d}j/{best['act_stages']:3d}st  {name}",
            flush=True,
        )
    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
