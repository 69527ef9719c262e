#!/usr/bin/env python
"""Dump formatted physical plans for workload queries and grep them for
the plan properties that matter at scale: parquet filter pushdown, column
pruning (ReadSchema), broadcast joins, WindowGroupLimit, and codegen
coverage.  Usage: python tools/explain_plans.py [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclass_array_spark.session import get_spark
from dataclass_array_spark.workload import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

CHECKS = {
    "pushed_filters": "PushedFilters: [",
    "broadcast_join": "BroadcastHashJoin",
    "window_group_limit": "WindowGroupLimit",
    "codegen": "WholeStageCodegen",
    "aqe": "AdaptiveSparkPlan",
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("explain")
    for name, q in QUERIES.items():
        if only and name not in only:
            continue
        if "streaming" in q.tags:
            continue  # streaming plans aren't explain("formatted")-able pre-start
        try:
            p = plan_of(q.fn(spark, SF_DIR))
        except Exception as e:
            print(f"{name}: ERROR {e}")
            continue
        hits = [k for k, pat in CHECKS.items() if pat in p]
        nonempty_pushed = "PushedFilters: []" not in p and "PushedFilters: [" in p
        if nonempty_pushed:
            hits = [h if h != "pushed_filters" else "pushed_filters(+)" for h in hits]
        print(f"{name}: {', '.join(hits)}")
        if only:
            print(p)


if __name__ == "__main__":
    main()
