#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r16/.

Usage: python tools/capture_plans_r16.py before|after q1 q2 ...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclass_array_spark.session import get_spark
from dataclass_array_spark.workload import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("plans")
    os.makedirs("plans/r16", exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name].fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            p = buf.getvalue()
        except Exception as e:
            p = f"ERROR: {type(e).__name__}: {e}"
        with open(f"plans/r16/{name}_{tag}.txt", "w") as f:
            f.write(p)
        n_ex = p.count("Exchange")
        print(f"{name}: {len(p)} bytes, Exchange x{n_ex}", flush=True)


if __name__ == "__main__":
    main()
