#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 (override with
$SPARK_GRAFT_SF_DIR) and its ``oracle_sql()`` against DuckDB over the same
parquet, then compares row count, column names, and values (exact, after
sorting columns by name and rows by all columns).  Queries without an
oracle get a rows-only check.  Exit 0 iff everything matches.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dataclass_array_spark.core.table import release_pins  # noqa: E402
from dataclass_array_spark.session import get_spark  # noqa: E402
from dataclass_array_spark.workload.base import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(np.asarray(v).ravel().tolist())
                if isinstance(v, (list, np.ndarray))
                else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        errs.append(f"row count {len(sdf)} != oracle {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"columns {sorted(sdf.columns)} != oracle {sorted(odf.columns)}")
        return errs
    if errs:
        return errs
    for c in sdf.columns:
        sk = sdf[c].dtype
        ok = odf[c].dtype
        if sk != ok:
            # kind-level mismatch is a hard error; width-only (int32 vs
            # int64 etc.) is a warning worth reviewing
            if sk.kind != ok.kind and not ({sk.kind, ok.kind} <= {"i", "u"}):
                errs.append(f"col {c}: dtype kind {sk} != oracle {ok}")
            else:
                print(f"      ~ {name}.{c}: dtype width {sk} vs oracle {ok}")
    if errs:
        return errs
    s, o = normalize(sdf.copy()), normalize(odf.copy())
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            exact = np.array_equal(sv.values, ov.values, equal_nan=True)
            if not exact:
                close = np.allclose(
                    sv.fillna(0).values, ov.fillna(0).values, rtol=1e-9, atol=1e-12
                ) and sv.isna().equals(ov.isna())
                if close:
                    errs.append(f"col {c}: CLOSE but not exact (float)")
                else:
                    bad = np.flatnonzero(
                        ~np.isclose(sv.fillna(0).values, ov.fillna(0).values, rtol=1e-6)
                    )[:3]
                    errs.append(
                        f"col {c}: MISMATCH e.g. rows {bad.tolist()} "
                        f"spark={sv.iloc[bad].tolist()} oracle={ov.iloc[bad].tolist()}"
                    )
        else:
            eq = sv.astype(str).equals(ov.astype(str))
            if not eq:
                bad = np.flatnonzero((sv.astype(str) != ov.astype(str)).values)[:3]
                errs.append(
                    f"col {c}: MISMATCH e.g. rows {bad.tolist()} "
                    f"spark={sv.iloc[bad].tolist()} oracle={ov.iloc[bad].tolist()}"
                )
    return errs


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("check_correctness")
    con = duckdb.connect()
    # let the heaviest oracles (unrolled per-cell k-means chains at
    # sf1) spill instead of dying on the in-memory default — round 9:
    # this is what lets semantic_dedup_two_level replay at sf1
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET max_temp_directory_size='60GiB'")
    for t in TABLES:
        # Spark-written tables are DIRECTORIES named *.parquet (the
        # generated sf1 set) — DuckDB needs the inner-file glob there
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            release_pins()
            continue
        t1 = time.time()
        release_pins()  # drop this query's pinned blocks before the next
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {t1-t0:.1f}s, no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            # CLOSE counts as failure too: the driver hashes exact
            # values, so anything not bit-identical will not match
            label = "CLOSE" if all("CLOSE" in e for e in errs) else "FAIL "
            print(f"{label} {name} ({len(sdf)} rows, {t1-t0:.1f}s)")
            for e in errs:
                print(f"      - {e}")
            n_fail += 1
        else:
            print(f"OK    {name} ({len(sdf)} rows, {t1-t0:.1f}s)")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
