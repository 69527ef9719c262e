"""Deterministic sampling & splitting for training-data pipelines.

A 100 TB corpus can't be split with ``rand()`` — re-runs must land every
row in the same split (reproducibility, incremental re-processing, and
leak-free train/test boundaries across pipeline versions).  Everything
here derives from an md5 hash of a stable key, the only hash portable
across Spark / DuckDB / Python (see workload oracle parity):

- :func:`hash_bucket` — uniform integer bucket in [0, 10^6).
- :func:`hash_split` — named train/val/test assignment by cumulative
  weight boundaries on that bucket.
- :func:`stratified_sample` — per-stratum keep-fractions via the same
  bucket threshold; deterministic analog of ``DataFrame.sampleBy``.

All are pure column expressions: no shuffle, no UDF, fully pushdown-
transparent — the split column costs one md5 per row in-scan.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000  # bucket space; weights quantized to parts-per-million


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, PPM): first 15 hex digits of
    md5(salt || key) mod PPM.  15 hex digits fit a long exactly
    (DuckDB: ``CAST('0x'||substr(md5(..),1,15) AS BIGINT) % 1000000``)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % PPM).alias("bucket")


def sql_hash_bucket(key_expr: str, salt: str = "") -> str:
    """DuckDB expression computing the identical bucket."""
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST(({key_expr}) AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {PPM}"
    )


def _boundaries(weights: Dict[str, float]) -> Sequence[Tuple[str, int]]:
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out = []
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        out.append((name, min(PPM, round(acc * PPM))))
    out[-1] = (out[-1][0], PPM)  # close the last interval exactly
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash of ``key_col``.

    Weights are normalized and quantized to ppm, so e.g.
    ``{"train": 0.9, "val": 0.05, "test": 0.05}`` puts buckets
    [0, 900000) → train, [900000, 950000) → val, rest → test.  Keying on
    a *document* id (not a row id) keeps all shards/chunks of one
    document in one split — the standard leakage guard.
    """
    b = hash_bucket(F.col(key_col), salt)
    expr: Column | None = None
    for name, hi in _boundaries(weights)[:-1]:
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = list(weights)[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def sql_hash_split(key_expr: str, weights: Dict[str, float], salt: str = "split") -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`."""
    b = sql_hash_bucket(key_expr, salt)
    parts = [f"CASE"]
    for name, hi in _boundaries(weights)[:-1]:
        parts.append(f"WHEN ({b}) < {hi} THEN '{name}'")
    parts.append(f"ELSE '{list(weights)[-1]}' END")
    return " ".join(parts)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: Dict[str, float],
    key_col: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's
    fraction — a deterministic, re-run-stable ``sampleBy``.  Strata not
    listed keep ``default_fraction``.  One md5 per row, no shuffle; the
    filter pushes into the scan."""
    b = hash_bucket(F.col(key_col), salt)
    thr: Column | None = None
    for stratum, frac in fractions.items():
        cond = F.col(stratum_col) == stratum
        lim = F.lit(int(round(frac * PPM)))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    thr = (
        F.lit(int(round(default_fraction * PPM)))
        if thr is None
        else thr.otherwise(int(round(default_fraction * PPM)))
    )
    return df.filter(b < thr)


def sql_stratified_sample_pred(
    stratum_expr: str,
    fractions: Dict[str, float],
    key_expr: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB predicate mirroring :func:`stratified_sample`."""
    b = sql_hash_bucket(key_expr, salt)
    cases = ["CASE"]
    for stratum, frac in fractions.items():
        cases.append(f"WHEN ({stratum_expr}) = '{stratum}' THEN {int(round(frac * PPM))}")
    cases.append(f"ELSE {int(round(default_fraction * PPM))} END")
    return f"({b}) < ({' '.join(cases)})"
