"""Data-quality validation (the Deequ-style check family): declare
per-table checks — completeness, uniqueness, value ranges — plus
cross-table referential integrity, and get back one small
``(check, observed, passed)`` report frame.

Plan shape: every single-table metric is an aggregate over ONE shared
scan (all metrics ride the same partial-aggregation pass — adding a
check adds a column, not a job); the report explodes the 1-row
aggregate into check rows.  Referential checks are a left-anti join
(child keys that miss the parent) counted — broadcastable when the
parent's key set is dimension-sized, hash-partitioned otherwise; never
a full materialization of violations unless asked.

All observed values are exact integers (counts), so the DuckDB oracle
is trivially value-exact.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_metrics(df: DataFrame, metrics: Dict[str, Column]) -> DataFrame:
    """One aggregation pass over ``df`` computing every metric Column
    (each must aggregate to a numeric), exploded to
    ``(check, observed)`` rows.  Metric columns are cast to long."""
    agg = df.agg(
        *[m.cast("long").alias(name) for name, m in metrics.items()]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"), F.col(name).alias("observed")
            )
            for name in metrics
        ]
    )
    return agg.select(F.explode(pairs).alias("p")).select(
        F.col("p.check").alias("check"), F.col("p.observed").alias("observed")
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, check: str
) -> DataFrame:
    """``(check, observed)`` where observed = number of child rows whose
    non-null foreign key has no parent (left-anti join, counted)."""
    orphans = (
        child.filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti")
        .count()
    )
    spark = child.sparkSession
    return spark.createDataFrame(
        [(check, int(orphans))], "check string, observed long"
    )


def dq_report(*parts: DataFrame, zero_ok: "tuple[str, ...]" = ()) -> DataFrame:
    """Union metric frames into the final report with a pass flag:
    a check passes when observed == 0, except the names in ``zero_ok``
    (presence checks like row_count) which pass when observed > 0."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    ok = F.col("check").isin(*zero_ok) if zero_ok else F.lit(False)
    return out.select(
        "check",
        "observed",
        F.when(ok, F.col("observed") > 0)
        .otherwise(F.col("observed") == 0)
        .alias("passed"),
    ).orderBy("check")


def profile_columns(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Column profiler: one aggregation pass over ``df`` producing a
    ``(col, n_rows, n_nulls, n_distinct, min_v, max_v)`` row per
    column.  min/max are normalized to exact longs by dtype — integers
    as-is, doubles floor-scaled ×1e6, timestamps as epoch micros,
    strings NULL (lexicographic extremes are a separate string-typed
    concern) — so the report is value-exact cross-engine.  The
    distinct counts share the single pass (Catalyst expands the scan
    once per distinct aggregate, still one shuffle stage)."""
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampType,
        TimestampNTZType,
    )

    def scaled(c: str):
        t = df.schema[c].dataType
        col = F.col(c)
        if isinstance(t, (IntegerType, LongType, ShortType)):
            return F.min(col).cast("long"), F.max(col).cast("long")
        if isinstance(t, (DoubleType, FloatType)):
            return (
                F.floor(F.min(col) * 1e6).cast("long"),
                F.floor(F.max(col) * 1e6).cast("long"),
            )
        if isinstance(t, (TimestampType, TimestampNTZType)):
            # NTZ needs a cast first (session TZ is pinned UTC, so the
            # cast is a pure reinterpretation — same epoch both engines)
            return (
                F.unix_micros(F.min(col).cast("timestamp")).cast("long"),
                F.unix_micros(F.max(col).cast("timestamp")).cast("long"),
            )
        if isinstance(t, StringType):
            return F.lit(None).cast("long"), F.lit(None).cast("long")
        raise ValueError(f"profile_columns: unsupported dtype {t} for {c}")

    aggs = [F.count("*").alias("__n")]
    for c in cols:
        mn, mx = scaled(c)
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            mn.alias(f"{c}__mn"),
            mx.alias(f"{c}__mx"),
        ]
    agg = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_v"),
                F.col(f"{c}__mx").alias("max_v"),
            )
            for c in cols
        ]
    )
    return (
        agg.select(F.explode(rows).alias("p"))
        .select("p.col", "p.n_rows", "p.n_nulls", "p.n_distinct", "p.min_v", "p.max_v")
        .orderBy("col")
    )
