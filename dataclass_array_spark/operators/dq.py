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
