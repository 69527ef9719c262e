"""MERGE/upsert emulation (SURVEY §2.B / guide "CDC/SCD2" row).

Without a transactional table format (Delta/Iceberg jars absent), MERGE
INTO is emulated exactly as the guide prescribes: updates ∪ (target
anti-join updates).  ``scd2_close`` adds the slowly-changing-dimension
variant: old versions are kept but closed with an end-marker.

Scale: one shuffle on the merge key for the anti join (broadcast when
the update set is small — the common CDC case).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str], broadcast_updates: bool = True) -> DataFrame:
    """MERGE semantics: rows from ``updates`` win; unmatched target rows
    survive.  Schemas must align by name."""
    upd = updates.select(*target.columns)
    anti = target.join(
        F.broadcast(upd.select(*keys)) if broadcast_updates else upd.select(*keys),
        on=list(keys),
        how="left_anti",
    )
    return anti.unionByName(upd)


def scd2_close(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str = "version",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD-2: matched target rows are kept but closed
    (``is_current=false``); updates come in as the new current version
    (previous max version + 1 per key)."""
    upd_keys = updates.select(*keys).distinct()
    maxv = target.groupBy(*keys).agg(F.max(version_col).alias("__maxv"))
    closed = (
        target.join(F.broadcast(upd_keys), on=list(keys), how="left_semi")
        .withColumn(current_col, F.lit(False))
    )
    untouched = target.join(F.broadcast(upd_keys), on=list(keys), how="left_anti")
    fresh = (
        updates.join(F.broadcast(maxv), on=list(keys), how="left")
        .withColumn(version_col, F.coalesce(F.col("__maxv") + 1, F.lit(1)).cast("long"))
        .withColumn(current_col, F.lit(True))
        .drop("__maxv")
    )
    return untouched.unionByName(closed).unionByName(fresh.select(*target.columns))
