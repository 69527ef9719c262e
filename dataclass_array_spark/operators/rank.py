"""Scalable exact per-group rank / ntile — window-function semantics
without the window's single-task-per-group sort.

``Window.partitionBy(g).orderBy(...)`` sorts EVERY row of group ``g``
on ONE task; for low-cardinality groups (language, returnflag) that is
a corpus-sized single-task sort at 100 TB — the same shape
``build_vocab`` and ``packing.global_cumsum`` replaced with the
two-phase trick.  This module generalizes it to grouped ranking:

1. ``repartitionByRange(group, *order)`` + ``sortWithinPartitions`` —
   a RANGE partitioning, so each partition holds a contiguous run of
   the global (group, order) order and sorting is parallel;
2. checkpoint-pin the sorted frame (RangePartitioner re-seeds its
   boundary sample per execution — the ``global_cumsum`` discipline;
   see that docstring for the failure mode);
3. collect per-(partition, group) counts — DRIVER STATE IS
   partitions × live-groups-per-partition rows; since a range
   partition holds contiguous groups, that is ≤ partitions + groups
   rows total, NOT partitions × groups (each partition adds at most
   one partial group beyond the groups it fully contains);
4. per-group offsets by prefix-summing counts in partition order
   (driver, bounded), broadcast back;
5. rank = offset + row_number within (partition, group) — the window
   partitions by ``spark_partition_id()`` AND the group, so it is
   per-task parallel and never re-shuffles.

``grouped_ntile`` derives NTILE(n) from (rank, group count) with the
standard uneven-division rule (the first ``count mod n`` tiles get one
extra row) — value-identical to ``F.ntile`` over a fully tie-broken
ORDER BY (differential-tested), but scale-safe.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grouped_rank", "grouped_ntile"]


def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    out_col: str = "rank",
    pin: str = "local",
) -> DataFrame:
    """1-based rank of each row within its ``group_col`` group under
    the total ``order_cols`` order (callers must pass a FULLY
    tie-broken ordering — include a unique key last) — without a
    per-group single-task sort.  Appends ``out_col`` (long)."""
    from dataclass_array_spark.core.table import pin_materialization

    cols = [group_col, *order_cols]
    sorted_df = pin_materialization(
        df.repartitionByRange(*cols).sortWithinPartitions(*cols), pin
    )
    with_pid = sorted_df.withColumn("__pid", F.spark_partition_id())
    parts = (
        with_pid.groupBy("__pid", group_col)
        .agg(F.count("*").alias("c"))
        .collect()
    )
    # per-group prefix sums in partition order (range partitioning
    # makes partition order == global order)
    by_group: dict = {}
    offsets: List[tuple] = []
    for r in sorted(parts, key=lambda r: r["__pid"]):
        g = r[group_col]
        offsets.append((int(r["__pid"]), g, by_group.get(g, 0)))
        by_group[g] = by_group.get(g, 0) + r["c"]
    spark = df.sparkSession
    schema_g = dict(df.dtypes)[group_col]
    offs = spark.createDataFrame(
        offsets or [(0, None, 0)],
        f"__pid int, {group_col} {schema_g}, __off long",
    )
    w = Window.partitionBy("__pid", group_col).orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offs), ["__pid", group_col], "left")
        .withColumn(
            out_col,
            (F.coalesce(F.col("__off"), F.lit(0)) + F.row_number().over(w))
            .cast("long"),
        )
        .drop("__pid", "__off")
    )


def grouped_ntile(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    n: int,
    out_col: str = "bucket",
    pin: str = "local",
) -> DataFrame:
    """NTILE(``n``) within each group under a fully tie-broken order —
    value-identical to ``F.ntile(n).over(Window.partitionBy(group)
    .orderBy(...))`` but without the single-task-per-group sort.

    NTILE rule: with count c, q = c div n, r = c mod n, the first r
    tiles hold q+1 rows; rank → tile is the closed form
    ``ceil(rank/(q+1))`` inside the first ``r·(q+1)`` ranks, else
    ``r + ceil((rank − r·(q+1))/q)`` (q = 0 only when c < n, where
    every rank falls in the first branch)."""
    if n < 1:
        raise ValueError("grouped_ntile: n must be >= 1")
    ranked = grouped_rank(df, group_col, order_cols, "__rank", pin)
    counts = ranked.groupBy(group_col).agg(F.count("*").alias("__c"))
    q = F.floor(F.col("__c") / F.lit(n)).cast("long")
    r = (F.col("__c") % F.lit(n)).cast("long")
    head = r * (q + F.lit(1))
    rank = F.col("__rank")
    bucket = F.when(
        rank <= head,
        F.ceil(rank / (q + F.lit(1))),
    ).otherwise(r + F.ceil((rank - head) / q))
    # counts is group-cardinality-sized — bounded for the ntile use
    # case (low-cardinality groups are exactly when this operator is
    # needed); the join back is a broadcast
    return (
        ranked.join(F.broadcast(counts), group_col)
        .withColumn(out_col, bucket.cast("long"))
        .drop("__rank", "__c")
    )
