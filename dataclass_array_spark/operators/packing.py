"""Sequence packing: place a token stream into fixed-size context
windows (the GPT-style "concatenate everything, chop every B tokens"
layout used to build LLM training batches).

The primitive is a GLOBAL running sum of per-document token counts in a
deterministic document order.  A naive window
``sum() OVER (ORDER BY k)`` collapses to a single partition — unusable
past one executor — so :func:`global_cumsum` does the classic two-phase
scan instead:

1. range-repartition + sort by the order key (one shuffle — the same
   one any global ordering needs),
2. per-partition partial sums (tiny |partitions|-row collect),
3. broadcast the prefix offsets and window only WITHIN partitions.

The within-partition window does re-cluster by partition id (Catalyst
can't see that ``spark_partition_id()`` is already the physical
clustering), but that exchange moves each row once and every partition
stays bounded — there is never a single-reducer stage.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    pin: str = "local",
) -> DataFrame:
    """Running sum of ``value_col`` over the global ``order_col`` order
    (inclusive of the current row), without a single-partition sort.

    The repartitioned+sorted frame is checkpoint-pinned before the
    per-partition sums are collected: RangePartitioner samples its
    boundaries with an RDD-id-derived seed, so re-executing the plan for
    the output job could otherwise land rows in DIFFERENT partitions
    than the offsets job saw once partitions exceed the reservoir sample
    size — silent mis-offsets at scale.  The pin guarantees one
    materialization that both jobs share; ``pin="local"`` (fast,
    executor-memory) vs ``"reliable"`` (checkpoint dir, survives
    executor loss) — see :func:`~dataclass_array_spark.core.table
    .pin_materialization` for the failure-domain tradeoff."""
    from dataclass_array_spark.core.table import pin_materialization

    df = pin_materialization(
        df.repartitionByRange(order_col).sortWithinPartitions(order_col), pin
    )
    with_pid = df.withColumn("__pid", F.spark_partition_id())
    parts = (
        with_pid.groupBy("__pid")
        .agg(F.sum(F.col(value_col)).alias("s"))
        .collect()
    )
    sums = {r["__pid"]: r["s"] for r in parts}
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    spark = df.sparkSession
    offs = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "__pid int, __off long",
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_pid.join(F.broadcast(offs), on="__pid")
        .withColumn(out_col, (F.sum(F.col(value_col)).over(w) + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    block_size: int,
    order_col: Optional[str] = None,
    pin: str = "local",
) -> DataFrame:
    """Concat-and-chop packing plan: documents in ``order_col`` order
    form one token stream, chopped every ``block_size`` tokens.

    Returns one row per document with its placement:
    ``start_tok`` (global offset of the doc's first token),
    ``start_block`` / ``end_block`` (context windows the doc touches),
    ``start_off`` (offset within the start block), and ``n_blocks``.
    Downstream shard writers group by ``start_block`` to emit batches;
    a doc spanning blocks is the (documented) continuation case.
    """
    order_col = order_col or id_col
    cum = global_cumsum(df, order_col, size_col, out_col="__cum", pin=pin)
    start = (F.col("__cum") - F.col(size_col)).alias("start_tok")
    bs = F.lit(int(block_size))
    return cum.select(
        F.col(id_col),
        F.col(size_col),
        start,
        F.call_function("div", F.col("__cum") - F.col(size_col), bs).alias("start_block"),
        ((F.col("__cum") - F.col(size_col)) % bs).alias("start_off"),
        F.call_function(
            "div",
            F.when(F.col(size_col) > 0, F.col("__cum") - 1).otherwise(
                F.col("__cum") - F.col(size_col)
            ),
            bs,
        ).alias("end_block"),
    ).withColumn("n_blocks", F.col("end_block") - F.col("start_block") + F.lit(1))
