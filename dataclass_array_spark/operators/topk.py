"""Top-K per group — window row_number, the shuffle-minimal formulation
(one hash shuffle on the group key; Spark pushes the rank filter into the
window via the WindowGroupLimit physical optimization, so each partition
keeps only K rows before the final filter)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the top-``k`` rows per group.  ``order`` must be a total order
    (include a unique tiebreak column) for deterministic results."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
