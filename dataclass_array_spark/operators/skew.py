"""Skew-mitigation primitives.

``salted_agg``: two-stage aggregation for hot grouping keys — stage 1
aggregates on (key, salt) spreading a hot key over N reducers, stage 2
combines the partials.  Results are identical to a plain groupBy for any
algebraic aggregate (sum/count/min/max); use it when one key owns a
double-digit percent of the rows and AQE's skew handling isn't enough
(AQE splits skewed JOIN partitions, not aggregation state).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_exprs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum…) in two salted stages.

    ``sum_exprs``: alias → column to sum (decimal-cast upstream if
    cross-engine exactness matters; decimal/long sums are association-
    safe so the two-stage split cannot change results).
    """
    salt = (F.spark_partition_id() % n_salts).alias("__salt")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[F.sum(c).alias(f"__p_{a}") for a, c in sum_exprs.items()],
            F.count("*").alias("__p_n"),
        )
    )
    return (
        stage1.groupBy(*keys)
        .agg(
            *[F.sum(f"__p_{a}").alias(a) for a in sum_exprs],
            F.sum("__p_n").alias("n_rows"),
        )
    )
