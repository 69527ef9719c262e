"""As-of join — Spark lacks a native one (SURVEY.md §2.B).

Strategy (the scale path, not the pd.merge_asof fallback): tag both
sides, UNION them, and carry the most recent right-side payload forward
with a single window over (key, time).  Cost = ONE shuffle on the join
key + a per-partition sort — the same cost as any equi-join on that key,
and immune to the unbounded fan-out a naive ``ts_left >= ts_right``
theta-join would produce.

At 100 TB: partition count follows spark.sql.shuffle.partitions/AQE;
skewed keys are split by AQE skew handling since this is a plain window
shuffle, not a join build side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    tiebreak: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (``<`` when ``strict``) within the same
    ``on`` key.  Right payload columns come back null when no match.

    ``tiebreak``: extra right-side ordering column so equal timestamps
    resolve deterministically (last one wins).
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
        F.lit(None).cast("long").alias("__tb"),
    )
    tb = F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(tagged_l.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        tb.alias("__tb"),
    )
    u = tagged_l.unionByName(tagged_r)
    # Order: time, then right-before-left at equal time unless strict
    # (so a right row at exactly left_ts is visible iff not strict),
    # then the tiebreak.
    order = [F.col("__t"), F.col("__is_left") if not strict else (1 - F.col("__is_left")), F.col("__tb")]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = [
        F.last(F.when(F.col("__is_left") == 0, F.col(f"__r_{c}")), ignorenulls=True)
        .over(w)
        .alias(f"__c_{c}")
        for c in right_payload
    ]
    out = (
        u.select("*", *carried)
        .filter(F.col("__is_left") == 1)
        .select(
            *[F.col(f"__l.{c}").alias(c) for c in lcols],
            *[F.col(f"__c_{c}").alias(f"asof_{c}") for c in right_payload],
        )
    )
    return out
