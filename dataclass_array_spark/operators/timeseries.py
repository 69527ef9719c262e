"""Per-key time-series folds that need RECURRENCE semantics (each step
depends on the previous state) — the shape window frames cannot express
and ``aggregate`` folds can: EWMA smoothing.

Exactness: the fold is a sequential left-to-right double recurrence
over the key's events in ``(ts, id)`` order — ``F.aggregate`` over a
``sort_array(collect_list(...))`` in Spark ≡ ``list_reduce`` over a
``list(... ORDER BY ...)`` in DuckDB, the same fold-order recipe every
other ordered sum in this repo uses, so results are bit-identical
cross-engine.

Scale shape: one shuffle on the key; each key's events materialize as
ONE array row (the sessionize/gap-fill bound — per-user event counts,
not corpus size).  A key with pathological event counts would need the
two-level sub-bucket fold ``pagerank`` uses — but a RECURRENCE cannot
be split associatively, so extreme per-key histories should be
windowed upstream (e.g. EWMA per (user, month)) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_last(
    df: DataFrame,
    key_col: str,
    order_cols: "list[str]",
    value_col: str,
    alpha: float = 0.25,
) -> DataFrame:
    """Final EWMA state per key → ``(key, n_events, ewma)``:
    ``s_0 = x_0``, ``s_i = α·x_i + (1−α)·s_{i−1}`` over the key's
    non-NULL values in ``order_cols`` order (NULL values are excluded
    on both engines — a NULL would otherwise poison the recurrence)."""
    a, b = float(alpha), 1.0 - float(alpha)
    ev = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col),
        F.struct(
            *[F.col(c) for c in order_cols], F.col(value_col).alias("_v")
        ).alias("_s"),
    )
    fold = F.aggregate(
        F.sort_array(F.collect_list("_s")),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["_v"]).otherwise(
            F.lit(a) * x["_v"] + F.lit(b) * acc
        ),
    )
    return (
        ev.groupBy(key_col)
        .agg(F.count("*").cast("long").alias("n_events"), fold.alias("ewma"))
        .orderBy(key_col)
    )


def ewma_last_sql(
    table: str,
    key_col: str,
    order_cols: "list[str]",
    value_col: str,
    alpha: float = 0.25,
) -> str:
    """DuckDB oracle for :func:`ewma_last` (same fold order; constants
    string-cast — DuckDB parses decimal-point literals as DECIMAL,
    whose arithmetic diverges from doubles).

    The ORDER BY appends ``value_col`` after ``order_cols``: the Spark
    side sorts ``struct(order_cols..., _v)``, which tie-breaks equal
    order keys by value, while DuckDB's ``list(... ORDER BY oc)`` tie
    order is otherwise unspecified — without the explicit tie-break the
    bit-identical contract would silently require ``order_cols`` to be
    a unique key per group."""
    a = f"CAST('{float(alpha)!r}' AS DOUBLE)"
    b = f"CAST('{1.0 - float(alpha)!r}' AS DOUBLE)"
    oc = ", ".join(order_cols)
    return f"""
SELECT {key_col}, CAST(COUNT(*) AS BIGINT) AS n_events,
       list_reduce(
         list_prepend(CAST(NULL AS DOUBLE), list({value_col} ORDER BY {oc}, {value_col})),
         (acc, x) -> CASE WHEN acc IS NULL THEN x ELSE {a} * x + {b} * acc END
       ) AS ewma
FROM {table}
WHERE {value_col} IS NOT NULL
GROUP BY {key_col} ORDER BY {key_col}"""
