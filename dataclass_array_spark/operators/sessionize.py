"""Gap-based sessionization (batch analog of streaming session windows).

Classic two-window formulation: ``lag(ts)`` per key to detect gaps, then
a running sum of gap flags numbers the sessions.  One shuffle on the key;
both windows share the same (key, ts) sort so Spark evaluates them in a
single Window exec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Adds a ``session_id`` column (1-based, per key, in time order).

    ``ts`` may be a TimestampType column (``gap`` in seconds; converted
    to exact integer micros internally) or any numeric column (``gap``
    in the column's own units, integer-exact — no float drift).
    """
    if isinstance(df.schema[ts].dataType, T.TimestampType):
        tcol = F.unix_micros(F.col(ts))
        gap_units = int(gap) * 1_000_000
    else:
        tcol = F.col(ts)
        gap_units = int(gap)
    order = [tcol] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(tcol).over(w)
    new_session = F.when(prev.isNull() | ((tcol - prev) > gap_units), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
