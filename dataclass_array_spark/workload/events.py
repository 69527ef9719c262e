"""Event-stream queries (batch side): as-of join, gap sessionization,
JSON extraction, tumbling-window aggregation.  The streaming module runs
the same logic incrementally; these batch forms are the oracle-checkable
equivalents.

Cross-engine determinism: events carry nanosecond timestamps; all time
arithmetic, ordering, and outputs here use exact integer MICROsecond
longs (``ts_us`` / DuckDB ``epoch_us``) so both engines truncate ns the
same way and no float/timestamp precision can diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclass_array_spark.operators.asof import asof_join
from dataclass_array_spark.operators.sessionize import sessionize
from dataclass_array_spark.workload.base import dsum, load_tables, sql_dsum
from dataclass_array_spark.workload.catalog import Query


# ------------------------------------------------ as-of join
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click strictly before
    it.  union+window formulation: one shuffle on user_id (operators.asof
    — the 100 TB-safe plan; no unbounded theta-join fan-out)."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_us").alias("click_us"),
        F.col("value").alias("click_value"),
        "event_id",
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts_us",
        right_ts="click_us",
        right_payload=["click_us", "click_value"],
        tiebreak="event_id",
        strict=True,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.col("asof_click_us").alias("last_click_us"),
        F.col("asof_click_value").alias("last_click_value"),
    ).orderBy("event_id")


ASOF_SQL = """
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.value,
       (SELECT epoch_us(c.ts) FROM events c
         WHERE c.user_id = e.user_id AND c.event_type = 'click'
           AND epoch_us(c.ts) < epoch_us(e.ts)
         ORDER BY epoch_us(c.ts) DESC, c.event_id DESC LIMIT 1) AS last_click_us,
       (SELECT c.value FROM events c
         WHERE c.user_id = e.user_id AND c.event_type = 'click'
           AND epoch_us(c.ts) < epoch_us(e.ts)
         ORDER BY epoch_us(c.ts) DESC, c.event_id DESC LIMIT 1) AS last_click_value
FROM events e
WHERE e.event_type = 'purchase'
ORDER BY e.event_id
"""


# ------------------------------------------------ sessionization
_GAP_US = 1800 * 1_000_000  # 30 min in micros


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (30 min), then per-session rollup.
    Batch analog of streaming session_window; integer-exact gap math."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    s = sessionize(e, key="user_id", ts="ts_us", gap=_GAP_US, order_tiebreak="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value"), "sum_value"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT user_id, ts_us, event_id, value,
         CASE WHEN LAG(ts_us) OVER w IS NULL
                   OR ts_us - LAG(ts_us) OVER w > {_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), numbered AS (
  SELECT user_id, ts_us, value,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       {sql_dsum('value', 'sum_value')},
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
FROM numbered GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


# ------------------------------------------------ JSON extraction
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: props is a JSON string column."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


JSON_SQL = """
SELECT event_type,
       COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type ORDER BY event_type
"""


# ------------------------------------------------ tumbling window agg
_HOUR_US = 3600 * 1_000_000


def tumbling_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling windows per event type — identical semantics to
    streaming ``F.window(ts, '1 hour')``; window start expressed as epoch
    micros (integer floor) so the oracle matches exactly."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    win = (F.col("ts_us") - F.col("ts_us") % _HOUR_US).alias("window_start_us")
    return (
        e.groupBy(win, "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "sum_value"))
        .orderBy("window_start_us", "event_type")
    )


TUMBLING_SQL = f"""
SELECT epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS window_start_us, event_type,
       COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "asof_purchase_last_click": Query(asof_purchase_last_click, ASOF_SQL, tags=("asof", "join")),
    "sessionize_events": Query(sessionize_events, SESSIONIZE_SQL, tags=("window", "session")),
    "json_extract_props": Query(json_extract_props, JSON_SQL, tags=("scalar", "json")),
    "tumbling_hourly_stats": Query(tumbling_hourly_stats, TUMBLING_SQL, tags=("window", "agg")),
}


# ------------------------------------------------ sliding window agg
_SLIDE_US = 1800 * 1_000_000  # 30-min slide over 1-hour windows


def sliding_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min (batch form of streaming
    sliding windows): each event belongs to exactly 2 windows — built by
    exploding the per-event window list, mirrored with a 2-branch UNION
    in the oracle."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    # window starts covering ts: floor to slide, and that minus one slide
    # when the event is in the second half-hour of the hour-long window
    w0 = F.col("ts_us") - F.col("ts_us") % _SLIDE_US
    wins = F.array(w0, w0 - _SLIDE_US)
    return (
        e.select(F.explode(wins).alias("window_start_us"), "event_type", "value")
        .groupBy("window_start_us", "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "sum_value"))
        .orderBy("window_start_us", "event_type")
    )


SLIDING_SQL = f"""
WITH ex AS (
  SELECT epoch_us(ts) - epoch_us(ts) % {_SLIDE_US} AS w0, event_type, value FROM events
  UNION ALL
  SELECT (epoch_us(ts) - epoch_us(ts) % {_SLIDE_US}) - {_SLIDE_US} AS w0, event_type, value FROM events
)
SELECT w0 AS window_start_us, event_type,
       COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
FROM ex GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["sliding_hourly_stats"] = Query(sliding_hourly_stats, SLIDING_SQL, tags=("window", "agg"))
