"""Oracle-checked STREAMING queries: each runs a real Structured
Streaming job (file source → memory sink, driven to completion) and
returns the result as a batch DataFrame the driver can compare against
the DuckDB oracle.  Complete output mode so every window is emitted
(append mode's watermark-finalization semantics are exercised in
tests/test_streaming.py instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclass_array_spark.streaming import (
    dedup_within_watermark,
    events_stream,
    purchases_with_recent_clicks,
    run_stream_to_memory,
    session_window_stats,
    tumbling_counts,
)
from dataclass_array_spark.workload.base import fresh_stream_tmpdir, sql_dsum
from dataclass_array_spark.workload.catalog import Query

_HOUR_US = 3600 * 1_000_000
_GAP_US = 1800 * 1_000_000


def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, f"{sf_dir}/events.parquet")
    out, _ = run_stream_to_memory(tumbling_counts(s, "1 hour"), mode="complete")
    return out.orderBy("window_start_us", "event_type")


STREAM_TUMBLING_SQL = f"""
SELECT epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS window_start_us, event_type,
       COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window semantics: an event at exactly
    last_ts + gap starts a NEW session (half-open [start, last+gap)),
    and the reported end is last_ts + gap — mirrored in the oracle."""
    s = events_stream(spark, f"{sf_dir}/events.parquet")
    out, _ = run_stream_to_memory(session_window_stats(s, "30 minutes"), mode="complete")
    return out.orderBy("user_id", "start_us")


STREAM_SESSION_SQL = f"""
WITH base AS (
  SELECT user_id, value, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT user_id, ts_us, value,
         CASE WHEN LAG(ts_us) OVER w IS NULL
                   OR ts_us - LAG(ts_us) OVER w >= {_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
), numbered AS (
  SELECT user_id, ts_us, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) + {_GAP_US} AS end_us,
       COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
FROM numbered GROUP BY user_id, sid ORDER BY user_id, start_us
"""


QUERIES = {
    "streaming_tumbling_hourly": Query(
        streaming_tumbling_hourly, STREAM_TUMBLING_SQL, tags=("streaming", "window")
    ),
    "streaming_session_windows": Query(
        streaming_session_windows, STREAM_SESSION_SQL, tags=("streaming", "session")
    ),
}


def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: collapse per-(user, type, hour) key
    re-occurrences with dropDuplicatesWithinWatermark (2 h delay > the
    1 h key bucket width, so the distinct-key output is deterministic
    regardless of micro-batch boundaries).  Only the keys are emitted —
    which physical row survives is arrival-order-dependent and must not
    leak into the oracle comparison."""
    s = events_stream(spark, f"{sf_dir}/events.parquet")
    keyed = s.withColumn(
        "window_start_us", F.col("ts_us") - F.col("ts_us") % _HOUR_US
    )
    d = dedup_within_watermark(
        keyed, ["user_id", "event_type", "window_start_us"], "ts", "2 hours"
    )
    out, _ = run_stream_to_memory(
        d.select("user_id", "event_type", "window_start_us"), mode="append"
    )
    return out.orderBy("user_id", "event_type", "window_start_us")


STREAM_DEDUP_SQL = f"""
SELECT DISTINCT user_id, event_type,
       epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS window_start_us
FROM events ORDER BY 1, 2, 3
"""

QUERIES["streaming_dedup_events"] = Query(
    streaming_dedup_events, STREAM_DEDUP_SQL, tags=("streaming", "dedup")
)


def streaming_purchase_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchases x preceding clicks within
    30 min, both sides watermarked so click state is evicted).  Inner
    joins emit eagerly, so append mode over the finite file source
    yields the complete batch-equivalent match set."""
    s = events_stream(spark, f"{sf_dir}/events.parquet")
    joined = purchases_with_recent_clicks(s, join_window="30 minutes")
    out, _ = run_stream_to_memory(
        joined.select(
            "p_id",
            "c_id",
            F.col("p_user").alias("user_id"),
            F.unix_micros("p_ts").alias("p_ts_us"),
            F.unix_micros("c_ts").alias("c_ts_us"),
        ),
        mode="append",
    )
    return out.orderBy("p_id", "c_id")


_JOIN_US = 1800 * 1_000_000

STREAM_JOIN_SQL = f"""
SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id AS user_id,
       epoch_us(p.ts) AS p_ts_us, epoch_us(c.ts) AS c_ts_us
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND epoch_us(c.ts) >= epoch_us(p.ts) - {_JOIN_US}
 AND epoch_us(c.ts) < epoch_us(p.ts)
ORDER BY p_id, c_id
"""

QUERIES["streaming_purchase_clicks"] = Query(
    streaming_purchase_clicks, STREAM_JOIN_SQL, tags=("streaming", "join")
)


def streaming_decontam_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch decontamination over a document stream: each
    micro-batch of incoming docs is scored by the audited BATCH n-gram
    overlap operator against the static broadcast eval set, so the
    accumulated streaming output equals the batch result exactly (the
    oracle is the same SQL as the batch decontam gate)."""
    from dataclass_array_spark.streaming import decontaminate_stream, documents_stream
    from dataclass_array_spark.workload.base import load_tables
    from dataclass_array_spark.workload.llm2 import (
        _DECONTAM_K,
        _DECONTAM_THRESH,
        _EVAL_MOD,
    )

    ev = (
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .filter(F.col("doc_id") % _EVAL_MOD == 0)
    )
    s = documents_stream(spark, f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % _EVAL_MOD != 0
    )
    # Deterministic per-(sf, pid) tmp root, wiped up front — the full
    # recycle/concurrency rationale lives on base.fresh_stream_tmpdir.
    tmp = fresh_stream_tmpdir("decontam", sf_dir)
    out = decontaminate_stream(
        s, ev, "text", "doc_id",
        output_dir=f"{tmp}/out", checkpoint_dir=f"{tmp}/ckpt",
        k=_DECONTAM_K, threshold=_DECONTAM_THRESH,
    )
    return out.orderBy("doc_id")


def _streaming_decontam_oracle() -> str:
    from dataclass_array_spark.workload.llm2 import DECONTAM_SQL

    return DECONTAM_SQL


QUERIES["streaming_decontam_docs"] = Query(
    streaming_decontam_docs, _streaming_decontam_oracle(), tags=("streaming", "decontam")
)


def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch incremental dedup over a stream of NEW documents
    vs the static store: every micro-batch reuses the audited batch
    dedup_incremental (no bucket cap — per-doc flags depend only on
    (doc, store), so the accumulated output equals the one-shot batch
    result regardless of micro-batch boundaries; the oracle is the
    batch incremental SQL without the cap)."""
    from dataclass_array_spark.streaming import (
        documents_stream,
        incremental_dedup_stream,
    )
    from dataclass_array_spark.workload.base import load_tables
    from dataclass_array_spark.workload.llm3 import _INC_MOD, _INC_THRESH

    store = (
        load_tables(spark, sf_dir, ["documents"])["documents"]
        .filter(F.col("doc_id") % _INC_MOD != 0)
    )
    s = documents_stream(spark, f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % _INC_MOD == 0
    )
    tmp = fresh_stream_tmpdir("incdedup", sf_dir)
    out = incremental_dedup_stream(
        s, store, "text", "doc_id",
        output_dir=f"{tmp}/out", checkpoint_dir=f"{tmp}/ckpt",
        n_hashes=16, bands=4, threshold=_INC_THRESH,
    )
    return out.orderBy("doc_id")


def _streaming_inc_oracle() -> str:
    from dataclass_array_spark.workload.llm3 import _inc_sql

    return _inc_sql(cap=None)


QUERIES["streaming_incremental_dedup"] = Query(
    streaming_incremental_dedup, _streaming_inc_oracle(),
    tags=("streaming", "dedup", "incremental"),
)


def streaming_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running totals — the arbitrary-state
    escape hatch, driver-gated: update-mode emits one row per
    (user, batch); the FINAL state per user is the row with the
    maximal (monotone) n_events.  The gate compares the integer event
    counts value-exactly; the float running total is asserted in unit
    tests instead (its per-batch pandas summation order is not
    portable to SQL — an honest limit of float state)."""
    from dataclass_array_spark.streaming import (
        events_stream,
        run_stream_to_memory,
        running_user_totals_stateful,
    )

    s = events_stream(spark, f"{sf_dir}/events.parquet")
    # state_partitions=None: applyInPandasWithState is PYTHON-bound
    # (one Arrow worker per partition), so unlike the JVM stateful
    # operators its wall tracks worker parallelism, not state-store
    # bookkeeping — the round-9 triage measured sf1 at 3.98 s with the
    # session's 32 partitions vs 6.97 s at the narrow streaming
    # default of 8 (PERF.md).
    out, _ = run_stream_to_memory(
        running_user_totals_stateful(s), mode="update", state_partitions=None
    )
    return (
        out.groupBy("user_id")
        .agg(F.max("n_events").cast("long").alias("n_events"))
        .orderBy("user_id")
    )


STREAM_STATEFUL_SQL = """
SELECT user_id, COUNT(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""

QUERIES["streaming_user_totals_stateful"] = Query(
    streaming_user_totals_stateful, STREAM_STATEFUL_SQL,
    tags=("streaming", "stateful"),
)


def streaming_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming sliding windows (1 h width / 30 min slide):
    every event lands in exactly two windows; counts per
    (window_start, event_type)."""
    from dataclass_array_spark.streaming import (
        events_stream,
        run_stream_to_memory,
        sliding_counts,
    )

    s = events_stream(spark, f"{sf_dir}/events.parquet")
    out, _ = run_stream_to_memory(
        sliding_counts(s, "1 hour", "30 minutes"), mode="complete"
    )
    return out.orderBy("window_start_us", "event_type")


_HALF_US = 1800 * 1000000
STREAM_SLIDING_SQL = f"""
WITH starts AS (
  SELECT event_type,
         unnest([epoch_us(ts) - epoch_us(ts) % {_HALF_US},
                 epoch_us(ts) - epoch_us(ts) % {_HALF_US} - {_HALF_US}])
           AS window_start_us
  FROM events
)
SELECT window_start_us, event_type, COUNT(*) AS n
FROM starts GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["streaming_sliding_hourly"] = Query(
    streaming_sliding_hourly, STREAM_SLIDING_SQL,
    tags=("streaming", "window"),
)


def streaming_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch maintained over a DOCUMENT STREAM: each
    micro-batch appends its partial sketch; the cell-summed merge
    equals the one-shot batch sketch exactly (counts are additive, the
    md5-universal hashes deterministic), so the final top-30 estimates
    reuse the BATCH gate's oracle verbatim — a streaming op with a full
    hash-exact oracle, no state store involved."""
    from dataclass_array_spark.operators import text as tx
    from dataclass_array_spark.operators.sketch import countmin_lookup
    from dataclass_array_spark.streaming import countmin_stream, documents_stream
    from dataclass_array_spark.workload.base import load_tables

    s = documents_stream(spark, f"{sf_dir}/documents.parquet").select(
        F.explode(tx.tokens(F.col("text"))).alias("t")
    )
    tmp = fresh_stream_tmpdir("countmin", sf_dir)
    sk = countmin_stream(
        s, "t", output_dir=f"{tmp}/out", checkpoint_dir=f"{tmp}/ckpt",
        depth=4, width=2048,
    )
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    tok = d.select(F.explode(tx.tokens(F.col("text"))).alias("t"))
    top = (
        tok.groupBy("t").agg(F.count("*").cast("long").alias("c_exact"))
        .orderBy(F.desc("c_exact"), "t").limit(30)
    )
    est = countmin_lookup(sk, top.select("t"), "t", depth=4, width=2048)
    return (
        top.join(est, "t")
        .select(
            "t", "c_exact", F.col("est").alias("c_est"),
            (F.col("est") - F.col("c_exact")).cast("long").alias("overcount"),
        )
        .orderBy("t")
    )


def _streaming_countmin_oracle() -> str:
    from dataclass_array_spark.workload.llm2 import _countmin_oracle

    return _countmin_oracle()


QUERIES["streaming_countmin_tokens"] = Query(
    streaming_countmin_tokens, _streaming_countmin_oracle(),
    tags=("streaming", "sketch"),
)


def streaming_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimation maintained over the EVENTS
    STREAM: per-batch (event_type, bucket, max-rho) states MAX-merge
    into exactly the batch sketch, so the estimates reuse the batch
    gate's oracle verbatim — like streaming_countmin_tokens, a
    streaming op with a full hash-exact oracle and no state store."""
    from dataclass_array_spark.operators.sketch import hll_estimate
    from dataclass_array_spark.streaming import events_stream, hll_stream
    from dataclass_array_spark.workload.base import load_tables

    s = events_stream(spark, f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    tmp = fresh_stream_tmpdir("hll", sf_dir)
    state = hll_stream(
        s, ["event_type"], "user_id",
        output_dir=f"{tmp}/out", checkpoint_dir=f"{tmp}/ckpt", b=8,
    )
    est = hll_estimate(state, ["event_type"], b=8)
    e = load_tables(spark, sf_dir, ["events"])["events"]
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return (
        exact.join(est, "event_type")
        .select("event_type", "n_exact", "n_buckets_used", "est")
        .orderBy("event_type")
    )


def _streaming_hll_oracle() -> str:
    from dataclass_array_spark.workload.relational2 import _hll_oracle

    return _hll_oracle()


QUERIES["streaming_hll_users"] = Query(
    streaming_hll_users, _streaming_hll_oracle(), tags=("streaming", "sketch")
)


def streaming_bloom_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter of high-value order keys maintained over the ORDERS
    STREAM (per-batch position tables, DISTINCT-union merge == the
    batch filter), probed with every order key — the batch gate's
    oracle verbatim.  Third of the streaming sketch trio (SUM / MAX /
    set-UNION merges), all state-store-free and replay-idempotent."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import types as T

    from dataclass_array_spark.operators.sketch import bloom_probe
    from dataclass_array_spark.streaming import bloom_stream
    from dataclass_array_spark.streaming.core import _parquet_stream
    from dataclass_array_spark.workload.base import load_tables
    from dataclass_array_spark.workload.relational2 import (
        _BLOOM_BITS,
        _BLOOM_K,
        _BLOOM_PRICE,
    )

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    reader = spark.readStream.schema(o.schema)
    s = (
        _parquet_stream(reader, f"{sf_dir}/orders.parquet")
        .filter(F.col("o_totalprice") > _BLOOM_PRICE)
        .select(F.col("o_orderkey").alias("key"))
    )
    tmp = fresh_stream_tmpdir("bloom", sf_dir)
    bloom = bloom_stream(
        s, "key", output_dir=f"{tmp}/out", checkpoint_dir=f"{tmp}/ckpt",
        n_bits=_BLOOM_BITS, k=_BLOOM_K,
    )
    probes = o.select(F.col("o_orderkey").alias("key")).distinct()
    r = bloom_probe(bloom, probes, "key", n_bits=_BLOOM_BITS, k=_BLOOM_K)
    actual = (
        o.filter(F.col("o_totalprice") > _BLOOM_PRICE)
        .select(F.col("o_orderkey").alias("key"))
        .distinct()
        .withColumn("__in", F.lit(True))
    )
    return (
        r.join(actual, "key", "left")
        .select(
            F.col("key").alias("o_orderkey"),
            "in_bloom",
            F.coalesce(F.col("__in"), F.lit(False)).alias("actually_in"),
            (F.col("in_bloom") & ~F.coalesce(F.col("__in"), F.lit(False))).alias(
                "is_fp"
            ),
        )
        .orderBy("o_orderkey")
    )


def _streaming_bloom_oracle() -> str:
    from dataclass_array_spark.workload.relational2 import _bloom_oracle

    return _bloom_oracle()


QUERIES["streaming_bloom_orders"] = Query(
    streaming_bloom_orders, _streaming_bloom_oracle(),
    tags=("streaming", "sketch"),
)


def streaming_hist_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch maintained over the LINEITEM stream:
    per-batch partial histograms cell-SUM into exactly the batch
    sketch, so the p50/p95 estimates reuse the batch gate's oracle
    verbatim — fourth streamable sketch, no state store.  Bounds come
    from a one-time batch pass (the persisted-bounds contract)."""
    from dataclass_array_spark.operators.sketch import hist_quantiles
    from dataclass_array_spark.streaming import hist_stream
    from dataclass_array_spark.streaming.core import _parquet_stream
    from dataclass_array_spark.workload.base import load_tables
    from dataclass_array_spark.workload.relational2 import _HIST_NB, _HIST_PS

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    r = li.agg(
        F.min(F.col("l_extendedprice").cast("double")),
        F.max(F.col("l_extendedprice").cast("double")),
    ).collect()[0]
    lo, hi = float(r[0]), float(r[1])
    s = _parquet_stream(
        spark.readStream.schema(li.schema), f"{sf_dir}/lineitem.parquet"
    ).select("l_returnflag", "l_extendedprice")
    tmp = fresh_stream_tmpdir("hist", sf_dir)
    h = hist_stream(
        s, ["l_returnflag"], "l_extendedprice", lo, hi,
        output_dir=f"{tmp}/out", checkpoint_dir=f"{tmp}/ckpt",
        nbuckets=_HIST_NB,
    )
    return hist_quantiles(
        h, ["l_returnflag"], _HIST_PS, lo, hi, _HIST_NB
    ).orderBy("l_returnflag")


def _streaming_hist_oracle() -> str:
    from dataclass_array_spark.workload.relational2 import _hist_quantiles_oracle

    return _hist_quantiles_oracle()


QUERIES["streaming_hist_prices"] = Query(
    streaming_hist_prices, _streaming_hist_oracle(),
    tags=("streaming", "sketch"),
)
