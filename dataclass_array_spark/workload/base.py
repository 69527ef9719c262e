"""Shared workload helpers: table loading + cross-engine-deterministic
aggregation expressions.

Float determinism: double summation is order-dependent, and Spark and
DuckDB will not add partial aggregates in the same order.  Every SUM/AVG
over doubles therefore goes through an exact DECIMAL accumulator in BOTH
engines (per-row double arithmetic is bit-identical everywhere; the
double→decimal(…,6) rounding has no representable ties ON MONEY-LIKE
DATA — a tie needs a dyadic with ≤ 7 fractional bits, which 2-decimal
generated values never are; float32-derived columns CAN tie and need
the VARCHAR-mirrored cast, see operators/clustering.py — so both
engines round identically here), then casts the exact result back to
DOUBLE via the floor-split.
"""

from __future__ import annotations

from typing import Dict, Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_DEC = "decimal(25,6)"


def normalize_events_ts(e: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to the canonical pair every operator uses:
    ``ts_us`` (exact integer micros since epoch — use for arithmetic and
    outputs; matches DuckDB's ``epoch_us``) and ``ts`` (micros timestamp).

    The driver's testdata has shipped ``ts`` as TIMESTAMP(NANOS) (which
    Spark reads as BIGINT nanos under the legacy conf) and as
    TIMESTAMP(MICROS) (read as timestamp_ntz / timestamp) in different
    drops; all three physical forms land on identical ts_us values, so
    every downstream query and oracle is schema-drift-proof."""
    t = dict(e.dtypes)["ts"]
    if t == "bigint":  # nanos-as-long: truncate ns -> us like epoch_us
        e = e.withColumn("ts_us", F.expr("ts div 1000"))
    elif t == "timestamp_ntz":  # tz-independent diff from the naive epoch
        e = e.withColumn(
            "ts_us",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ),
        )
    elif t == "timestamp":  # session TZ pinned UTC in get_spark
        e = e.withColumn("ts_us", F.unix_micros("ts"))
    else:  # a silent fallthrough (e.g. string ts) would NULL every ts_us
        raise ValueError(f"unexpected events.ts dtype {t!r}")
    return e.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def load_tables(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> Dict[str, DataFrame]:
    """Parquet scans, one per table.  Filters/projections stay pushable —
    no caching or materialization here, so Catalyst prunes at the source.

    ``events.ts`` physical type varies by testdata drop (see
    :func:`normalize_events_ts`); the legacy nanos conf is set so the
    NANOS form reads as long instead of erroring, and the normalizer
    branches on whatever type actually arrived."""
    out: Dict[str, DataFrame] = {}
    for n in names:
        if n == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            out[n] = normalize_events_ts(spark.read.parquet(f"{sf_dir}/{n}.parquet"))
        else:
            out[n] = spark.read.parquet(f"{sf_dir}/{n}.parquet")
    return out


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to all cores — use before CPU-heavy narrow
    transforms when the source may be a single small file (locally) or a
    few dense row-groups (at scale).  One cheap shuffle of the input
    buys full-width parallelism for the expensive stage."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def dec_to_double(s: Column) -> Column:
    """decimal→double via the floor-split: a direct cast double-rounds
    once the scaled integer exceeds 2^53 (caught at sf1 — round 9:
    q1's 6M-row sum_charge ≈ 2.2e11 at scale 6 is 2.2e17 scaled units,
    and Spark's and DuckDB's direct casts rounded differently).  Floor
    and fraction are each exactly convertible, and ``fl(int + frac)``
    rounds identically across engines."""
    f = F.floor(s)
    return f.cast("double") + (s - f).cast("double")


def dsum(expr, alias: str) -> Column:
    """Order-independent exact sum of a double expression → DOUBLE."""
    c = F.expr(expr) if isinstance(expr, str) else expr
    return dec_to_double(F.sum(c.cast(_DEC))).alias(alias)


def davg(expr, alias: str) -> Column:
    """avg = exact decimal sum / count, divided in double (identical in
    both engines given identical inputs)."""
    c = F.expr(expr) if isinstance(expr, str) else expr
    return (dec_to_double(F.sum(c.cast(_DEC))) / F.count(c)).alias(alias)


def sql_split(sum_expr: str) -> str:
    """DuckDB mirror of :func:`dec_to_double` (the SUM repeats —
    engines CSE it)."""
    return (
        f"(CAST(FLOOR({sum_expr}) AS DOUBLE) "
        f"+ CAST({sum_expr} - FLOOR({sum_expr}) AS DOUBLE))"
    )


def sql_dsum(expr: str, alias: str) -> str:
    s = f"SUM(CAST(({expr}) AS DECIMAL(25,6)))"
    return f"{sql_split(s)} AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    s = f"SUM(CAST(({expr}) AS DECIMAL(25,6)))"
    return f"{sql_split(s)} / COUNT({expr}) AS {alias}"


def fresh_stream_tmpdir(name: str, sf_dir: str) -> str:
    """Per-(gate, sf_dir, pid) scratch directory for a streaming gate's
    sink + checkpoint — ONE implementation of the recycle discipline
    the eight streaming gates share (was copy-pasted per gate).

    The gate cannot rmtree on return (the driver still reads the
    returned frame lazily), so cleanup happens at the NEXT invocation —
    repeated bench runs in one process reuse one directory.  The pid in
    the tag keeps two CONCURRENT runs over the same sf_dir from
    rmtree'ing each other's live checkpoint mid-stream (a plain per-sf
    tag reintroduced the collision mkdtemp was immune to); stale dirs
    from dead pids are swept opportunistically here (the /proc liveness
    probe is Linux-only — acceptable for the gate/test environment this
    helper serves)."""
    import glob
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    tmp = os.path.join(
        tempfile.gettempdir(), f"dca-stream-{name}-{tag}-{os.getpid()}"
    )
    shutil.rmtree(tmp, ignore_errors=True)
    for stale in glob.glob(
        os.path.join(tempfile.gettempdir(), f"dca-stream-{name}-{tag}-*")
    ):
        try:
            pid = int(stale.rsplit("-", 1)[-1])
        except ValueError:
            continue
        if pid != os.getpid() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(stale, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    return tmp
