"""Shared workload helpers: table loading + cross-engine-deterministic
aggregation expressions.

Float determinism: double summation is order-dependent, and Spark and
DuckDB will not add partial aggregates in the same order.  Every SUM/AVG
over doubles therefore goes through an exact DECIMAL accumulator in BOTH
engines (per-row double arithmetic is bit-identical everywhere; the
double→decimal(…,6) rounding has no representable ties, so both engines
round identically), then casts the exact result back to DOUBLE.
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


def load_tables(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> Dict[str, DataFrame]:
    """Parquet scans, one per table.  Filters/projections stay pushable —
    no caching or materialization here, so Catalyst prunes at the source.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    reader rejects; we read it as a long (legacy conf) and expose both
    ``ts_us`` (exact integer micros — use this for arithmetic/outputs so
    the ns-truncation matches DuckDB's ``epoch_us``) and ``ts`` (micros
    timestamp)."""
    out: Dict[str, DataFrame] = {}
    for n in names:
        if n == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            e = spark.read.parquet(f"{sf_dir}/{n}.parquet")
            e = e.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
                "ts", F.timestamp_micros(F.col("ts_us"))
            )
            out[n] = e
        else:
            out[n] = spark.read.parquet(f"{sf_dir}/{n}.parquet")
    return out


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to all cores — use before CPU-heavy narrow
    transforms when the source may be a single small file (locally) or a
    few dense row-groups (at scale).  One cheap shuffle of the input
    buys full-width parallelism for the expensive stage."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def dsum(expr, alias: str) -> Column:
    """Order-independent exact sum of a double expression → DOUBLE."""
    c = F.expr(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(expr, alias: str) -> Column:
    """avg = exact decimal sum / count, divided in double (identical in
    both engines given identical inputs)."""
    c = F.expr(expr) if isinstance(expr, str) else expr
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
