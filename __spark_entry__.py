"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``dataclass_array_spark.workload`` catalog: every query
declared there carries its Spark callable and (where SQL-expressible) the
DuckDB oracle side by side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable session conf the engine relies on (the
    driver may hand us a vanilla session)."""
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.ansi.enabled": "false",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 analog) on sf0.001."""
    from dataclass_array_spark.workload import QUERIES

    _configure(spark)
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dataclass_array_spark.workload import QUERIES

    def wrap(fn):
        return lambda spark, sf_dir: fn(_configure(spark), sf_dir)

    return {k: wrap(q.fn) for k, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from dataclass_array_spark.workload import QUERIES

    return {k: q.oracle for k, q in QUERIES.items() if q.oracle is not None}
