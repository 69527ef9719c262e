"""Sources & sinks (SURVEY.md §2.B row 1-2): thin, schema-explicit
wrappers over Spark's readers/writers so every format keeps predicate
pushdown and column pruning where the format supports it.

Parquet/ORC: columnar, full pushdown — the scale formats.
CSV/JSON: row formats, schema mandatory (inference double-reads the data
— never at 100 TB).  Delta/Iceberg/Hudi need jars absent from this
image; ``read_table`` raises a clear error for them (import-gated).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True, **options
) -> DataFrame:
    return spark.read.options(header=header, **options).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType, **options) -> DataFrame:
    return spark.read.options(**options).schema(schema).json(path)


_LAKEHOUSE_FORMATS = {"delta", "iceberg", "hudi"}


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", **kw) -> DataFrame:
    if fmt in _LAKEHOUSE_FORMATS:
        raise NotImplementedError(
            f"{fmt} requires its connector jars on the classpath (not in this "
            f"image); add e.g. io.delta:delta-spark via spark.jars.packages"
        )
    return {"parquet": read_parquet, "orc": read_orc, "csv": read_csv, "json": read_json}[
        fmt
    ](spark, path, **kw)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
    bucket_by: Optional[tuple[int, list[str]]] = None,
    table_name: Optional[str] = None,
) -> None:
    """Sink with the two layout levers that matter at scale:
    ``partition_by`` (directory pruning) and ``bucket_by`` (co-located
    joins without a shuffle; requires saveAsTable)."""
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketBy requires table_name (saveAsTable)")
        w.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(table_name)
        return
    w.save(path)
