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


def read_text_docs(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    id_from_path: bool = True,
) -> DataFrame:
    """Raw-text ingestion for document pipelines: one row per line (or
    per file with ``whole_file``), columns ``(doc_id, text[, path])``.
    ``doc_id`` is the md5-derived 60-bit hash of (file path, record
    index).  Record index comes from monotonically_increasing_id, so
    ids are re-run-deterministic for a fixed ``files.maxPartitionBytes``
    split conf (text records are always in file order within a split);
    for ids independent of the split conf use ``whole_file=True`` (one
    record per file) or re-key on a content hash after ingestion.  Text
    files support no column pruning/pushdown — land the corpus to
    parquet right after this."""
    from pyspark.sql import functions as F

    # NOTE: .option("wholetext", <python bool>) is silently IGNORED by
    # the text source (stringified "True" doesn't parse); the reader
    # kwarg is the working spelling (round-12 regression test)
    r = spark.read.text(path, wholetext=bool(whole_file))
    r = r.select(
        F.input_file_name().alias("path"),
        F.monotonically_increasing_id().alias("_ord"),  # per-file order only
        F.col("value").alias("text"),
    )
    key = F.concat_ws(":", "path", F.col("_ord").cast("string"))
    doc_id = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    cols = [doc_id.alias("doc_id"), F.col("text")]
    if id_from_path:
        cols.append(F.col("path"))
    return r.select(*cols)


def read_binary_media(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Opaque media ingestion via the built-in ``binaryFile`` source:
    ``(path, modificationTime, length, content)`` with ``content`` a
    BinaryType column — feeds operators.multimodal directly.  Pushdown:
    the source prunes on path/length predicates; content is only read
    for surviving files."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_avro(spark: SparkSession, path: str, **options) -> DataFrame:
    """Avro source — jar-gated: pyspark does not bundle spark-avro.
    Clear error instead of a bare ClassNotFound; the row-format scale
    caveats of CSV/JSON apply (no column pruning at the storage layer)."""
    try:
        return spark.read.format("avro").options(**options).load(path)
    except Exception as e:
        if "avro" in str(e).lower():
            raise NotImplementedError(
                "avro requires the spark-avro connector on the classpath "
                "(spark.jars.packages = org.apache.spark:spark-avro_2.13:"
                "<spark-version>); land long-lived data as parquet instead"
            ) from e
        raise


_LAKEHOUSE_FORMATS = {"delta", "iceberg", "hudi"}


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", **kw) -> DataFrame:
    if fmt == "avro":
        return read_avro(spark, path, **kw)
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


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Common-Crawl WET (WARC conversion) ingestion as PURE column
    expressions — the raw input format of every crawl-based training
    pipeline.  One row per WARC record: ``(path, rec_idx, warc_type,
    target_uri, warc_date, text, n_chars)``.

    Parsing model: each WET file is read whole (``wholetext`` — WET
    shards are single-task-sized by design, ~150 MB; at 100 TB the
    parallelism unit is the FILE, which is exactly how Common Crawl
    shards), newlines normalized, records split on a ``WARC/1.0``
    version line ONLY when a ``WARC-`` header line follows (lookahead;
    a page body line that merely says ``WARC/1.0`` must not split the
    record — r12 advice), headers regex-extracted, the body taken
    after the first blank line.  ``.gz`` shards decompress transparently through
    the text source.  No UDF anywhere — the split/extract pipeline is
    all Catalyst, so a downstream filter on ``target_uri`` or
    ``n_chars`` stays in the same codegen stage.  Land to parquet
    immediately after ingestion (text sources have no pruning).

    ``warcinfo`` preamble records are kept (filter ``warc_type ==
    'conversion'`` for payload-only); ``rec_idx`` is the record's
    0-based position within its file — (path, rec_idx) is a stable,
    re-run-deterministic record key."""
    from pyspark.sql import functions as F

    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("path"),
        F.regexp_replace(F.col("value"), "\r\n", "\n").alias("v"),
    )
    recs = raw.select(
        "path",
        F.posexplode(
            F.filter(
                F.split(F.col("v"), r"(?m)^WARC/1\.0\n(?=WARC-)"),
                lambda r: F.trim(r) != F.lit(""),
            )
        ).alias("rec_idx", "rec"),
    )
    hdr = F.substring_index(F.col("rec"), "\n\n", 1)
    body = F.when(
        F.col("rec").contains("\n\n"),
        F.expr("substring(rec, instr(rec, '\n\n') + 2)"),
    ).otherwise(F.lit(""))
    text = F.regexp_replace(body, r"\n+$", "")
    return recs.select(
        "path",
        F.col("rec_idx").cast("long"),
        F.regexp_extract(hdr, r"(?m)^WARC-Type: *(\S+)", 1).alias("warc_type"),
        F.regexp_extract(hdr, r"(?m)^WARC-Target-URI: *(\S+)", 1).alias(
            "target_uri"
        ),
        F.regexp_extract(hdr, r"(?m)^WARC-Date: *(\S+)", 1).alias("warc_date"),
        text.alias("text"),
        F.length(text).cast("long").alias("n_chars"),
    )
