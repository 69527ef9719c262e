#!/usr/bin/env python
"""Deterministic sf1 generation by scaling sf0.1 ×10 with key offsets.

The driver ships sf{0.001,0.01,0.1}; per-query overhead swamps sf0.1
timings (median ≈1.3 s/query), so regressions hide.  This builds a
~6M-row-lineitem sf1 under the repo (gitignored) for a second bench
line.  Derivation rules (seed-free, fully deterministic):

- region/nation: copied unchanged (fixed dimensions).
- customer/supplier/part/orders/lineitem/events: 10 copies, every key
  column offset by ``i * (max_key+1)`` so referential integrity holds
  per copy and join fan-outs match the original.
- documents: copy 0 unchanged; copies i>0 prefix every token with a
  per-copy tag.  This keeps corpus size and near-dup structure WITHIN
  each copy (planted near-dups stay near-dups) while sharing zero
  shingles ACROSS copies — a naive replication would make every doc a
  10-way near-duplicate and blow the candidate-pair count up
  quadratically, which is a different (degenerate) workload.
- embeddings: copies roll the vector by i positions (norm-preserving,
  decorrelates copies).

Run: python tools/make_sf1.py   (or bench.py generates it on demand)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "sf1")
N_COPIES = 10

_KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

# key spaces must be consistent across tables (o_custkey offsets must
# match c_custkey offsets), so the offset base comes from the KEY OWNER
_KEY_BASE_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def _read(spark: SparkSession, table: str) -> DataFrame:
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SRC}/{table}.parquet")


def _replicate(df: DataFrame, key_cols: list[str], bases: dict[str, int]) -> DataFrame:
    copies = []
    for i in range(N_COPIES):
        c = df
        for k in key_cols:
            c = c.withColumn(k, (F.col(k) + F.lit(i * bases[k])).cast("long"))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def ensure_sf1(spark: SparkSession, dst: str = DST) -> str:
    """Generate sf1 if missing; returns the directory."""
    marker = os.path.join(dst, "_SUCCESS_ALL")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)

    # offset bases from key owners (max+1 keeps copies disjoint)
    bases: dict[str, int] = {}
    owner_cache: dict[tuple, int] = {}
    for key, (tbl, col) in _KEY_BASE_OWNER.items():
        if (tbl, col) not in owner_cache:
            owner_cache[(tbl, col)] = (
                _read(spark, tbl).agg(F.max(col)).collect()[0][0] + 1
            )
        bases[key] = owner_cache[(tbl, col)]

    for t in ("region", "nation"):
        _read(spark, t).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")

    for t, keys in _KEY_COLS.items():
        _replicate(_read(spark, t), keys, bases).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )

    # documents: per-copy token tag (see module docstring)
    d = _read(spark, "documents")
    base_d = bases["doc_id"]
    doc_copies = [d]
    for i in range(1, N_COPIES):
        tag = f"z{i}q"
        doc_copies.append(
            d.select(
                (F.col("doc_id") + F.lit(i * base_d)).cast("long").alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda tok: F.concat(F.lit(tag), tok),
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
                F.col("n_chars").alias("n_chars"),
            )
        )
    out_d = doc_copies[0]
    for c in doc_copies[1:]:
        out_d = out_d.unionByName(c)
    out_d.write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    # embeddings: roll vector by i (bijection of dims, norm-preserving)
    e = _read(spark, "embeddings")
    base_v = bases["vec_id"]
    dim = len(e.select("embedding").first()[0])
    emb_copies = [e]
    for i in range(1, N_COPIES):
        emb_copies.append(
            e.select(
                (F.col("vec_id") + F.lit(i * base_v)).cast("long").alias("vec_id"),
                F.concat(
                    F.slice("embedding", i + 1, dim - i), F.slice("embedding", 1, i)
                ).alias("embedding"),
                "label",
            )
        )
    out_e = emb_copies[0]
    for c in emb_copies[1:]:
        out_e = out_e.unionByName(c)
    out_e.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    with open(marker, "w") as f:
        f.write("ok\n")
    return dst


if __name__ == "__main__":
    from dataclass_array_spark.session import get_spark

    print(ensure_sf1(get_spark("make_sf1")))
