"""Blocked record linkage (entity resolution): find record pairs that
likely refer to the same real-world entity by blocking on a cheap key
and scoring a weighted bundle of field similarities — the
Fellegi-Sunter-style pipeline every dedup/master-data system runs.

Plan shape:
- **Blocking** is an equi-join on the block key — candidate pairs exist
  only within a block, NEVER all-pairs.  ``max_block_size`` caps each
  block to its lowest ids (the MinHash ``max_bucket_size`` pattern): a
  degenerate block of f records creates f²/2 pairs, so the cap bounds
  candidates at ``n_blocks · cap²/2`` for ANY corpus; it must be
  mirrored into the oracle.
- **Scoring** is pure column arithmetic inside the join stage: each
  comparator is an exact-integer or exactly-reproducible double
  expression (Levenshtein's unit-cost DP and set-Jaccard counts are
  identical integers in Spark and DuckDB; one division and a fixed
  left-associated weighted sum keep the composite score bit-identical
  cross-engine).

Comparators (``kind``):
- ``"exact"``        — 1.0 if equal (NULL never matches), else 0.0
- ``"token_jaccard"``— |A∩B| / |A∪B| over distinct whitespace tokens
- ``"lev_sim"``      — 1 − levenshtein(a,b) / max(len(a), len(b))
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (column, kind, weight)
FieldSpec = Tuple[str, str, float]


def _similarity(kind: str, a: Column, b: Column) -> Column:
    if kind == "exact":
        return F.when(a == b, F.lit(1.0)).otherwise(F.lit(0.0))
    if kind == "token_jaccard":
        ta = F.array_distinct(F.split(a, r"\s+"))
        tb = F.array_distinct(F.split(b, r"\s+"))
        return (
            F.size(F.array_intersect(ta, tb)).cast("double")
            / F.size(F.array_union(ta, tb)).cast("double")
        )
    if kind == "lev_sim":
        return F.lit(1.0) - (
            F.levenshtein(a, b).cast("double")
            / F.greatest(F.length(a), F.length(b)).cast("double")
        )
    raise ValueError(f"blocked_linkage: unknown comparator kind {kind!r}")


def blocked_linkage(
    df: DataFrame,
    id_col: str,
    block_col: str,
    fields: List[FieldSpec],
    threshold: float,
    max_block_size: Optional[int] = None,
) -> DataFrame:
    """Self-linkage over one table → ``(id_a, id_b, score)`` for every
    within-block pair (``id_a < id_b``) whose weighted similarity
    ``Σ wᵢ·simᵢ`` (left-associated, in ``fields`` order) reaches
    ``threshold``, ordered."""
    cols = [F.col(id_col), F.col(block_col)] + [F.col(c) for c, _, _ in fields]
    base = df.select(*cols)
    if max_block_size is not None:
        wblk = Window.partitionBy(block_col).orderBy(id_col)
        base = (
            base.withColumn("__rn", F.row_number().over(wblk))
            .filter(F.col("__rn") <= int(max_block_size))
            .drop("__rn")
        )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    score: Column = F.lit(0.0)
    for col, kind, w in fields:
        score = score + F.lit(float(w)) * _similarity(
            kind, F.col(f"a.{col}"), F.col(f"b.{col}")
        )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= F.lit(float(threshold)))
        .orderBy("id_a", "id_b")
    )


def _similarity_sql(kind: str, a: str, b: str) -> str:
    if kind == "exact":
        return f"CASE WHEN {a} = {b} THEN 1.0 ELSE 0.0 END"
    if kind == "token_jaccard":
        ta = f"list_distinct(string_split_regex({a}, '\\s+'))"
        tb = f"list_distinct(string_split_regex({b}, '\\s+'))"
        return (
            f"CAST(len(list_intersect({ta}, {tb})) AS DOUBLE) / "
            f"CAST(len(list_distinct({ta} || {tb})) AS DOUBLE)"
        )
    if kind == "lev_sim":
        return (
            f"1.0 - CAST(levenshtein({a}, {b}) AS DOUBLE) / "
            f"CAST(greatest(len({a}), len({b})) AS DOUBLE)"
        )
    raise ValueError(f"unknown comparator kind {kind!r}")


def blocked_linkage_sql(
    table: str,
    id_col: str,
    block_col: str,
    fields: List[FieldSpec],
    threshold: float,
    max_block_size: Optional[int] = None,
) -> str:
    """DuckDB oracle for :func:`blocked_linkage` (same blocking, same
    cap, same left-associated weighted sum)."""
    sel = ", ".join([id_col, block_col] + [c for c, _, _ in fields])
    if max_block_size is not None:
        base = f"""(
  SELECT {sel} FROM (
    SELECT {sel},
           ROW_NUMBER() OVER (PARTITION BY {block_col} ORDER BY {id_col}) AS rn
    FROM {table}
  ) WHERE rn <= {int(max_block_size)}
)"""
    else:
        base = f"(SELECT {sel} FROM {table})"
    score = " + ".join(
        f"{w!r} * ({_similarity_sql(kind, f'a.{c}', f'b.{c}')})"
        for c, kind, w in fields
    )
    return f"""
WITH base AS {base}
, scored AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, {score} AS score
  FROM base a JOIN base b
    ON a.{block_col} = b.{block_col} AND a.{id_col} < b.{id_col}
)
SELECT id_a, id_b, score FROM scored
WHERE score >= {threshold!r} ORDER BY id_a, id_b"""
