"""Fuzzy (edit-distance) string join — the entity-resolution primitive:
find all pairs of strings within Levenshtein distance ``k``.

Plan shape:
- **Candidates** come from a distinct q-gram inverted index: each
  string contributes its distinct q-grams, the self-join runs on the
  gram (an equi-join on a short hashable key), and a length filter
  (``|len_a − len_b| ≤ k`` — an insert/delete changes length by 1)
  prunes before verification.  NEVER an all-pairs cross join.
- **Verification** is ``levenshtein(a, b) ≤ k`` on the deduped
  candidate pairs only.  Both Spark and DuckDB implement the classic
  unit-cost dynamic program, so the integer distances are identical
  cross-engine and the oracle is exact.

Completeness bound (pigeonhole): one edit destroys at most ``q`` of a
string's q-grams, and a string of length L has L−q+1 of them — so any
pair within distance ``k`` whose shorter member is at least
``q·(k+1)`` characters long shares at least one q-gram and IS
generated.  Shorter strings can slip through candidate generation;
``max_gram_freq`` (drop q-grams more frequent than the cap before the
join — the fan-out bound: a gram in f strings creates f² candidate
rows) trades completeness for scale the same way
``ngram_jaccard_pairs``' ``max_doc_freq`` does, and must be mirrored
into the oracle.  At 100 TB the standard refinement is prefix
filtering (index only each string's rarest ``k·q+1`` grams under a
global frequency order); the inverted-index shape here is its
superset and the cap keeps hot grams bounded meanwhile.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    df: DataFrame,
    str_col: str,
    k: int = 2,
    q: int = 2,
    max_gram_freq: Optional[int] = None,
) -> DataFrame:
    """All DISTINCT-string pairs within Levenshtein distance ``k``.

    Returns ``(name_a, name_b, dist)`` with ``name_a < name_b``
    (lexicographic), ordered.  Operates on the distinct string set —
    join the result back to carrier rows by string value (duplicated
    strings would otherwise explode the pair set with dist-0 copies).
    """
    s = df.select(F.col(str_col).alias("s")).filter(F.col("s").isNotNull()).distinct()
    grams = s.select(
        "s",
        F.length("s").alias("ln"),
        F.explode(
            F.when(
                F.length("s") >= q,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.length("s") - (q - 1)),
                        lambda i: F.col("s").substr(i, F.lit(q)),
                    )
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    if max_gram_freq is not None:
        freq = grams.groupBy("g").agg(F.count("*").alias("gf"))
        grams = grams.join(
            freq.filter(F.col("gf") <= max_gram_freq), on="g"
        ).drop("gf")
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.s") < F.col("b.s"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= k),
        )
        .select(F.col("a.s").alias("name_a"), F.col("b.s").alias("name_b"))
        .dropDuplicates(["name_a", "name_b"])
    )
    return (
        cand.select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= k)
        .orderBy("name_a", "name_b")
    )
