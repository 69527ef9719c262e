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
into the oracle.

Prefix filtering (the Ed-Join refinement, ON by default): index only
each string's ``k·q + 1`` RAREST surviving grams under the global
(frequency asc, gram asc) order.  This shrinks the inverted index —
hot grams appear in few prefixes — WITHOUT changing the verified
result set, so the oracle needs no mirror:

- One edit destroys ≤ ``q`` distinct grams, so a true pair satisfies
  ``|A∩B| ≥ max(|A|,|B|) − k·q``; by the standard prefix-filter lemma
  its length-``(k·q+1)`` prefixes under any shared total order
  intersect — the pair survives candidate generation.
- ``max_gram_freq`` composes losslessly with it: capped grams have
  STRICTLY larger frequency than every kept gram, i.e. capping
  removes only an order-SUFFIX of each string's sorted gram list.  If
  the lemma's witness gram is uncapped it sits within both capped
  prefixes; if it is capped, every later gram is too, so both capped
  gram sets fit entirely inside their prefixes and any shared
  uncapped gram (exactly the pre-existing cap semantics) qualifies.

Either way the candidate set under (cap + prefix) ⊇ all verified
pairs that (cap alone) produced, and ⊆ its candidates — same final
rows, fewer verifications.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_index(
    df: DataFrame,
    str_col: str,
    k: int,
    q: int,
    max_gram_freq: Optional[int],
    prefix_filter: bool,
) -> DataFrame:
    """The (s, ln, g) inverted index rows that enter the self-join —
    split out so tests can assert the prefix filter's candidate-count
    reduction."""
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
    if max_gram_freq is not None or prefix_filter:
        freq = grams.groupBy("g").agg(F.count("*").alias("gf"))
        grams = grams.join(freq, on="g")
        if max_gram_freq is not None:
            grams = grams.filter(F.col("gf") <= max_gram_freq)
        if prefix_filter:
            wp = Window.partitionBy("s").orderBy("gf", "g")
            grams = (
                grams.withColumn("_rn", F.row_number().over(wp))
                .filter(F.col("_rn") <= k * q + 1)
                .drop("_rn")
            )
        grams = grams.drop("gf")
    return grams


def edit_distance_join(
    df: DataFrame,
    str_col: str,
    k: int = 2,
    q: int = 2,
    max_gram_freq: Optional[int] = None,
    prefix_filter: bool = True,
) -> DataFrame:
    """All DISTINCT-string pairs within Levenshtein distance ``k``.

    Returns ``(name_a, name_b, dist)`` with ``name_a < name_b``
    (lexicographic), ordered.  Operates on the distinct string set —
    join the result back to carrier rows by string value (duplicated
    strings would otherwise explode the pair set with dist-0 copies).

    ``prefix_filter`` indexes only each string's rarest ``k·q + 1``
    grams (module docstring proves this is result-lossless — it never
    appears in the oracle).
    """
    grams = _gram_index(df, str_col, k, q, max_gram_freq, prefix_filter)
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
