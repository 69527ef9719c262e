"""Blocklist / bad-phrase document filtering — the C4-style "dirty
word list" pass (Raffel et al. 2020 removed any page containing a word
from a public blocklist; production crawls run the same gate with
multi-word phrases).

Semantics: a document MATCHES a phrase when the phrase's token
sequence appears contiguously in the document's token sequence, under
the house tokenizer (:func:`operators.text.tokens` — lowercase,
whitespace split).  The operator reports per-document totals
(occurrence count + distinct phrases hit) and the keep/block flag;
callers filter on ``blocked`` or threshold ``n_matches``.

Plan shape (100 TB): the phrase list is USER-SUPPLIED and bounded by
construction (hundreds of rows), so the lookup join carries a legal
broadcast hint — the same rule as the BPE user vocab.  Per document,
one in-scan n-gram expression per DISTINCT phrase length (no
cross-join against the phrase table), one explode, one broadcast-hash
join, one map-side-combined per-doc aggregation.  No Python in the
path; counts are integers, so the gate is hash-exact by construction.

Reference parity: the reference (an array-dataclass library) has no
text operators; this module is part of the training-data-pipeline
extension surface (SURVEY.md §2.B) alongside ``operators/quality.py``.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclass_array_spark.operators.quality import _grams
from dataclass_array_spark.operators.text import let, tokens

# The engines' \s is ASCII-only (Java regex and RE2 both): a phrase
# containing e.g. U+00A0 must normalize to the SAME single token the
# tokenizer produces, so the Python-side split is pinned to ASCII
# whitespace too (str.split() would split on Unicode whitespace and
# produce token sequences the tokenizer never emits).
_ASCII_WS = re.compile(r"\s+", re.ASCII)

__all__ = [
    "normalize_phrases",
    "phrase_table",
    "blocklist_matches",
    "sql_phrase_values",
    "sql_blocklist_ctes",
]


def normalize_phrases(phrases: Sequence[str]) -> list[tuple[str, int]]:
    """Normalize a raw phrase list through the house tokenizer
    discipline (lowercase, ASCII-whitespace split, blanks dropped) →
    deduplicated ``(phrase, n_words)`` rows, sorted for determinism.
    Raises on an empty list or an effectively-empty phrase — a
    blocklist that matches nothing is a silent configuration bug."""
    if not phrases:
        raise ValueError("blocklist: empty phrase list")
    out = set()
    for p in phrases:
        toks = [t for t in _ASCII_WS.split(p.lower()) if t]
        if not toks:
            raise ValueError(f"blocklist: phrase {p!r} has no tokens")
        out.add((" ".join(toks), len(toks)))
    return sorted(out)


def phrase_table(spark: SparkSession, phrases: Sequence[str]) -> DataFrame:
    """The normalized phrase list as a (phrase string, n_words int)
    DataFrame — bounded by construction (user-supplied), so downstream
    joins may broadcast it."""
    rows = normalize_phrases(phrases)
    return spark.createDataFrame(rows, "phrase string, n_words int")


def blocklist_matches(
    df: DataFrame,
    text_col: str,
    id_col: str,
    phrases: Sequence[str],
) -> DataFrame:
    """→ (id, n_tokens, n_matches, n_phrases, blocked) per input row:
    total phrase-occurrence count, distinct phrases hit, and the C4
    keep/block flag (``blocked = n_matches > 0``).  Overlapping
    occurrences each count (the document "contains" the phrase at each
    position); a phrase appearing inside a longer blocked phrase also
    counts — occurrence counting, not span partitioning."""
    norm = normalize_phrases(phrases)
    lengths = sorted({n for _, n in norm})
    ptab = phrase_table(df.sparkSession, phrases).select(
        F.col("phrase").alias("__g")
    )
    # let-bind the token array so the regex split runs once per row,
    # not once per gram element (the text.let() discipline)
    gram_arr = let(
        tokens(F.col(text_col)),
        lambda t: F.flatten(F.array(*[_grams(t, n) for n in lengths])),
    )
    grams = df.select(F.col(id_col), F.explode(gram_arr).alias("__g"))
    # phrase table bounded by construction -> hint legal (BPE-vocab rule)
    hits = grams.join(F.broadcast(ptab), "__g").groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_matches"),
        F.countDistinct("__g").cast("long").alias("n_phrases"),
    )
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.when(toks.isNull(), F.lit(0))
        .otherwise(F.size(toks))
        .cast("long")
        .alias("n_tokens"),
    )
    return base.join(hits, id_col, "left").select(
        F.col(id_col),
        F.col("n_tokens"),
        F.coalesce(F.col("n_matches"), F.lit(0).cast("long")).alias("n_matches"),
        F.coalesce(F.col("n_phrases"), F.lit(0).cast("long")).alias("n_phrases"),
        (F.coalesce(F.col("n_matches"), F.lit(0).cast("long")) > 0).alias(
            "blocked"
        ),
    )


def sql_phrase_values(phrases: Sequence[str]) -> str:
    """The normalized phrase list as a DuckDB VALUES body — the single
    source both engines' fixtures derive from (``psl_rules_values_sql``
    discipline)."""
    rows = normalize_phrases(phrases)
    vals = ", ".join(
        "('" + p.replace("'", "''") + "', " + str(n) + ")" for p, n in rows
    )
    return f"SELECT * FROM (VALUES {vals}) AS p(phrase, n_words)"


def sql_blocklist_ctes(
    toks_src: str, id_key: str, phrases: Sequence[str], cap: int = 4096
) -> str:
    """CTE chain mirroring :func:`blocklist_matches` over
    ``{toks_src}({id_key}, toks)`` → ``bl_out({id_key}, n_tokens,
    n_matches, n_phrases, blocked)``.  ``cap`` bounds the
    generate_series n-gram unroll (callers pair it with the standard
    max-len guard CTE)."""
    rows = normalize_phrases(phrases)
    lengths = sorted({n for _, n in rows})
    gram_selects = "\nUNION ALL\n".join(
        f"""  SELECT {id_key}, array_to_string(toks[gs.i : gs.i + {n - 1}], ' ') AS g
  FROM {toks_src}, generate_series(1, {cap}) gs(i)
  WHERE gs.i <= len(toks) - {n - 1}"""
        for n in lengths
    )
    return f"""bl_phr AS ({sql_phrase_values(phrases)}),
bl_grams AS (
{gram_selects}
),
bl_hits AS (
  SELECT g.{id_key}, CAST(COUNT(*) AS BIGINT) AS n_matches,
         CAST(COUNT(DISTINCT g.g) AS BIGINT) AS n_phrases
  FROM bl_grams g JOIN bl_phr p ON p.phrase = g.g
  GROUP BY g.{id_key}
),
bl_out AS (
  SELECT t.{id_key},
         CAST(COALESCE(len(t.toks), 0) AS BIGINT) AS n_tokens,
         COALESCE(h.n_matches, 0) AS n_matches,
         COALESCE(h.n_phrases, 0) AS n_phrases,
         COALESCE(h.n_matches, 0) > 0 AS blocked
  FROM {toks_src} t LEFT JOIN bl_hits h USING ({id_key})
)"""
