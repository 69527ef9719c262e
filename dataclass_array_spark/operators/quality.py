"""Repetition-based quality filters (Gopher-rule family): per-document
duplicate-token fraction, duplicated-3-gram fraction, and the most
frequent bigram with its character share.

Design for scale: every metric is a pure column expression evaluated
inside the scan stage — NO shuffle, NO explode.  The most-frequent
bigram (normally a per-doc group-count) is computed as a run-length
fold over the *sorted* bigram array: ``array_sort`` puts equal grams
adjacent, one ``aggregate`` pass finds the longest run.  Tie-break is
deterministic (first max in sorted order = lexicographically smallest
gram), mirrored in the oracle via ``ORDER BY cnt DESC, gram``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataclass_array_spark.operators.text import let, tokens


def _grams(toks: Column, k: int) -> Column:
    """All (non-distinct) k-word shingles of a token array."""
    n = F.size(toks)
    mk = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.when(n >= k, mk).otherwise(F.array().cast("array<string>"))


def _dup_frac(arr: Column) -> Column:
    """1 - distinct/total: the fraction of occurrences that repeat an
    earlier one.  0 for empty arrays."""
    return F.when(
        F.size(arr) > 0,
        F.lit(1.0) - F.size(F.array_distinct(arr)) / F.size(arr),
    ).otherwise(F.lit(0.0))


def _top_run(sorted_arr: Column) -> Column:
    """struct(best_count, best_gram) — longest run of equal adjacent
    elements in a sorted array, first (smallest) gram winning ties."""
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit("").alias("bestg"),
    )

    def merge(acc, x):
        run2 = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.when(run2 > acc.best, run2).otherwise(acc.best).alias("best"),
            F.when(run2 > acc.best, x).otherwise(acc.bestg).alias("bestg"),
        )

    return F.aggregate(
        sorted_arr,
        acc0,
        merge,
        lambda acc: F.struct(acc.best.alias("cnt"), acc.bestg.alias("gram")),
    )


def repetition_metrics(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dup_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Per-doc repetition metrics + a pass/fail flag.

    Columns: ``n_tokens``, ``dup_word_frac``, ``dup_3gram_frac``,
    ``top_bigram`` (null when < 2 tokens), ``top_bigram_count``,
    ``top_bigram_char_frac`` (count * gram chars / text chars), and
    ``flagged`` (true when either threshold is exceeded).
    """
    t = F.col(text_col)

    # every multiply-referenced sub-expression is let()-bound: without
    # it Catalyst INLINES the _top_run aggregate at each of its four
    # field references (4× the bigram sort+fold per row) and rebuilds
    # the 3-gram array twice inside _dup_frac — measured 9.4 → 0.8 s
    # at sf1 (round 9)
    def build(toks: Column) -> Column:
        def with_top(top: Column) -> Column:
            char_frac = F.when(
                F.length(t) > 0, top.cnt * F.length(top.gram) / F.length(t)
            ).otherwise(F.lit(0.0))
            return F.struct(
                F.size(toks).cast("long").alias("n_tokens"),
                _dup_frac(toks).alias("dup_word_frac"),
                let(_grams(toks, 3), _dup_frac).alias("dup_3gram_frac"),
                F.when(top.cnt > 0, top.gram).alias("top_bigram"),
                top.cnt.alias("top_bigram_count"),
                char_frac.alias("top_bigram_char_frac"),
            )

        return let(_top_run(F.array_sort(_grams(toks, 2))), with_top)

    m = let(tokens(t), build)
    return df.select(
        id_col,
        m.n_tokens.alias("n_tokens"),
        m.dup_word_frac.alias("dup_word_frac"),
        m.dup_3gram_frac.alias("dup_3gram_frac"),
        m.top_bigram.alias("top_bigram"),
        m.top_bigram_count.alias("top_bigram_count"),
        m.top_bigram_char_frac.alias("top_bigram_char_frac"),
        (
            (m.dup_word_frac > F.lit(max_dup_word_frac))
            | (m.top_bigram_char_frac > F.lit(max_top_bigram_frac))
        ).alias("flagged"),
    )


def repetition_flag(
    text: Column,
    max_dup_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.18,
) -> Column:
    """The pass/fail flag of :func:`repetition_metrics` as a standalone
    column expression — compose it straight into a filter (no join, no
    extra pass over the corpus)."""

    def build(toks: Column) -> Column:
        def with_top(top: Column) -> Column:
            char_frac = F.when(
                F.length(text) > 0,
                top.cnt * F.length(top.gram) / F.length(text),
            ).otherwise(F.lit(0.0))
            return (_dup_frac(toks) > F.lit(max_dup_word_frac)) | (
                char_frac > F.lit(max_top_bigram_frac)
            )

        return let(_top_run(F.array_sort(_grams(toks, 2))), with_top)

    return let(tokens(text), build)
