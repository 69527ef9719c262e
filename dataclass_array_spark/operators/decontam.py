"""Benchmark decontamination: flag training documents whose word
n-grams overlap an evaluation/benchmark set.

The standard pre-training hygiene step (used by GPT-3/PaLM/Llama data
pipelines): any training doc sharing too many k-gram shingles with a
held-out benchmark is dropped so eval scores measure generalization,
not memorization.

Design for scale (100 TB corpus, ~10^4-10^6 eval n-grams):
- The eval n-gram set is SMALL (benchmarks are thousands of rows) —
  it is distinct-ed and **broadcast**, so the corpus side never
  shuffles for the join.
- Corpus shingles explode inside the scan stage; the broadcast hash
  join and the partial (map-side) aggregation both run before the only
  shuffle, which carries exactly one row per document.
- Shingling reuses :func:`operators.dedup.word_shingles` (distinct
  k-word windows, let-bound tokenization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataclass_array_spark.operators.dedup import _hash60, word_shingles


def eval_ngram_set(eval_df: DataFrame, text_col: str, k: int = 5) -> DataFrame:
    """Distinct k-gram shingle *hashes* of the benchmark set — one long
    column ``sh``.  Joining on the 60-bit md5 hash instead of the raw
    n-gram string shrinks the broadcast ~5x and makes probes integer
    compares; the oracle hashes identically, so the comparison is still
    exact (a 60-bit collision would need ~10^9 eval n-grams)."""
    return (
        eval_df.select(F.explode(word_shingles(F.col(text_col), k)).alias("sh_str"))
        .select(_hash60(F.col("sh_str")).alias("sh"))
        .distinct()
    )


def ngram_overlap_vs_eval(
    corpus_df: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-corpus-doc overlap with the eval n-gram set.

    Returns ``(id, n_grams, n_hit, overlap_frac, contaminated)`` for
    every corpus doc; docs with fewer than ``k`` tokens have zero
    shingles and overlap 0.  ``overlap_frac = n_hit / n_grams`` (double
    division of exact longs — engine-portable).
    """
    evals = F.broadcast(eval_ngram_set(eval_df, text_col, k).withColumn("hit", F.lit(1)))
    sh = corpus_df.select(
        F.col(id_col),
        F.explode_outer(
            F.transform(word_shingles(F.col(text_col), k), _hash60)
        ).alias("sh"),
    )
    per_doc = (
        sh.join(evals, "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("sh").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0, F.col("n_hit") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        id_col,
        "n_grams",
        "n_hit",
        frac.alias("overlap_frac"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )
