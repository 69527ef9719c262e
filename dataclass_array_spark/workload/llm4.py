"""Round-12 query extensions: BPE tokenizer training + encoding (the
vocab-CONSTRUCTION half of the tokenize story — ``tokenize_with_vocab``
consumes a vocabulary, these build one), URL/domain canonicalization +
URL-level dedup (the first pass of every crawl pipeline), a
zipfian-skew salted aggregation stress gate, and the KLL-style
mergeable rank sketch.

Same contract as :mod:`workload.llm`: every query binds an operator to
the driver tables and carries a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclass_array_spark.operators import text as tx
from dataclass_array_spark.workload.base import load_tables, spread
from dataclass_array_spark.workload.catalog import Query

_SQL_TOKS = tx.SQL_TOKENS.format(t="text")

# ------------------------------------------------ BPE tokenizer
_BPE_MERGES = 16
_BPE_MIN_COUNT = 2


def bpe_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE merge table on the documents corpus — the iterative
    pair-merge ladder (one bounded aggregation per round, driver holds
    only the merge table; ``operators/bpe.py``).  Deterministic
    tie-breaks make the ENTIRE training run hash-exact against the
    unrolled DuckDB CTE ladder."""
    from dataclass_array_spark.operators.bpe import bpe_train

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    return bpe_train(
        d, "text", _BPE_MERGES, min_count=_BPE_MIN_COUNT
    ).orderBy("merge_rank")


def _bpe_train_oracle() -> str:
    from dataclass_array_spark.operators.bpe import bpe_sql_ctes

    ctes, merge_sel = bpe_sql_ctes(_SQL_TOKS, _BPE_MERGES, _BPE_MIN_COUNT)
    return f"WITH {ctes}\nSELECT * FROM ({merge_sel}) ORDER BY merge_rank"


QUERIES: "dict[str, Query]" = {}
QUERIES["bpe_train_docs"] = Query(
    bpe_train_docs, _bpe_train_oracle(), tags=("text", "tokenizer")
)


def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-encode: segment every document with the corpus's own
    BPE merges → (doc_id, n_bpe_tokens, toks_json).  The iterative part
    runs over the DISTINCT-WORD table only; documents get their
    segmentations back via one corpus-side join (unhinted — both sides
    corpus-derived)."""
    from dataclass_array_spark.operators.bpe import bpe_encode, bpe_train

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    merges = bpe_train(d, "text", _BPE_MERGES, min_count=_BPE_MIN_COUNT)
    return bpe_encode(d, "text", "doc_id", merges).orderBy("doc_id")


def _bpe_encode_oracle() -> str:
    from dataclass_array_spark.operators.bpe import bpe_encode_sql_ctes

    ctes = bpe_encode_sql_ctes(_SQL_TOKS, _BPE_MERGES, _BPE_MIN_COUNT)
    return f"WITH {ctes}\nSELECT * FROM encoded ORDER BY doc_id"


QUERIES["bpe_encode_docs"] = Query(
    bpe_encode_docs, _bpe_encode_oracle(), tags=("text", "tokenizer")
)
