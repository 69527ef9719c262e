"""Round-13 second-wave query extensions: C4-style blocklist phrase
filtering, per-domain document quotas (cap-per-key sampling), trigram
Kneser-Ney LM scoring on the decimal(38)-wide exact-ln, and tokenizer
fertility stats.

Same contract as :mod:`workload.llm`: every query binds an operator to
the driver tables and carries a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclass_array_spark.operators import text as tx
from dataclass_array_spark.workload.base import load_tables, spread
from dataclass_array_spark.workload.catalog import Query
from dataclass_array_spark.workload.llm4 import _URL_EXPR_SQL, _url_expr_spark

_SQL_TOKS = tx.SQL_TOKENS.format(t="text")

QUERIES: "dict[str, Query]" = {}

# ------------------------------------------------ blocklist filtering
# Mixed lengths (1/2/3 words), mixed hit rates: the singleton "dup" is
# rare in the corpus, "sort merge join" never occurs (exercises the
# zero-hit phrase path), the bigrams occur organically.
_BLOCK_PHRASES = (
    "hash join",
    "slow query",
    "big scan",
    "dup",
    "filter the row",
    "sort merge join",
)


def blocklist_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist gate over the documents corpus: per doc the
    phrase-occurrence count, distinct phrases hit, and the keep/block
    flag.  Phrase list is bounded by construction → broadcast lookup;
    one explode + one map-side-combined per-doc aggregation."""
    from dataclass_array_spark.operators.blocklist import blocklist_matches

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    return blocklist_matches(d, "text", "doc_id", _BLOCK_PHRASES).orderBy(
        "doc_id"
    )


def _blocklist_oracle() -> str:
    from dataclass_array_spark.operators.blocklist import sql_blocklist_ctes

    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
guard AS (
  SELECT CASE WHEN COALESCE(MAX(len(toks)), 0) > 4096
              THEN error('BLOCKLIST_SQL: document exceeds 4096-token oracle cap')
              ELSE 1 END AS ok
  FROM toks
),
{sql_blocklist_ctes("toks", "doc_id", _BLOCK_PHRASES)}
SELECT b.doc_id, b.n_tokens, b.n_matches, b.n_phrases, b.blocked
FROM bl_out b CROSS JOIN guard
WHERE guard.ok = 1
ORDER BY b.doc_id
"""


QUERIES["blocklist_filter_docs"] = Query(
    blocklist_filter_docs, _blocklist_oracle(), tags=("text", "quality")
)


# ------------------------------------------------ per-domain quotas
_DOMAIN_CAP = 3


def domain_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document quota over the derived URL fixture — the
    crawl pipeline's "at most N pages per site" budget.  Deterministic
    md5-priority survivors (re-run stable), WindowGroupLimit pushes
    the cap below the shuffle (plan-asserted in tests)."""
    from dataclass_array_spark.operators.sampling import cap_per_key
    from dataclass_array_spark.operators.url import url_host

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    u = d.select(
        F.col("doc_id"), url_host(_url_expr_spark()).alias("host")
    )
    kept = cap_per_key(u, ["host"], _DOMAIN_CAP, ["doc_id"])
    return kept.select("host", "doc_id").orderBy("host", "doc_id")


def _domain_cap_oracle() -> str:
    from dataclass_array_spark.operators.sampling import sql_cap_per_key_pred
    from dataclass_array_spark.operators.url import host_sql

    pred = sql_cap_per_key_pred(["host"], _DOMAIN_CAP, ["doc_id"])
    return f"""
WITH u AS (SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents),
h AS (SELECT doc_id, {host_sql('url')} AS host FROM u)
SELECT host, doc_id FROM h
QUALIFY {pred}
ORDER BY host, doc_id
"""


QUERIES["domain_cap_docs"] = Query(
    domain_cap_docs, _domain_cap_oracle(), tags=("sampling", "url")
)
