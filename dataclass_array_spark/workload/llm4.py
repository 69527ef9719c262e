"""Round-12/13 query extensions: BPE tokenizer training + encoding
(sequential and provably-equal batched forms), URL/domain
canonicalization + URL-level dedup + PSL registrable-domain rollups
(the first pass of every crawl pipeline), a zipfian-skew salted
aggregation stress gate, the q-digest mergeable rank sketch,
Kneser-Ney LM scoring (self + held-out), the hashed-n-gram linear
classifier + DSIR importance weights, PMI collocations, and CCNet
perplexity buckets.

Same contract as :mod:`workload.llm`: every query binds an operator to
the driver tables and carries a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclass_array_spark.operators import text as tx
from dataclass_array_spark.workload.base import (
    fresh_stream_tmpdir,
    load_tables,
    spread,
)
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


def bpe_train_batched_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`bpe_train_docs` with ``batch_pairs=16`` — up to 16
    mutually non-conflicting merges accepted per pair-count round and
    applied in ONE fold pass, provably identical to the sequential
    ladder (proof on ``_best_pairs_batch``).  Same oracle VALUES as
    ``bpe_train_docs`` by construction: the batching is the round-13
    fix for the merge-COUNT scale axis (16 merges in 10 rounds on the
    sf0.01 corpus — early rounds conflict densely over the hot
    characters, batch width grows as the vocabulary spreads; a
    production 30-50k-merge vocab drops from tens of thousands of
    sequential Spark jobs to hundreds of batches)."""
    from dataclass_array_spark.operators.bpe import bpe_train

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    return bpe_train(
        d, "text", _BPE_MERGES, min_count=_BPE_MIN_COUNT, batch_pairs=16
    ).orderBy("merge_rank")


QUERIES["bpe_train_batched_docs"] = Query(
    bpe_train_batched_docs, _bpe_train_oracle(), tags=("text", "tokenizer")
)


def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-encode: segment every document with the corpus's own
    BPE merges → (doc_id, n_bpe_tokens, toks_json).  The iterative part
    runs over the DISTINCT-WORD table only; documents get their
    segmentations back via one corpus-side join (unhinted — both sides
    corpus-derived).  Training runs batched (``batch_pairs=16`` —
    provably identical merges, fewer sequential jobs); the oracle is
    unchanged by the equality proof."""
    from dataclass_array_spark.operators.bpe import bpe_encode, bpe_train

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    merges = bpe_train(
        d, "text", _BPE_MERGES, min_count=_BPE_MIN_COUNT, batch_pairs=16
    )
    return bpe_encode(d, "text", "doc_id", merges).orderBy("doc_id")


def _bpe_encode_oracle() -> str:
    from dataclass_array_spark.operators.bpe import bpe_encode_sql_ctes

    ctes = bpe_encode_sql_ctes(_SQL_TOKS, _BPE_MERGES, _BPE_MIN_COUNT)
    return f"WITH {ctes}\nSELECT * FROM encoded ORDER BY doc_id"


QUERIES["bpe_encode_docs"] = Query(
    bpe_encode_docs, _bpe_encode_oracle(), tags=("text", "tokenizer")
)


# ------------------------------------------------ URL canonical dedup
def _url_expr_spark():
    """Deterministic URL fixture derived from documents columns — six
    variants per doc_id exercising scheme/host case-folding, default
    ports, tracking params (incl. a bare valueless one), fragments,
    userinfo, dot segments, percent-encoding normalization, a
    multi-label public suffix (``co.uk``), and the non-URL fallback;
    variants 0/1 and 2/3 canonicalize to the SAME url, so the dedup
    has real work to do."""
    v = F.col("doc_id") % 6
    page = (F.col("doc_id") % 40).cast("string")
    src = F.col("source")
    c = F.concat
    L = F.lit
    return (
        F.when(v == 0, c(L("HTTP://WWW."), src, L(".COM:80/page/"), page,
                         L("?utm_source=feed&id=1#top")))
        .when(v == 1, c(L("http://www."), src, L(".com/a/../page/./"), page,
                        L("?id=1&gclid")))
        .when(v == 2, c(L("https://U:p@CDN."), src, L(".com:443/asset%20"),
                        page, L("?b=2&gclid=xyz")))
        .when(v == 3, c(L("https://cdn."), src, L(".com/%61sset%20"), page,
                        L("?b=2")))
        .when(v == 4, c(L("https://a.shop."), src, L(".co.uk/item/"), page))
        .otherwise(c(src, L(".com/bare/"), page))
    )


_URL_EXPR_SQL = """CASE doc_id % 6
  WHEN 0 THEN 'HTTP://WWW.' || source || '.COM:80/page/' || CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&id=1#top'
  WHEN 1 THEN 'http://www.' || source || '.com/a/../page/./' || CAST(doc_id % 40 AS VARCHAR) || '?id=1&gclid'
  WHEN 2 THEN 'https://U:p@CDN.' || source || '.com:443/asset%20' || CAST(doc_id % 40 AS VARCHAR) || '?b=2&gclid=xyz'
  WHEN 3 THEN 'https://cdn.' || source || '.com/%61sset%20' || CAST(doc_id % 40 AS VARCHAR) || '?b=2'
  WHEN 4 THEN 'https://a.shop.' || source || '.co.uk/item/' || CAST(doc_id % 40 AS VARCHAR)
  ELSE source || '.com/bare/' || CAST(doc_id % 40 AS VARCHAR)
END"""


def url_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup after canonicalization (``operators/url.py``) —
    the crawl pipeline's first pass.  One map-side-combined aggregation
    on the in-scan canonical string; variants that differ only in
    scheme/host case, default ports, tracking params, fragments or
    userinfo collapse to one representative."""
    from dataclass_array_spark.operators.url import dedup_urls

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    u = d.select(F.col("doc_id"), _url_expr_spark().alias("url"))
    return dedup_urls(u, "url", "doc_id").orderBy("canon_url")


def _url_dedup_oracle() -> str:
    from dataclass_array_spark.operators.url import canon_sql

    return f"""
WITH u AS (SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents)
SELECT {canon_sql('url')} AS canon_url,
       CAST(MIN(doc_id) AS BIGINT) AS rep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM u
GROUP BY 1
ORDER BY canon_url
"""


QUERIES["url_dedup_docs"] = Query(
    url_dedup_docs, _url_dedup_oracle(), tags=("dedup", "url")
)


# ------------------------------------------------ zipfian skew stress
def skew_zipf_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation under GENUINE zipf-style key skew:
    the grouping key is the orderkey's bit length, so bucket b holds
    ~2^b of the uniform keys — the top bucket owns ~half of ALL rows
    (the existing salted gate's l_returnflag is low-cardinality but
    BALANCED; this one is the hot-key shape that actually melts a
    reducer at 100 TB).  Salting spreads the hot bucket over 32
    partial states; decimal sums are association-safe, so the oracle
    is the plain one-stage GROUP BY.  Measured skew/no-skew delta in
    PERF.md round 12; salt fan-out plan-asserted in
    tests/test_plans.py."""
    from dataclass_array_spark.operators.skew import salted_sum
    from dataclass_array_spark.workload.base import dec_to_double

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    zb = F.length(F.bin(F.col("l_orderkey"))).cast("long").alias("zb")
    out = salted_sum(
        li.select(zb, "l_extendedprice", "l_quantity"),
        ["zb"],
        {
            "sum_price": F.col("l_extendedprice").cast("decimal(25,6)"),
            "sum_qty": F.col("l_quantity").cast("decimal(25,6)"),
        },
        n_salts=32,
    )
    return out.select(
        "zb",
        dec_to_double(F.col("sum_price")).alias("sum_price"),
        dec_to_double(F.col("sum_qty")).alias("sum_qty"),
        "n_rows",
    ).orderBy("zb")


def _skew_zipf_oracle() -> str:
    from dataclass_array_spark.workload.base import sql_dsum

    return f"""
SELECT CAST(length(bin(l_orderkey)) AS BIGINT) AS zb,
       {sql_dsum('l_extendedprice', 'sum_price')},
       {sql_dsum('l_quantity', 'sum_qty')},
       COUNT(*) AS n_rows
FROM lineitem GROUP BY 1 ORDER BY zb
"""


QUERIES["skew_zipf_salted_agg"] = Query(
    skew_zipf_salted_agg, _skew_zipf_oracle(), tags=("agg", "skew")
)


# ------------------------------------------------ q-digest quantiles
_QD_BITS = 12
_QD_K = 64
_QD_PS = [0.5, 0.95, 0.99]


def qdigest_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag p50/p95/p99 price estimates from the RANK-based
    q-digest sketch (``operators/qdigest.py``) — the heavy-tail
    complement to `hist_quantiles_prices`' equi-width histogram: error
    is bounded in RANKS (≤ bits·n/k), not bucket widths.  Fully
    deterministic (greedy bottom-up compression, integer trie), so the
    oracle replays the digest node-for-node and the estimates
    bit-for-bit."""
    from dataclass_array_spark.operators.qdigest import (
        qdigest_build,
        qdigest_quantiles,
    )

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    r = li.agg(
        F.min(F.col("l_extendedprice").cast("double")),
        F.max(F.col("l_extendedprice").cast("double")),
    ).collect()[0]
    lo, hi = float(r[0]), float(r[1])
    d = qdigest_build(
        li, ["l_returnflag"], "l_extendedprice", lo, hi, _QD_BITS, _QD_K
    )
    return qdigest_quantiles(
        d, ["l_returnflag"], _QD_PS, lo, hi, _QD_BITS
    ).orderBy("l_returnflag")


def _qdigest_oracle() -> str:
    from dataclass_array_spark.operators.qdigest import (
        qdigest_quantiles_sql,
        qdigest_sql_ctes,
    )

    x = "CAST(l_extendedprice AS DOUBLE)"
    return f"""
WITH bnd AS (SELECT MIN({x}) AS lo, MAX({x}) AS hi FROM lineitem),
{qdigest_sql_ctes("lineitem", ["l_returnflag"], x, _QD_BITS, _QD_K)},
{qdigest_quantiles_sql(["l_returnflag"], _QD_PS, _QD_BITS)}
ORDER BY l_returnflag
"""


QUERIES["qdigest_quantiles_prices"] = Query(
    qdigest_quantiles_prices, _qdigest_oracle(), tags=("sketch", "approx")
)


def streaming_qdigest_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming q-digest: per-batch LEAF histograms (2^bits buckets)
    stream through the replay-safe batch-partitioned hist sink and
    cell-SUM merge on read; ONE compression over the merged leaves then
    equals the single-shot batch digest EXACTLY (leaf merge is exact —
    stronger than node-level digest merge, which is also valid but
    carries the merged error bound).  Oracle = the batch q-digest
    oracle verbatim."""
    from dataclass_array_spark.operators.qdigest import (
        qdigest_compress,
        qdigest_quantiles,
    )
    from dataclass_array_spark.streaming import hist_stream
    from dataclass_array_spark.streaming.core import _parquet_stream

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    r = li.agg(
        F.min(F.col("l_extendedprice").cast("double")),
        F.max(F.col("l_extendedprice").cast("double")),
    ).collect()[0]
    lo, hi = float(r[0]), float(r[1])
    s = _parquet_stream(
        spark.readStream.schema(li.schema), f"{sf_dir}/lineitem.parquet"
    ).select("l_returnflag", "l_extendedprice")
    tmp = fresh_stream_tmpdir("qdigest", sf_dir)
    leaves = hist_stream(
        s, ["l_returnflag"], "l_extendedprice", lo, hi,
        output_dir=f"{tmp}/out", checkpoint_dir=f"{tmp}/ckpt",
        nbuckets=1 << _QD_BITS,
    ).withColumnRenamed("bucket", "id")
    d = qdigest_compress(leaves, ["l_returnflag"], _QD_BITS, _QD_K)
    return qdigest_quantiles(
        d, ["l_returnflag"], _QD_PS, lo, hi, _QD_BITS
    ).orderBy("l_returnflag")


QUERIES["streaming_qdigest_prices"] = Query(
    streaming_qdigest_prices, _qdigest_oracle(), tags=("streaming", "sketch")
)


# ------------------------------------------------ Kneser-Ney LM score
def kneser_ney_lm_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc conditional cross-entropy under the corpus's own
    INTERPOLATED KNESER-NEY bigram LM (D = 3/4) — the
    industry-standard smoothing, completing the LM-quality family
    (unigram → add-one bigram → held-out bigram → KN bigram).  With
    D = 3/4 every probability is a ratio of integers, so ln_exact
    keeps the gate hash-exact."""
    from dataclass_array_spark.operators.text import kneser_ney_xent_scores

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    return kneser_ney_xent_scores(d, "text", "doc_id").orderBy("doc_id")


def _kn_lm_oracle() -> str:
    from dataclass_array_spark.operators.text import sql_ln_exact_dec_ctes

    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
guard AS (
  SELECT CASE WHEN COALESCE(MAX(len(toks)), 0) > 4096
              THEN error('KN_LM_SQL: document exceeds 4096-token oracle cap')
              ELSE 1 END AS ok
  FROM toks
),
big AS (
  SELECT doc_id, gs.i AS pos, toks[gs.i] AS w1, toks[gs.i + 1] AS w2
  FROM toks, generate_series(1, 4095) gs(i)
  WHERE gs.i <= len(toks) - 1
),
cb AS (SELECT w1, w2, CAST(COUNT(*) AS HUGEINT) AS c FROM big GROUP BY w1, w2),
cu AS (
  SELECT w1, CAST(SUM(c) AS HUGEINT) AS cu, CAST(COUNT(*) AS HUGEINT) AS n1w1
  FROM cb GROUP BY w1
),
ncw2 AS (SELECT w2, CAST(COUNT(*) AS HUGEINT) AS ncw2 FROM cb GROUP BY w2),
tt AS (SELECT CAST(COUNT(*) AS HUGEINT) AS t FROM cb),
numt AS (
  SELECT cb.w1, cb.w2,
         (4*cb.c - 3)*(SELECT t FROM tt) + 3*cu.n1w1*ncw2.ncw2 AS c
  FROM cb JOIN cu USING (w1) JOIN ncw2 USING (w2)
),
dent AS (SELECT w1, 4*cu*(SELECT t FROM tt) AS c FROM cu),
{sql_ln_exact_dec_ctes("numt", "w1, w2", "c", "lnnum_t")},
{sql_ln_exact_dec_ctes("dent", "w1", "c", "lnden_t")},
perdoc AS (
  SELECT b.doc_id, COUNT(*) AS m,
         list_reduce(list_prepend(0.0, list((d.ln - n.ln) ORDER BY b.pos)),
                     (a, x) -> a + x) AS s
  FROM big b
  JOIN lnnum_t n ON n.w1 = b.w1 AND n.w2 = b.w2
  JOIN lnden_t d ON d.w1 = b.w1
  GROUP BY b.doc_id
)
SELECT d.doc_id, COALESCE(pd.m, 0) AS n_bigrams,
       COALESCE(pd.s / CAST(pd.m AS DOUBLE), 0.0) AS xent_nats
FROM documents d LEFT JOIN perdoc pd USING (doc_id)
CROSS JOIN guard
WHERE guard.ok = 1
ORDER BY d.doc_id
"""


QUERIES["kneser_ney_lm_docs"] = Query(
    kneser_ney_lm_docs, _kn_lm_oracle(), tags=("text", "quality", "lm")
)


def url_domain_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSL-registrable-domain rollup of the derived URL fixture — the
    crawl-pipeline "per-domain budget" view (domain-level dedup caps,
    per-domain sampling quotas): → (domain, n_hosts, n_urls, n_rows)
    with '' for non-URL rows.  The 100 TB shape: ONE corpus-sized
    map-side-combined aggregation BY HOST (canon URLs embed their
    host, so per-domain distinct-URL counts are exact sums of per-host
    ones), then the public-suffix longest-matching-suffix map
    (``operators/psl.py`` — candidate explode + broadcast rules join)
    runs on the HOST DIMENSION only, then a dimension-sized domain
    rollup.  Round 13: replaces the last-two-label approximation
    (``a.shop.<src>.co.uk`` now rolls up to ``<src>.co.uk``, not
    ``co.uk``)."""
    from dataclass_array_spark.operators.psl import host_registrable_map
    from dataclass_array_spark.operators.url import with_url_columns

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    u = d.select(_url_expr_spark().alias("url"))
    per_host = (
        with_url_columns(u, "url", canon_col="canon", host_col="host")
        .select("host", "canon")
        .groupBy("host")
        .agg(
            F.countDistinct("canon").alias("n_urls"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )
    hd = host_registrable_map(per_host.select("host"), "host")
    return (
        per_host.join(hd, "host")
        .groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_hosts"),
            F.sum("n_urls").cast("long").alias("n_urls"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
        .orderBy("domain")
    )


def _url_domain_stats_oracle() -> str:
    from dataclass_array_spark.operators.psl import registrable_sql_ctes
    from dataclass_array_spark.operators.url import canon_sql, host_sql

    return f"""
WITH u AS (SELECT {_URL_EXPR_SQL} AS url FROM documents),
ph AS (
  SELECT {host_sql('url')} AS host,
         CAST(COUNT(DISTINCT {canon_sql('url')}) AS BIGINT) AS n_urls,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM u GROUP BY 1
),
{registrable_sql_ctes('ph', 'host')}
SELECT m.domain,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(ph.n_urls) AS BIGINT) AS n_urls,
       CAST(SUM(ph.n_rows) AS BIGINT) AS n_rows
FROM ph JOIN psl_map m USING (host)
GROUP BY m.domain ORDER BY domain
"""


QUERIES["url_domain_stats_docs"] = Query(
    url_domain_stats_docs, _url_domain_stats_oracle(), tags=("url", "agg")
)


def bpe_heldout_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production tokenizer workflow: train the BPE merge table on
    one corpus (even doc_ids), encode a DIFFERENT corpus (odd doc_ids)
    with it.  BPE has no OOV failure mode at the character level —
    score-corpus words whose pairs never merged simply stay as finer
    segments — so the held-out encode is exact end-to-end and the
    oracle replays both ladders (train + apply-only) unrolled.
    Training runs batched (``batch_pairs=16`` — provably identical
    merges; oracle unchanged)."""
    from dataclass_array_spark.operators.bpe import bpe_encode, bpe_train

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    train = d.filter(F.col("doc_id") % 2 == 0)
    score = d.filter(F.col("doc_id") % 2 == 1)
    merges = bpe_train(
        train, "text", _BPE_MERGES, min_count=_BPE_MIN_COUNT, batch_pairs=16
    )
    return bpe_encode(score, "text", "doc_id", merges).orderBy("doc_id")


def _bpe_heldout_oracle() -> str:
    from dataclass_array_spark.operators.bpe import bpe_encode_sql_ctes

    ctes = bpe_encode_sql_ctes(
        _SQL_TOKS,
        _BPE_MERGES,
        _BPE_MIN_COUNT,
        train_src="(SELECT * FROM documents WHERE doc_id % 2 = 0)",
        score_src="(SELECT * FROM documents WHERE doc_id % 2 = 1)",
    )
    return f"WITH {ctes}\nSELECT * FROM encoded ORDER BY doc_id"


QUERIES["bpe_heldout_encode_docs"] = Query(
    bpe_heldout_encode_docs, _bpe_heldout_oracle(), tags=("text", "tokenizer")
)


# ------------------------------------------------ held-out Kneser-Ney
def kneser_ney_heldout_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT Kneser-Ney scoring — train the KN bigram LM on the
    English docs, score the WHOLE corpus (the production filter shape;
    CCNet-style: trusted reference corpus → crawl).  Non-English docs
    exercise all three OOV branches (unseen bigram → continuation-
    probability backoff; unseen prefix → pure continuation
    distribution; OOV word → one-context pseudo-continuation floor)
    that the self-scoring ``kneser_ney_lm_docs`` structurally cannot
    reach."""
    from dataclass_array_spark.operators.text import (
        kneser_ney_xent_scores_heldout,
    )

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    return kneser_ney_xent_scores_heldout(
        d.filter(F.col("lang") == "en"), d, "text", "doc_id"
    ).orderBy("doc_id")


def _kn_heldout_oracle() -> str:
    from dataclass_array_spark.operators.text import sql_ln_exact_dec_ctes

    return f"""
WITH toks AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
guard AS (
  SELECT CASE WHEN COALESCE(MAX(len(toks)), 0) > 4096
              THEN error('KN_HELDOUT_SQL: document exceeds 4096-token oracle cap')
              ELSE 1 END AS ok
  FROM toks
),
bigt AS (
  SELECT doc_id, gs.i AS pos, toks[gs.i] AS w1, toks[gs.i + 1] AS w2
  FROM toks, generate_series(1, 4095) gs(i)
  WHERE gs.i <= len(toks) - 1 AND lang = 'en'
),
bigs AS (
  SELECT doc_id, gs.i AS pos, toks[gs.i] AS w1, toks[gs.i + 1] AS w2
  FROM toks, generate_series(1, 4095) gs(i)
  WHERE gs.i <= len(toks) - 1
),
cb AS (SELECT w1, w2, CAST(COUNT(*) AS HUGEINT) AS c FROM bigt GROUP BY w1, w2),
cu AS (
  SELECT w1, CAST(SUM(c) AS HUGEINT) AS cu, CAST(COUNT(*) AS HUGEINT) AS n1w1
  FROM cb GROUP BY w1
),
ncw2 AS (SELECT w2, CAST(COUNT(*) AS HUGEINT) AS ncw2 FROM cb GROUP BY w2),
tt AS (
  SELECT CASE WHEN COUNT(*) = 0
              THEN error('KN_HELDOUT_SQL: empty training corpus (T = 0)')
              ELSE CAST(COUNT(*) AS HUGEINT) END AS t
  FROM cb
),
numt AS (
  SELECT cb.w1, cb.w2,
         (4*cb.c - 3)*(SELECT t FROM tt) + 3*cu.n1w1*ncw2.ncw2 AS c
  FROM cb JOIN cu USING (w1) JOIN ncw2 USING (w2)
),
dent AS (SELECT w1, 4*cu*(SELECT t FROM tt) AS c FROM cu),
b2p AS (
  SELECT DISTINCT b.w1, b.w2, 3*cu.n1w1*COALESCE(nc.ncw2, 1) AS c
  FROM bigs b
  JOIN cu ON cu.w1 = b.w1
  LEFT JOIN ncw2 nc ON nc.w2 = b.w2
  LEFT JOIN cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
  WHERE cb.w1 IS NULL
),
b4w AS (
  SELECT DISTINCT b.w2, COALESCE(nc.ncw2, 1) AS c
  FROM bigs b
  LEFT JOIN cu ON cu.w1 = b.w1
  LEFT JOIN ncw2 nc ON nc.w2 = b.w2
  WHERE cu.w1 IS NULL
),
{sql_ln_exact_dec_ctes("numt", "w1, w2", "c", "lnnum_t")},
{sql_ln_exact_dec_ctes("dent", "w1", "c", "lnden_t")},
{sql_ln_exact_dec_ctes("b2p", "w1, w2", "c", "lnb2_t")},
{sql_ln_exact_dec_ctes("b4w", "w2", "c", "lnb4_t")},
{sql_ln_exact_dec_ctes("tt", "t", "t", "lnt_t")},
perdoc AS (
  SELECT b.doc_id, COUNT(*) AS m,
         list_reduce(list_prepend(0.0, list(
           (CASE WHEN n1.ln IS NOT NULL THEN d.ln - n1.ln
                 WHEN d.ln IS NOT NULL THEN d.ln - n2.ln
                 ELSE g.lnt - n4.ln END) ORDER BY b.pos)),
                     (a, x) -> a + x) AS s
  FROM bigs b
  LEFT JOIN lnnum_t n1 ON n1.w1 = b.w1 AND n1.w2 = b.w2
  LEFT JOIN lnden_t d ON d.w1 = b.w1
  LEFT JOIN lnb2_t n2 ON n2.w1 = b.w1 AND n2.w2 = b.w2
  LEFT JOIN lnb4_t n4 ON n4.w2 = b.w2
  CROSS JOIN (SELECT ln AS lnt FROM lnt_t) g
  GROUP BY b.doc_id
)
SELECT d.doc_id, COALESCE(pd.m, 0) AS n_bigrams,
       COALESCE(pd.s / CAST(pd.m AS DOUBLE), 0.0) AS xent_nats
FROM documents d LEFT JOIN perdoc pd USING (doc_id)
CROSS JOIN guard
WHERE guard.ok = 1
ORDER BY d.doc_id
"""


QUERIES["kneser_ney_heldout_docs"] = Query(
    kneser_ney_heldout_docs, _kn_heldout_oracle(),
    tags=("text", "quality", "lm", "heldout"),
)


# ------------------------------------------------ hashed-n-gram classifier
_CLF_BUCKETS = 4096


def classifier_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-n-gram LINEAR classifier inference over
    the documents corpus (word uni+bigrams → md5 buckets → broadcast
    weight lookup → exact decimal dot product; logistic left to the
    caller).  The weight table is the deterministic
    ``hash_weights`` fixture — a real model supplies its own
    (bucket, w) table of the same shape."""
    from dataclass_array_spark.operators.classifier import (
        classifier_score,
        hash_weights,
    )

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    return classifier_score(
        d, hash_weights(spark, _CLF_BUCKETS), "text", "doc_id", _CLF_BUCKETS
    ).orderBy("doc_id")


def _clf_oracle() -> str:
    from dataclass_array_spark.operators.classifier import (
        sql_feature_bucket,
        sql_hash_weights,
        sql_ngram_feats,
    )

    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
guard AS (
  SELECT CASE WHEN COALESCE(MAX(len(toks)), 0) > 4096
              THEN error('CLF_SQL: document exceeds 4096-token oracle cap')
              ELSE 1 END AS ok
  FROM toks
),
weights AS (
  {sql_hash_weights(_CLF_BUCKETS)}
),
feats AS (
  {sql_ngram_feats("toks")}
),
fb AS (
  SELECT doc_id, {sql_feature_bucket("f", _CLF_BUCKETS)} AS bucket FROM feats
),
perdoc AS (
  SELECT fb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
         CAST(SUM(CAST(COALESCE(w.w, 0) AS DECIMAL(20,9))) AS DECIMAL(38,9)) AS s
  FROM fb LEFT JOIN weights w USING (bucket)
  GROUP BY fb.doc_id
)
SELECT d.doc_id,
       COALESCE(pd.n_features, CAST(0 AS BIGINT)) AS n_features,
       CAST(COALESCE(pd.s, 0) AS DOUBLE) AS score,
       CASE WHEN COALESCE(pd.n_features, 0) > 0
            THEN CAST(pd.s AS DOUBLE) / CAST(pd.n_features AS DOUBLE)
            ELSE 0.0 END AS margin
FROM documents d LEFT JOIN perdoc pd USING (doc_id)
CROSS JOIN guard
WHERE guard.ok = 1
ORDER BY d.doc_id
"""


QUERIES["classifier_quality_docs"] = Query(
    classifier_quality_docs, _clf_oracle(), tags=("text", "quality", "classifier")
)


# ------------------------------------------------ PMI collocations
_PMI_MIN_COUNT = 5
_PMI_TOP_K = 200


def pmi_collocations_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-200 adjacent-pair collocations by pointwise mutual
    information (Church & Hanks) over the documents corpus — the
    phrase-vocabulary construction pass (word2vec-style phrase
    joining).  Every probability is a ratio of integers, so the PMI
    doubles are bit-identical to the DuckDB oracle and the top-k
    order (pmi DESC, w1, w2) is engine-stable."""
    from dataclass_array_spark.operators.text import pmi_collocations

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    return pmi_collocations(
        d, "text", min_count=_PMI_MIN_COUNT, top_k=_PMI_TOP_K
    )


def _pmi_oracle() -> str:
    from dataclass_array_spark.operators.text import sql_ln_exact_ctes

    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
guard AS (
  SELECT CASE WHEN COALESCE(MAX(len(toks)), 0) > 4096
              THEN error('PMI_SQL: document exceeds 4096-token oracle cap')
              ELSE 1 END AS ok
  FROM toks
),
big AS (
  SELECT toks[gs.i] AS w1, toks[gs.i + 1] AS w2
  FROM toks, generate_series(1, 4095) gs(i)
  WHERE gs.i <= len(toks) - 1
),
cb AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM big GROUP BY w1, w2
),
c1 AS (SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS c1 FROM cb GROUP BY w1),
c2 AS (SELECT w2, CAST(SUM(n_pair) AS BIGINT) AS c2 FROM cb GROUP BY w2),
nn AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS n FROM cb),
cand AS (
  SELECT cb.w1, cb.w2, cb.n_pair, c1.c1, c2.c2
  FROM cb JOIN c1 USING (w1) JOIN c2 USING (w2)
  WHERE cb.n_pair >= {_PMI_MIN_COUNT}
),
numt AS (
  SELECT w1, w2, n_pair * (SELECT n FROM nn) AS c FROM cand
),
dent AS (
  SELECT w1, w2, c1 * c2 AS c FROM cand
),
{sql_ln_exact_ctes("numt", "w1, w2", "c", "lnnum_t")},
{sql_ln_exact_ctes("dent", "w1, w2", "c", "lnden_t")}
SELECT cand.w1, cand.w2, cand.n_pair, n.ln - d.ln AS pmi
FROM cand
JOIN lnnum_t n ON n.w1 = cand.w1 AND n.w2 = cand.w2
JOIN lnden_t d ON d.w1 = cand.w1 AND d.w2 = cand.w2
CROSS JOIN guard
WHERE guard.ok = 1
ORDER BY pmi DESC, cand.w1 ASC, cand.w2 ASC
LIMIT {_PMI_TOP_K}
"""


QUERIES["pmi_collocations_docs"] = Query(
    pmi_collocations_docs, _pmi_oracle(), tags=("text", "lm", "phrases")
)


# ------------------------------------------------ DSIR importance weights
_DSIR_BUCKETS = 4096


def dsir_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): hashed-n-gram importance
    weight of every document toward the English-docs TARGET
    distribution, with the whole corpus as SOURCE — the published
    recipe for selecting pre-training data that looks like a trusted
    reference set.  Every ln is ln_exact of a positive integer, so the
    gate is hash-exact against DuckDB."""
    from dataclass_array_spark.operators.classifier import dsir_log_weights

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    return dsir_log_weights(
        d.filter(F.col("lang") == "en"), d, d, "text", "doc_id", _DSIR_BUCKETS
    ).orderBy("doc_id")


def _dsir_oracle() -> str:
    from dataclass_array_spark.operators.classifier import (
        sql_feature_bucket,
        sql_ngram_feats,
        sql_ngram_feats_pos,
    )
    from dataclass_array_spark.operators.text import sql_ln_exact_ctes

    nb = _DSIR_BUCKETS
    bexpr = sql_feature_bucket("f", nb, salt="dsir")
    return f"""
WITH toks AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
guard AS (
  SELECT CASE WHEN COALESCE(MAX(len(toks)), 0) > 4096
              THEN error('DSIR_SQL: document exceeds 4096-token oracle cap')
              ELSE 1 END AS ok
  FROM toks
),
tokst AS (SELECT doc_id, toks FROM toks WHERE lang = 'en'),
featst AS (
  {sql_ngram_feats("tokst")}
),
featss AS (
  {sql_ngram_feats("toks")}
),
ct AS (
  SELECT {bexpr} AS bucket, CAST(COUNT(*) AS BIGINT) AS ct
  FROM featst GROUP BY 1
),
cs AS (
  SELECT {bexpr} AS bucket, CAST(COUNT(*) AS BIGINT) AS cs
  FROM featss GROUP BY 1
),
buckets AS (SELECT gs.i AS bucket FROM generate_series(0, {nb - 1}) gs(i)),
bt AS (
  SELECT b.bucket, COALESCE(ct.ct, 0) + 1 AS c
  FROM buckets b LEFT JOIN ct USING (bucket)
),
bs AS (
  SELECT b.bucket, COALESCE(cs.cs, 0) + 1 AS c
  FROM buckets b LEFT JOIN cs USING (bucket)
),
{sql_ln_exact_ctes("bt", "bucket", "c", "lnt_b")},
{sql_ln_exact_ctes("bs", "bucket", "c", "lns_b")},
delta AS (
  SELECT t.bucket, t.ln - s.ln AS d
  FROM lnt_b t JOIN lns_b s USING (bucket)
),
nt AS (SELECT COALESCE(SUM(ct), 0) + {nb} AS c FROM ct),
ns AS (SELECT COALESCE(SUM(cs), 0) + {nb} AS c FROM cs),
{sql_ln_exact_ctes("nt", "c", "c", "lnnt")},
{sql_ln_exact_ctes("ns", "c", "c", "lnns")},
scal AS (
  SELECT (SELECT ln FROM lnns) - (SELECT ln FROM lnnt) AS scal
),
fp AS (
  {sql_ngram_feats_pos("toks")}
),
fb AS (SELECT doc_id, fpos, {bexpr} AS bucket FROM fp),
perdoc AS (
  SELECT fb.doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         list_reduce(list_prepend(0.0, list(dl.d ORDER BY fb.fpos)),
                     (a, x) -> a + x) AS s
  FROM fb JOIN delta dl USING (bucket)
  GROUP BY fb.doc_id
)
SELECT d.doc_id,
       COALESCE(pd.n, CAST(0 AS BIGINT)) AS n_features,
       COALESCE(pd.s + CAST(pd.n AS DOUBLE) * (SELECT scal FROM scal),
                0.0) AS log_weight
FROM documents d LEFT JOIN perdoc pd USING (doc_id)
CROSS JOIN guard
WHERE guard.ok = 1
ORDER BY d.doc_id
"""


QUERIES["dsir_weights_docs"] = Query(
    dsir_weights_docs, _dsir_oracle(),
    tags=("text", "quality", "sampling", "classifier"),
)


# ------------------------------------------------ CCNet perplexity buckets
def ccnet_buckets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): per
    LANGUAGE, split documents into head/middle/tail terciles of LM
    cross-entropy (head = lowest perplexity = cleanest) — the
    selection step that consumes the KN scores.  ntile ties are fully
    broken by (xent_nats, doc_id); xent doubles are bit-identical
    cross-engine, so the tercile assignment is engine-stable.
    Composition gate: kneser_ney_xent_scores → ``rank.grouped_ntile``
    — the TWO-PHASE exact ntile (round-13 review fix: a window
    partitioned only by low-cardinality ``lang`` is a corpus-sized
    single-task sort at 100 TB; grouped_ntile range-partitions and
    ranks per task, value-identical by differential test)."""
    from dataclass_array_spark.operators.rank import grouped_ntile
    from dataclass_array_spark.operators.text import kneser_ney_xent_scores

    d = spread(load_tables(spark, sf_dir, ["documents"])["documents"])
    scored = kneser_ney_xent_scores(d, "text", "doc_id").join(
        d.select("doc_id", "lang"), "doc_id"
    )
    return (
        grouped_ntile(scored, "lang", ["xent_nats", "doc_id"], 3)
        .select("doc_id", "lang", "xent_nats", "bucket")
        .orderBy("doc_id")
    )


def _ccnet_oracle() -> str:
    kn = _kn_lm_oracle().strip()
    # reuse the KN oracle as a subquery; bucket by per-lang xent terciles
    return f"""
WITH kn AS (
{kn}
)
SELECT kn.doc_id, d.lang, kn.xent_nats,
       CAST(NTILE(3) OVER (PARTITION BY d.lang
                           ORDER BY kn.xent_nats ASC, kn.doc_id ASC)
            AS BIGINT) AS bucket
FROM kn JOIN documents d USING (doc_id)
ORDER BY kn.doc_id
"""


QUERIES["ccnet_buckets_docs"] = Query(
    ccnet_buckets_docs, _ccnet_oracle(), tags=("text", "quality", "sampling")
)


# ------------------------------------------------ two-phase grouped rank
def grouped_rank_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct driver verification of ``rank.grouped_rank``: per
    l_returnflag, the 100 cheapest lineitems by (price, orderkey,
    linenumber) with their EXACT within-group rank — computed by the
    two-phase range-partition + offset machinery (never a single-task
    per-group sort), verified against the window ROW_NUMBER oracle."""
    from dataclass_array_spark.operators.rank import grouped_rank

    t = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    d = spread(
        t.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    )
    ranked = grouped_rank(
        d, "l_returnflag", ["l_extendedprice", "l_orderkey", "l_linenumber"]
    )
    return (
        ranked.filter(F.col("rank") <= 100)
        .select(
            "l_returnflag",
            F.col("rank"),
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "l_extendedprice",
        )
        .orderBy("l_returnflag", "rank")
    )


_GROUPED_RANK_ORACLE = """
WITH r AS (
  SELECT l_returnflag,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC
         ) AS BIGINT) AS rank,
         l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_extendedprice
  FROM lineitem
)
SELECT * FROM r WHERE rank <= 100
ORDER BY l_returnflag, rank
"""


QUERIES["grouped_rank_prices"] = Query(
    grouped_rank_prices, _GROUPED_RANK_ORACLE, tags=("relational", "rank")
)
