"""In-engine logistic-regression training (round-14 VERDICT item 3):
three-way differential — Spark classifier_fit ≡ unrolled DuckDB mirror
≡ straight-line Python reference (floats are IEEE doubles, so an
op-order-faithful Python replica must match BIT-FOR-BIT) — plus
learning-direction sanity and the scoring handoff."""

import hashlib
import math
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from dataclass_array_spark.operators.classifier import (
    R_SCALE,
    W_SCALE,
    classifier_fit,
    classifier_score,
    fit_weights_for_scoring,
    sql_classifier_fit_ctes,
    sql_feature_bucket,
    sql_ngram_feats,
)

DOCS = [
    (1, "the quick brown fox jumps over the dog", 1),
    (2, "lorem ipsum dolor sit amet", 0),
    (3, "the quick red fox runs", 1),
    (4, "dolor sit amet consectetur adipiscing", 0),
    (5, "fox fox quick brown the", 1),
    (6, "amet amet lorem ipsum", 0),
    (7, "a quick dog jumps", 1),
    (8, "consectetur lorem dolor", 0),
]
NB, LR, IT = 64, 0.5, 3


def _py_tokens(t):
    return [w for w in re.split(r"\s+", t.strip().lower()) if w]


def _py_feats(t):
    ts = _py_tokens(t)
    return ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]


def _py_bucket(f, nb):
    h = hashlib.md5(("clf|" + f).encode()).hexdigest()
    return int(h[:15], 16) % nb


def _py_exp_exact(x):
    ln2 = 0.6931471805599453
    k = math.floor(x / ln2 + 0.5)
    r = x - k * ln2
    term, acc = r, 1.0 + r
    for i in range(2, 18):
        term = term * r / float(i)
        acc = acc + term
    if k >= 0:
        scale = float(1 << (k // 2)) * float(1 << (k - k // 2))
    else:
        scale = 1.0 / (
            float(1 << ((-k) // 2)) * float(1 << ((-k) - (-k) // 2))
        )
    return acc * scale


def _py_fit(docs, nb, lr, n_iters):
    inst = [
        (d, y, _py_bucket(f, nb)) for d, t, y in docs for f in _py_feats(t)
    ]
    ws = [0] * nb
    for _ in range(n_iters):
        per = {}
        for d, y, b in inst:
            e = per.setdefault(d, [y, 0, 0])
            e[1] += 1
            e[2] += ws[b]
        rq = {}
        for d, (y, n, dot) in per.items():
            m = (float(dot) / float(W_SCALE)) / float(n)
            p = 1.0 / (1.0 + _py_exp_exact(-m))
            rq[d] = math.floor(((p - float(y)) / float(n)) * float(R_SCALE))
        g = [0] * nb
        for d, y, b in inst:
            g[b] += rq[d]
        for b in range(nb):
            ws[b] -= math.floor(lr * float(g[b]) * 1e-06)
    return ws


def test_fit_three_way_bitexact(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y long")
    got = {
        r["bucket"]: r["ws"]
        for r in classifier_fit(
            df, "text", "doc_id", "y", NB, lr=LR, n_iters=IT
        ).collect()
    }
    assert len(got) == NB

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, y BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", DOCS)
    from dataclass_array_spark.operators import text as tx

    toks = tx.SQL_TOKENS.format(t="text")
    q = f"""
WITH toks AS (SELECT doc_id, {toks} AS toks FROM documents),
feats AS (
  {sql_ngram_feats("toks")}
),
fb AS (SELECT doc_id, {sql_feature_bucket("f", NB)} AS bucket FROM feats),
lab AS (SELECT doc_id, CAST(y AS DOUBLE) AS y FROM documents),
{sql_classifier_fit_ctes("fb", "lab", NB, LR, IT)}
SELECT bucket, ws FROM wfit ORDER BY bucket
"""
    want = {r[0]: r[1] for r in con.sql(q).fetchall()}
    assert got == want

    pyws = _py_fit(DOCS, NB, LR, IT)
    assert got == {b: pyws[b] for b in range(NB)}


def test_fit_learns_the_separation(spark):
    """After training, positive-labeled docs must score a higher mean
    margin than negative-labeled docs (the corpus is separable by
    construction)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y long")
    fit = classifier_fit(df, "text", "doc_id", "y", NB, lr=LR, n_iters=IT)
    scored = classifier_score(
        df, fit_weights_for_scoring(fit), "text", "doc_id", NB
    )
    rows = {r["doc_id"]: r["margin"] for r in scored.collect()}
    pos = [rows[d] for d, _, y in DOCS if y == 1]
    neg = [rows[d] for d, _, y in DOCS if y == 0]
    assert min(pos) > max(neg), (pos, neg)


def test_fit_scoring_handoff_is_exact_decimal(spark):
    """fit_weights_for_scoring must convert ws/10^9 EXACTLY (decimal
    path, not the lossy double w column)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y long")
    fit = classifier_fit(df, "text", "doc_id", "y", NB, lr=LR, n_iters=2)
    w = {
        r["bucket"]: r["w"]
        for r in fit_weights_for_scoring(fit).collect()
    }
    ws = {r["bucket"]: r["ws"] for r in fit.collect()}
    from decimal import Decimal

    for b, v in w.items():
        assert v == Decimal(ws[b]) / Decimal(10) ** 9, b


def test_fit_featureless_docs_are_inert(spark):
    """A doc with no tokens contributes no instances, hence no
    gradient — training with it present must equal training without."""
    df1 = spark.createDataFrame(DOCS, "doc_id long, text string, y long")
    df2 = spark.createDataFrame(
        DOCS + [(99, "   ", 1)], "doc_id long, text string, y long"
    )
    a = sorted(
        map(
            tuple,
            classifier_fit(df1, "text", "doc_id", "y", NB, n_iters=2)
            .select("bucket", "ws")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            classifier_fit(df2, "text", "doc_id", "y", NB, n_iters=2)
            .select("bucket", "ws")
            .collect(),
        )
    )
    assert a == b


def test_fit_rejects_bad_params(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y long")
    with pytest.raises(ValueError, match="nbuckets"):
        classifier_fit(df, "text", "doc_id", "y", 0)
    with pytest.raises(ValueError, match="n_iters"):
        classifier_fit(df, "text", "doc_id", "y", 8, n_iters=0)
