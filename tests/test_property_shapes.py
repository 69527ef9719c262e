"""Hypothesis property tests: random batch shapes / slices / reshapes
must agree with numpy exactly (differential oracle, reference
test-normalize-indices style but generative)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import dataclass_array_spark as das
from dataclass_array_spark.core.schema import f32
from tests.conftest import assert_np_equal


@das.dataclass_array(broadcast=True, cast_dtype=True)
class PV(das.DcaTable):
    v: f32


shapes = st.lists(st.integers(1, 4), min_size=1, max_size=3).map(tuple)


def make(shape, spark):
    n = int(np.prod(shape))
    v = np.arange(n, dtype=np.float32).reshape(shape)
    return PV(spark, v=v), v


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(shape=shapes, data=st.data())
def test_random_slices_match_numpy(spark, shape, data):
    p, v = make(shape, spark)
    idx = []
    for d in shape[: data.draw(st.integers(0, len(shape)))]:
        kind = data.draw(st.sampled_from(["int", "slice", "full"]))
        if kind == "int":
            idx.append(data.draw(st.integers(-d, d - 1)))
        elif kind == "slice":
            a = data.draw(st.integers(0, d))
            b = data.draw(st.integers(a, d))
            step = data.draw(st.integers(1, 2))
            idx.append(slice(a, b, step))
        else:
            idx.append(slice(None))
    idx = tuple(idx)
    exp = v[idx]
    got = p[idx]
    assert got.shape == exp.shape
    if exp.size:
        assert_np_equal(got, {"v": exp})


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(shape=shapes)
def test_flatten_reshape_roundtrip(spark, shape):
    p, v = make(shape, spark)
    back = p.flatten().reshape(shape)
    assert_np_equal(back, {"v": v})


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(shape=st.lists(st.integers(1, 4), min_size=2, max_size=2).map(tuple))
def test_transpose_involution(spark, shape):
    p, v = make(shape, spark)
    t2 = p.reshape("a b -> b a").reshape("a b -> b a")
    assert_np_equal(t2, {"v": v})


# ---------------------------------------------------------------- quality ops
from hypothesis import given, settings, strategies as st


@st.composite
def _docs(draw):
    words = ["aa", "bb", "cc", "dd", "ee"]
    n = draw(st.integers(0, 12))
    return " ".join(draw(st.lists(st.sampled_from(words), min_size=n, max_size=n)))


@settings(max_examples=12, deadline=None)
@given(st.lists(_docs(), min_size=1, max_size=5))
def test_repetition_metrics_match_python(spark, texts):
    import pandas as pd
    from collections import Counter
    from dataclass_array_spark.operators.quality import repetition_metrics

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = {r["doc_id"]: r for r in repetition_metrics(df, "text", "doc_id").collect()}
    for i, text in enumerate(texts):
        toks = [t for t in text.lower().strip().split() if t]
        r = got[i]
        assert r["n_tokens"] == len(toks)
        exp_dup = 1.0 - len(set(toks)) / len(toks) if toks else 0.0
        assert abs(r["dup_word_frac"] - exp_dup) < 1e-12
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if bigrams:
            cnt = Counter(bigrams)
            # tie-break: highest count, lexicographically smallest gram
            best_n = max(cnt.values())
            best_g = min(g for g, c in cnt.items() if c == best_n)
            assert r["top_bigram"] == best_g and r["top_bigram_count"] == best_n
            exp_cf = best_n * len(best_g) / len(text) if len(text) else 0.0
            assert abs(r["top_bigram_char_frac"] - exp_cf) < 1e-12
        else:
            assert r["top_bigram"] is None and r["top_bigram_count"] == 0


# ------------------------------------------- round-4: mask/gather/concat
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(1, 8), data=st.data())
def test_random_mask_matches_numpy(spark, n, data):
    p, v = make((n,), spark)
    m = np.array(data.draw(st.lists(st.booleans(), min_size=n, max_size=n)))
    exp = v[m]
    got = p[m]
    assert got.shape == exp.shape
    if exp.size:
        assert_np_equal(got, {"v": exp})


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(1, 8), data=st.data())
def test_random_gather_matches_numpy(spark, n, data):
    p, v = make((n,), spark)
    idx = np.array(
        data.draw(st.lists(st.integers(-n, n - 1), min_size=0, max_size=6)),
        dtype=np.int64,
    )
    exp = v[idx]
    got = p[idx]
    assert got.shape == exp.shape
    if exp.size:
        assert_np_equal(got, {"v": exp})


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(2, 8), data=st.data())
def test_concat_split_roundtrip(spark, n, data):
    p, v = make((n,), spark)
    cut = data.draw(st.integers(1, n - 1))
    back = das.concat([p[:cut], p[cut:]])
    assert_np_equal(back, {"v": v})


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(k=st.integers(1, 4), m=st.integers(1, 4))
def test_broadcast_to_matches_numpy(spark, k, m):
    p, v = make((1, k), spark)
    got = p.broadcast_to((m, k))
    assert_np_equal(got, {"v": np.broadcast_to(v, (m, k))})
