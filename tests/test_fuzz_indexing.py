"""Hypothesis differential fuzzing of batch indexing + reshape against
the numpy oracle — the randomized generalization of the hand-picked
cases in tests/test_indexing.py (reference strategy:
array_dataclass_test.py:459-494 ``test_normalize_indices``).

Every generated index expression is evaluated BOTH ways: numpy on the
backing ndarray and the Spark table's rowid-arithmetic compiler.  The
result (shape, values) must match exactly — and when numpy raises
IndexError, the table must raise IndexError too, so the error surface
is fuzzed along with the happy path.

Tables are cached per batch shape (they're immutable), so the per-
example cost is one small Spark job, not a table build.
"""

import numpy as np
import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

import dataclass_array_spark as das
from dataclass_array_spark.core.schema import f32
from tests.conftest import assert_np_equal


@das.dataclass_array(broadcast=True, cast_dtype=True)
class P(das.DcaTable):
    v: f32


_CACHE: dict = {}


def cached(shape, spark):
    if shape not in _CACHE:
        n = int(np.prod(shape))
        v = np.arange(n, dtype=np.float32).reshape(shape)
        _CACHE[shape] = (P(spark, v=v), v)
    return _CACHE[shape]


SHAPES = st.lists(st.integers(1, 4), min_size=1, max_size=3).map(tuple)


@st.composite
def shape_and_index(draw):
    """A batch shape plus a basic-index tuple: ints (possibly out of
    bounds), positive-step slices, Nones, and at most one Ellipsis —
    numpy decides validity, so both the happy and IndexError paths
    are exercised."""
    shape = draw(SHAPES)
    ndim = len(shape)
    n_real = draw(st.integers(0, min(ndim + 1, 3)))  # +1 → too-many-indices path
    atom = st.one_of(
        st.integers(-5, 5),
        st.builds(
            slice,
            st.one_of(st.none(), st.integers(-5, 5)),
            st.one_of(st.none(), st.integers(-5, 5)),
            st.one_of(st.none(), st.integers(1, 3)),
        ),
    )
    parts = [draw(atom) for _ in range(n_real)]
    for _ in range(draw(st.integers(0, 2))):  # sprinkle in None (new axes)
        parts.insert(draw(st.integers(0, len(parts))), None)
    if draw(st.booleans()):
        parts.insert(draw(st.integers(0, len(parts))), Ellipsis)
    return shape, tuple(parts)


@settings(
    max_examples=200,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(shape_and_index())
def test_fuzz_basic_indexing(spark, si):
    shape, idx = si
    p, v = cached(shape, spark)
    try:
        exp = v[idx]
    except IndexError:
        with pytest.raises(IndexError):
            p[idx]
        return
    got = p[idx]
    assert got.shape == exp.shape
    assert_np_equal(got, {"v": exp})


@settings(max_examples=120, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_fuzz_mask_and_gather(spark, data):
    shape = data.draw(SHAPES)
    p, v = cached(shape, spark)
    if data.draw(st.booleans(), label="mask?"):
        # boolean mask over the leading k batch dims; size is sometimes
        # deliberately wrong so the IndexError surface is fuzzed too
        k = data.draw(st.integers(1, len(shape)), label="mask_rank")
        want = int(np.prod(shape[:k]))
        n = data.draw(
            st.one_of(st.just(want), st.integers(max(1, want - 2), want + 2)),
            label="mask_len",
        )
        bits = data.draw(
            st.lists(st.booleans(), min_size=n, max_size=n), label="mask"
        )
        if n == want:
            mask = np.array(bits).reshape(shape[:k])
            assert_np_equal(p[mask], {"v": v[mask]})
        else:
            mask = np.array(bits)  # 1-D, wrong length for axis 0
            try:
                exp = v[mask]
            except IndexError:
                with pytest.raises(IndexError):
                    p[mask]
                return
            assert_np_equal(p[mask], {"v": exp})
    else:
        # integer-array gather along axis 0 (1-D or 2-D index array),
        # occasionally out of bounds — numpy decides validity
        d0 = shape[0]
        flat = data.draw(
            st.lists(st.integers(-d0 - 1, d0), min_size=1, max_size=6),
            label="gather",
        )
        if len(flat) % 2 == 0 and data.draw(st.booleans(), label="2d?"):
            g = np.array(flat).reshape(2, -1)
        else:
            g = np.array(flat)
        try:
            exp = v[g]
        except IndexError:
            with pytest.raises(IndexError):
                p[g]
            return
        assert_np_equal(p[g], {"v": exp})


@st.composite
def reshape_case(draw):
    """Shape + einops pattern 'a b c -> (per rhs grouping of a permutation)'
    — the oracle is transpose(perm).reshape(grouped)."""
    ndim = draw(st.integers(2, 3))
    shape = tuple(draw(st.integers(1, 4)) for _ in range(ndim))
    names = list("abc"[:ndim])
    perm = draw(st.permutations(list(range(ndim))))
    # random grouping of the permuted atoms into 1..ndim rhs groups
    cuts = sorted(draw(st.sets(st.integers(1, ndim - 1), max_size=ndim - 1))) + [ndim]
    groups, lo = [], 0
    for c in cuts:
        groups.append(perm[lo:c])
        lo = c
    rhs = " ".join(
        ("(" + " ".join(names[i] for i in g) + ")") if len(g) > 1 else names[g[0]]
        for g in groups
        if g
    )
    return shape, f"{' '.join(names)} -> {rhs}", perm, groups


@settings(max_examples=90, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(reshape_case())
def test_fuzz_einops_reshape(spark, case):
    shape, pattern, perm, groups = case
    p, v = cached(shape, spark)
    got = p.reshape(pattern)
    new_shape = tuple(
        int(np.prod([shape[i] for i in g])) for g in groups if g
    )
    exp = v.transpose(perm).reshape(new_shape)
    assert got.shape == exp.shape
    assert_np_equal(got, {"v": exp})


@settings(max_examples=40, deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_fuzz_tuple_reshape(spark, data):
    shape = data.draw(SHAPES)
    p, v = cached(shape, spark)
    n = int(np.prod(shape))
    # random factorization of n (with optional -1 wildcard)
    dims = []
    rem = n
    while rem > 1 and len(dims) < 3:
        d = data.draw(
            st.sampled_from([d for d in range(1, rem + 1) if rem % d == 0]),
            label="factor",
        )
        dims.append(d)
        rem //= d
    if rem > 1 or not dims:
        dims.append(rem)
    if data.draw(st.booleans(), label="wildcard?") and dims:
        dims[data.draw(st.integers(0, len(dims) - 1), label="wild_pos")] = -1
    got = p.reshape(tuple(dims))
    exp = v.reshape(tuple(dims))
    assert got.shape == exp.shape
    assert_np_equal(got, {"v": exp})
