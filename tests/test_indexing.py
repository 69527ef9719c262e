"""Differential indexing tests vs numpy (reference
test_normalize_indices pattern, array_dataclass_test.py:459-494)."""

import numpy as np
import pytest

import dataclass_array_spark as das
from dataclass_array_spark.core.schema import f32
from tests.conftest import assert_np_equal


@das.dataclass_array(broadcast=True, cast_dtype=True)
class P(das.DcaTable):
    v: f32


def make(shape, spark):
    n = int(np.prod(shape))
    v = np.arange(n, dtype=np.float32).reshape(shape)
    return P(spark, v=v), v


CASES = [
    ((6,), np.index_exp[2]),
    ((6,), np.index_exp[1:4]),
    ((6,), np.index_exp[::2]),
    ((6,), np.index_exp[-2]),
    ((6,), np.index_exp[None]),
    ((2, 3), np.index_exp[1]),
    ((2, 3), np.index_exp[:, 1]),
    ((2, 3), np.index_exp[..., 2]),
    ((2, 3), np.index_exp[1, :2]),
    ((2, 3), np.index_exp[None, 1]),
    ((2, 3, 2), np.index_exp[..., 0]),
    ((2, 3, 2), np.index_exp[1, ..., 1]),
    ((2, 3, 2), np.index_exp[0:2, 1:3]),
]


@pytest.mark.parametrize("shape,idx", CASES)
def test_basic_indexing_matches_numpy(spark, shape, idx):
    p, v = make(shape, spark)
    got = p[idx]
    exp = v[idx]
    assert got.shape == exp.shape
    assert_np_equal(got, {"v": exp})


def test_mask_and_gather(spark):
    p, v = make((6,), spark)
    mask = np.array([True, False, True, True, False, False])
    assert_np_equal(p[mask], {"v": v[mask]})
    gather = np.array([4, 0, 0, 5])
    assert_np_equal(p[gather], {"v": v[gather]})
    g2 = np.array([[1, 2], [3, 0]])
    assert_np_equal(p[g2], {"v": v[g2]})


def test_index_errors(spark):
    p, v = make((2, 3), spark)
    with pytest.raises(IndexError):
        p[0, 0, 0]
    with pytest.raises(IndexError):
        p[5]
    with pytest.raises(IndexError):
        p[..., 0, ...]


def test_iter(spark):
    p, v = make((3,), spark)
    rows = [t.to_numpy_fields()["v"] for t in p]
    assert [float(r) for r in rows] == [0.0, 1.0, 2.0]


def test_leading_dim_mask(spark):
    """numpy semantics: a rank-k mask over the leading k batch dims
    collapses them; trailing dims survive."""
    import numpy as np

    p, v = make((3, 4), spark)
    mask = np.array([True, False, True])
    assert_np_equal(p[mask], {"v": v[mask]})
    mask2 = v > 5  # full-rank mask → flattened selection
    assert_np_equal(p[mask2], {"v": v[mask2]})
