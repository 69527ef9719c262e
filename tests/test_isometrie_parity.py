"""Reference-parity tests for the matrix-field fixture (reference
``Isometrie``, array_dataclass_test.py:78-102: r f32['... 3 3'],
t i32[..., 2]) — the shape-operator surface and vectorized methods must
behave exactly like numpy on a rank-2 field."""

import numpy as np
import pytest
import pyspark.sql.functions as F

import dataclass_array_spark as das
from dataclass_array_spark.core.schema import f32, i32


@das.dataclass_array(broadcast=True, cast_dtype=True)
class Isometrie(das.DcaTable):
    r: f32["*batch 3 3"]
    t: i32["*batch 2"]

    @das.vectorize_method
    def det_like(self):
        # traced rank-2 surface: indexing + products (not a full det,
        # the 2x2 minor — enough to pin indexing semantics)
        return {
            "m00": self.r[0, 0] * self.r[1, 1] - self.r[0, 1] * self.r[1, 0]
        }


def make(spark, shape):
    n = int(np.prod(shape)) if shape else 1
    r = (np.arange(n * 9, dtype=np.float32) / 7.0).reshape(shape + (3, 3))
    t = np.arange(n * 2, dtype=np.int32).reshape(shape + (2,))
    return Isometrie(spark, r=r, t=t), r, t


def test_construct_and_shapes(spark):
    iso, r, t = make(spark, (4,))
    assert iso.shape == (4,)
    f = iso.to_numpy_fields()
    assert f["r"].shape == (4, 3, 3) and f["r"].dtype == np.float32
    assert f["t"].shape == (4, 2) and f["t"].dtype == np.int32
    np.testing.assert_array_equal(f["r"], r)


def test_broadcast_scalar_ctor(spark):
    # reference: broadcast=True allows scalar -> batch at construction
    iso = Isometrie(
        spark,
        r=np.eye(3, dtype=np.float32),
        t=np.zeros((5, 2), dtype=np.int32),
    )
    assert iso.shape == (5,)
    np.testing.assert_array_equal(
        iso.to_numpy_fields()["r"], np.broadcast_to(np.eye(3), (5, 3, 3))
    )


@pytest.mark.parametrize(
    "shape,op",
    [
        ((6,), lambda x: x[2:5]),
        ((6,), lambda x: x[3]),
        ((2, 3), lambda x: x[1]),
        ((2, 3), lambda x: x[:, 1]),
        ((6,), lambda x: x.reshape((2, 3))),
        ((2, 3), lambda x: x.flatten()),
    ],
)
def test_shape_ops_match_numpy(spark, shape, op):
    iso, r, t = make(spark, shape)
    got = op(iso)
    exp_r = op(r[..., 0, 0])  # numpy applies the same batch-dim op
    # compare via the (0,0) element of each matrix, which tracks rows
    f = got.to_numpy_fields()
    np.testing.assert_array_equal(f["r"][..., 0, 0], exp_r)
    assert f["r"].shape == exp_r.shape + (3, 3)


def test_mask_and_concat(spark):
    iso, r, t = make(spark, (6,))
    mask = np.array([True, False, True, True, False, True])
    kept = iso[mask]
    np.testing.assert_array_equal(kept.to_numpy_fields()["r"], r[mask])
    both = das.concat([kept, kept])
    assert both.shape == (8,)
    np.testing.assert_array_equal(
        both.to_numpy_fields()["r"], np.concatenate([r[mask], r[mask]])
    )


def test_vectorized_matrix_indexing(spark):
    iso, r, t = make(spark, (5,))
    out = iso.det_like().to_numpy_fields()["m00"]
    # the traced expression computes in float32 (the field dtype), so
    # the numpy reference must too — then results are bit-identical
    exp = r[:, 0, 0] * r[:, 1, 1] - r[:, 0, 1] * r[:, 1, 0]
    np.testing.assert_array_equal(out, exp)


def test_stack_matrix_fields(spark):
    a, ra, _ = make(spark, (3,))
    b, rb, _ = make(spark, (3,))
    s = das.stack([a, b])
    assert s.shape == (2, 3)
    f = s.to_numpy_fields()
    np.testing.assert_array_equal(f["r"], np.stack([ra, rb]))
