"""Fixture-matrix shape-op tests, differential against numpy — the
reference's load-bearing test pattern (array_dataclass_test.py:248-390).
"""

import numpy as np
import pytest

import dataclass_array_spark as das
from dataclass_array_spark.core.schema import ShapeError, f32, i32
from tests.conftest import assert_np_equal


@das.dataclass_array(broadcast=True, cast_dtype=True)
class Point(das.DcaTable):
    x: f32
    y: f32


@das.dataclass_array(broadcast=True, cast_dtype=True)
class Isometrie(das.DcaTable):
    r: f32["*b 3 3"]
    t: i32["*b 2"]


@das.dataclass_array(broadcast=True, cast_dtype=True)
class WithStatic(das.DcaTable):
    x: f32["*b 3"]
    static: str


def make_point(shape, spark):
    n = int(np.prod(shape)) if shape else 1
    x = np.arange(n, dtype=np.float32).reshape(shape)
    y = (np.arange(n, dtype=np.float32) * 10).reshape(shape)
    return Point(spark, x=x, y=y), x, y


SHAPES = [(3,), (2, 3), (3, 2, 2)]


@pytest.mark.parametrize("shape", SHAPES)
def test_construct_and_roundtrip(spark, shape):
    p, x, y = make_point(shape, spark)
    assert p.shape == shape
    assert p.size == x.size
    assert_np_equal(p, {"x": x, "y": y})


def test_broadcast_scalar_field(spark):
    p = Point(spark, x=np.arange(4, dtype=np.float32), y=1.5)
    assert_np_equal(p, {"x": np.arange(4, dtype=np.float32), "y": np.full(4, 1.5, np.float32)})


@pytest.mark.parametrize("shape", SHAPES)
def test_reshape_flatten(spark, shape):
    p, x, y = make_point(shape, spark)
    f = p.flatten()
    assert_np_equal(f, {"x": x.reshape(-1), "y": y.reshape(-1)})
    r = p.reshape((-1, shape[-1]))
    assert_np_equal(r, {"x": x.reshape(-1, shape[-1]), "y": y.reshape(-1, shape[-1])})


def test_einops_transpose(spark):
    p, x, y = make_point((2, 3), spark)
    t = p.reshape("a b -> b a")
    assert_np_equal(t, {"x": x.T, "y": y.T})
    g = p.reshape("a b -> (b a)")
    assert_np_equal(g, {"x": x.T.reshape(-1), "y": y.T.reshape(-1)})


def test_einops_split_dim(spark):
    p, x, y = make_point((6,), spark)
    s = p.reshape("(a b) -> a b", a=2)
    assert_np_equal(s, {"x": x.reshape(2, 3), "y": y.reshape(2, 3)})


def test_broadcast_to(spark):
    p, x, y = make_point((1, 3), spark)
    b = p.broadcast_to((4, 3))
    assert_np_equal(b, {"x": np.broadcast_to(x, (4, 3)), "y": np.broadcast_to(y, (4, 3))})


def test_inner_shape_fields(spark):
    r = np.arange(18, dtype=np.float32).reshape(2, 3, 3)
    t = np.arange(4, dtype=np.int32).reshape(2, 2)
    iso = Isometrie(spark, r=r, t=t)
    assert iso.shape == (2,)
    assert_np_equal(iso, {"r": r, "t": t})
    flat = iso[0]
    assert flat.shape == ()
    assert_np_equal(flat, {"r": r[0], "t": t[0]})


def test_inner_shape_validation(spark):
    with pytest.raises(ShapeError):
        Isometrie(spark, r=np.zeros((2, 3, 4), np.float32), t=np.zeros((2, 2), np.int32))


def test_static_fields_survive_ops(spark):
    w = WithStatic(spark, x=np.zeros((4, 3), np.float32), static="abc")
    assert w.static == "abc"
    assert w.reshape((2, 2)).static == "abc"
    assert w[1:3].static == "abc"
    assert w.map_field(lambda c: c).static == "abc"


def test_stack_concat(spark):
    p, x, y = make_point((3,), spark)
    q = p.map_field(lambda c: c + 100)
    st = das.stack([p, q])
    assert_np_equal(st, {"x": np.stack([x, x + 100]), "y": np.stack([y, y + 100])})
    st1 = das.stack([p, q], axis=1)
    assert_np_equal(st1, {"x": np.stack([x, x + 100], axis=1), "y": np.stack([y, y + 100], axis=1)})
    cc = das.concat([p, q])
    assert_np_equal(cc, {"x": np.concatenate([x, x + 100]), "y": np.concatenate([y, y + 100])})


def test_concat_axis1(spark):
    p, x, y = make_point((2, 3), spark)
    cc = das.concat([p, p], axis=1)
    assert_np_equal(cc, {"x": np.concatenate([x, x], axis=1), "y": np.concatenate([y, y], axis=1)})


def test_stack_type_mismatch(spark):
    p, *_ = make_point((2,), spark)
    iso = Isometrie(spark, r=np.zeros((2, 3, 3), np.float32), t=np.zeros((2, 2), np.int32))
    with pytest.raises(TypeError):
        das.stack([p, iso])


def test_len_and_bool(spark):
    p, *_ = make_point((3,), spark)
    assert len(p) == 3
    assert bool(p)
    s = p[0]
    with pytest.raises(TypeError):
        len(s)


def test_map_leaves_inner_shape(spark):
    r = np.arange(18, dtype=np.float32).reshape(2, 3, 3)
    t = np.arange(4, dtype=np.int32).reshape(2, 2)
    iso = Isometrie(spark, r=r, t=t)
    doubled = iso.map_leaves(lambda c: c * 2)
    assert_np_equal(doubled, {"r": r * 2, "t": t * 2})


def test_replace(spark):
    p, x, y = make_point((3,), spark)
    import pyspark.sql.functions as F

    p2 = p.replace(y=F.col("x") * 2)
    assert_np_equal(p2, {"x": x, "y": x * 2})
    p3 = p.replace(x=np.ones(3, np.float32))
    assert_np_equal(p3, {"x": np.ones(3, np.float32), "y": y})


@das.dataclass_array(broadcast=True, cast_dtype=True)
class PointDynamic(das.DcaTable):
    """Reference PointDynamicShape (array_dataclass_test.py:697-715):
    dynamic inner dims — length fixed per table, not per schema."""

    x: f32["*b _ _"]
    y: f32["*b 3 _"]


def test_dynamic_inner_dims(spark):
    x = np.zeros((2, 4, 5), np.float32)
    y = np.zeros((2, 3, 7), np.float32)
    p = PointDynamic(spark, x=x, y=y)
    assert p.shape == (2,)
    got = p.to_numpy_fields()
    assert got["x"].shape == (2, 4, 5) and got["y"].shape == (2, 3, 7)


def test_dynamic_fixed_prefix_enforced(spark):
    with pytest.raises(ShapeError):
        PointDynamic(
            spark, x=np.zeros((2, 4, 5), np.float32), y=np.zeros((2, 9, 7), np.float32)
        )


def test_cast_list_policy(spark):
    @das.dataclass_array(cast_list=False)
    class NoList(das.DcaTable):
        x: f32

    with pytest.raises(TypeError, match="cast_list"):
        NoList(spark, x=[1.0, 2.0])
    # default policy accepts lists
    p = Point(spark, x=[1.0, 2.0], y=[3.0, 4.0])
    assert p.shape == (2,)


def test_filter_alias(spark):
    import pyspark.sql.functions as F

    p, x, y = make_point((6,), spark)
    f = p.filter(F.col("x") >= 3)
    assert f.shape == (3,)
    assert_np_equal(f, {"x": x[x >= 3], "y": y[x >= 3]})
