"""Nested-DcaTable fixture tests (reference `Nested`,
array_dataclass_test.py:105-139): struct fields, struct recursion in
map_field, and shape ops carrying nested columns through."""

import numpy as np
import pytest

import dataclass_array_spark as das
from dataclass_array_spark.core.schema import f32, i32
from pyspark.sql import functions as F
from pyspark.sql import types as T


@das.dataclass_array(broadcast=True, cast_dtype=True)
class Iso(das.DcaTable):
    r: f32["*b 3 3"]
    t: i32["*b 2"]


@das.dataclass_array(broadcast=True, cast_dtype=True)
class Nested(das.DcaTable):
    iso: Iso


def make_iso_tree(shape):
    n = int(np.prod(shape))
    r = np.arange(n * 9, dtype=np.float32).reshape(shape + (3, 3))
    t = np.arange(n * 2, dtype=np.int32).reshape(shape + (2,))
    return {"r": r, "t": t}


def test_nested_struct_schema():
    st = Nested._struct_type()
    assert isinstance(st["iso"].dataType, T.StructType)
    assert isinstance(st["iso"].dataType["r"].dataType, T.ArrayType)


def test_nested_construct_and_ops(spark):
    tree = make_iso_tree((4,))
    n = Nested(spark, iso=tree)
    assert n.shape == (4,)
    # shape ops carry the struct column through rowid arithmetic
    r2 = n.reshape((2, 2))[1]
    assert r2.shape == (2,)
    pdf = r2.to_pandas()
    # row 0 of r2 is original row 2: its t vector is [4, 5]
    assert list(pdf.iloc[0]["iso"]["t"]) == [4, 5]


def test_nested_map_field_recursion(spark):
    tree = make_iso_tree((3,))
    n = Nested(spark, iso=tree)
    doubled = n.map_field(lambda c: c)  # identity through struct rebuild
    pdf = doubled.to_pandas()
    assert list(pdf.iloc[1]["iso"]["t"]) == [2, 3]
    # map_leaves applies elementwise inside the nested arrays
    plus = n.map_leaves(lambda c: c + 1)
    pdf2 = plus.to_pandas()
    assert list(pdf2.iloc[0]["iso"]["t"]) == [1, 2]
    assert pdf2.iloc[0]["iso"]["r"][0][0] == pytest.approx(1.0)


def test_nested_from_instance(spark):
    iso = Iso(spark, **make_iso_tree((2,)))
    n = Nested(spark, iso=iso)
    assert n.shape == (2,)


def test_nested_batch_shape_must_match(spark):
    tree = make_iso_tree((3,))
    n = Nested(spark, iso=tree)
    got = n.to_numpy_fields()
    assert got["iso"].shape == (3,)  # object array of row structs


@das.dataclass_array(broadcast=True, cast_dtype=True)
class OnlyStatic(das.DcaTable):
    x: int
    y: int


def test_only_static_dummy_shape(spark):
    """Reference OnlyStatic (`array_dataclass.py:939-952`): no array
    fields → injected dummy column keeps shape machinery alive."""
    o = OnlyStatic(spark, x=0, y=1, shape=())
    assert o.shape == ()
    assert o.x == 0 and o.y == 1
    b = o.broadcast_to((3,))
    assert b.shape == (3,)
    assert b.x == 0


@das.dataclass_array(broadcast=True, cast_dtype=True)
class NestedBatched(das.DcaTable):
    iso_batched: Iso["*b 2 2"]  # per row: 2x2 grid of isometries


def test_nested_extra_inner_dims(spark):
    """Reference iso_batched (Isometrie['*batch 3 7'] analog): nested
    dca with extra inner batch dims → array-of-array-of-struct column."""
    tree = {
        "r": np.arange(3 * 2 * 2 * 9, dtype=np.float32).reshape(3, 2, 2, 3, 3),
        "t": np.arange(3 * 2 * 2 * 2, dtype=np.int32).reshape(3, 2, 2, 2),
    }
    n = NestedBatched(spark, iso_batched=tree)
    assert n.shape == (3,)
    cell = n.to_pandas().iloc[1]["iso_batched"]
    assert len(cell) == 2 and len(cell[0]) == 2
    assert list(cell[0][1]["t"]) == [10, 11]
    m = n.map_leaves(lambda c: c * 2)
    cell2 = m.to_pandas().iloc[0]["iso_batched"]
    assert list(cell2[0][0]["t"]) == [0, 2]
