"""Schema-compiler unit tests (reference shape_parsing_test.py /
type_parsing_test.py analogs)."""

import numpy as np
import pytest
from pyspark.sql import types as T

from dataclass_array_spark.core.schema import (
    ArraySpec,
    ShapeError,
    f32,
    f64,
    i32,
    parse_shape,
    resolve_annotation,
)


def test_parse_shape_variants():
    assert parse_shape("*b") == ()
    assert parse_shape("... 3") == (3,)
    assert parse_shape("*batch 3 3") == (3, 3)
    assert parse_shape("*b _ 2") == (None, 2)
    assert parse_shape("*b h w") == (None, None)  # named dims → dynamic


@pytest.mark.parametrize("bad", ["3", "h w", "*a *b", "* 3", "*b 3x", "*b -1"])
def test_parse_shape_errors(bad):
    with pytest.raises(ShapeError):
        parse_shape(bad)


def test_dtype_alias_spark_types():
    assert f32["*b 3"].spark_type == T.ArrayType(T.FloatType(), False)
    assert f64["*b 3 3"].spark_type == T.ArrayType(T.ArrayType(T.DoubleType(), False), False)
    assert i32.as_spec().spark_type == T.IntegerType()


def test_resolve_annotation():
    assert resolve_annotation(f32["*b 2"]) == ArraySpec(np.dtype("float32"), (2,))
    assert resolve_annotation(f32).inner_shape == ()
    assert resolve_annotation((np.int64, "*b 4")).spark_type == T.ArrayType(T.LongType(), False)
    assert resolve_annotation("not a field") is None
    assert resolve_annotation(int) is None


def test_unsigned_dtypes_roundtrip(spark):
    import numpy as np
    import dataclass_array_spark as das
    from dataclass_array_spark.core.schema import ui8, ui32, ui64

    @das.dataclass_array(cast_dtype=True)
    class U(das.DcaTable):
        a: ui8
        b: ui32
        c: ui64

    u = U(
        spark,
        a=np.array([0, 255], np.uint8),
        b=np.array([0, 2**32 - 1], np.uint32),
        c=np.array([2**63 + 5, 7], np.uint64),
    )
    got = u.to_numpy_fields()
    assert got["a"].tolist() == [0, 255]
    assert got["b"].tolist() == [0, 2**32 - 1]
    assert got["c"][0] == np.uint64(2**63 + 5)


def test_complex_dtypes_roundtrip(spark):
    import numpy as np
    import dataclass_array_spark as das
    from dataclass_array_spark.core.schema import complex64

    @das.dataclass_array(cast_dtype=True)
    class C(das.DcaTable):
        z: complex64
        w: complex64["*b 2"]

    z = np.array([1 + 2j, 3 - 4j], np.complex64)
    w = np.array([[1j, 2 + 0j], [3j, 4 + 5j]], np.complex64)
    t = C(spark, z=z, w=w)
    got = t.to_numpy_fields()
    assert np.allclose(got["z"], z) and np.allclose(got["w"], w)


def test_unresolvable_annotations_warn(spark):
    import warnings
    import dataclass_array_spark as das

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")

        class Broken(das.DcaTable):
            x: "not_an_importable_alias"  # noqa: F821

        Broken._fields()
        assert any("no array fields" in str(x.message) for x in w)


# ---------------- Union / Optional annotations (reference truth table,
# type_parsing_test.py:35-125)
def test_union_optional_resolution(spark):
    import dataclass_array_spark as das
    from dataclass_array_spark.core.schema import ArraySpec, f32, f64, get_leaf_hints
    from dataclass_array_spark.core.table import DcaTable, NestedSpec, _resolve_hint
    from typing import Optional, Union, List

    @das.dataclass_array
    class Ray(das.DcaTable):
        pos: f32["*b 3"]

    @das.dataclass_array
    class Camera(das.DcaTable):
        pos: f32["*b 3"]

    spec3 = f32["*b 3"]
    # leaf extraction (Optional normalizes NoneType → None)
    assert get_leaf_hints(Optional[Ray]) == [Ray, None]
    assert get_leaf_hints(Union[Ray, int, None]) == [Ray, int, None]
    assert get_leaf_hints(spec3 | None) == [spec3, None]

    # scalars / plain types stay static
    assert _resolve_hint(int) is None
    assert _resolve_hint(List[int]) is None
    # bare + Optional dataclass
    assert _resolve_hint(Ray) == NestedSpec(Ray, ())
    assert _resolve_hint(Optional[Ray]) == NestedSpec(Ray, ())
    # union of DcaTables degrades to the base class, same inner shape
    assert _resolve_hint(Union[Ray, Camera]) == NestedSpec(DcaTable, ())
    assert _resolve_hint(Union[Ray, Camera, None]) == NestedSpec(DcaTable, ())
    # any non-array member makes the whole union static
    assert _resolve_hint(Union[Ray, int]) is None
    assert _resolve_hint(Union[Ray, int, None]) is None
    assert _resolve_hint(spec3 | int | None) is None
    # Optional array spec resolves to the spec
    assert _resolve_hint(spec3 | None) == spec3
    assert isinstance(_resolve_hint(spec3 | None), ArraySpec)
    # unsupported mixes raise (reference raises NotImplementedError too)
    with pytest.raises(NotImplementedError):
        _resolve_hint(Ray | spec3)
    with pytest.raises(NotImplementedError):
        _resolve_hint(spec3 | f64["*b 3"])


def test_optional_field_end_to_end(spark):
    import dataclass_array_spark as das
    from dataclass_array_spark.core.schema import f32, i64

    @das.dataclass_array(cast_dtype=True)
    class OptRay(das.DcaTable):
        rid: i64
        pos: f32["*b 3"] | None  # Optional array field
        note: "int | None"  # static (non-array member)

    fields = OptRay._array_fields()
    assert set(fields) == {"rid", "pos"}
    t = OptRay(spark, rid=np.arange(4), pos=np.ones((4, 3), dtype=np.float32))
    assert t.shape == (4,)
    np.testing.assert_array_equal(t.to_numpy_fields()["pos"], np.ones((4, 3)))


def test_string_annotation_eval_failure_warns_per_field(spark):
    import dataclass_array_spark as das
    from dataclass_array_spark.core.schema import f32  # noqa: F401

    @das.dataclass_array
    class Broken(das.DcaTable):
        good: f32["*b 3"]

    # inject an unresolvable *string* annotation (simulating PEP-563
    # with a typo'd alias) — must warn for THAT field, not silently drop
    Broken.__annotations__["bad"] = "f32_typo['*b 3']"
    Broken._dca_compiled = None
    with pytest.warns(UserWarning, match="bad.*failed to evaluate"):
        fields = Broken._fields()
    assert ("static", "f32_typo['*b 3']") == fields["bad"]
    assert "good" in Broken._array_fields()
