"""DcaTable — the Spark-native analog of the reference ``DataclassArray``.

Reference semantics re-expressed on a DataFrame (design per SURVEY.md §1.4):

- An instance models an N-dimensional batch of typed structs.  Physical
  layout: one DataFrame with a dense linear ``__rowid`` (C-order over the
  batch shape) plus one column per array field; the logical batch shape is
  wrapper metadata.  (reference: per-field ndarrays sharing a batch shape,
  `array_dataclass.py:164-214`)
- ``reshape``/``flatten`` are metadata-only (``__rowid`` invariant) — the
  Spark analog of numpy's O(1) view reshape.  Einops-style transposes and
  basic indexing are pure ``__rowid`` arithmetic in a ``select`` — no
  shuffle.  (reference `array_dataclass.py:333-390`)
- Static fields are wrapper metadata, untouched by every op (reference
  `array_dataclass.py:196-198`).
- Nested DcaTable fields are struct columns, recursed into by field ops
  (reference ``_map_field`` dc recursion, `array_dataclass.py:740-770`).

Scale notes: all shape ops are narrow (select/filter) except boolean-mask
re-densification and gather, which are a range-repartition and an equi-join
respectively — both AQE-managed, both the minimum the semantics admit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataclass_array_spark.core import schema as dsch
from dataclass_array_spark.core.schema import ArraySpec, ShapeError, parse_shape

ROWID = "__rowid"


@dataclasses.dataclass(frozen=True)
class DataclassParams:
    """Per-class coercion policy (reference `array_dataclass.py:57-117`)."""

    broadcast: bool = False
    cast_dtype: bool = False
    cast_list: bool = True


@dataclasses.dataclass(frozen=True)
class NestedSpec(dsch._UnionableMixin):
    """A nested-DcaTable field, optionally with extra inner batch dims
    (reference ``Ray['*batch 3 7']``, `field_utils.py:28-63`)."""

    table_cls: type
    extra_inner_shape: Tuple[Optional[int], ...] = ()

    @property
    def spark_type(self) -> T.DataType:
        t: T.DataType = self.table_cls._struct_type()
        for _ in self.extra_inner_shape:
            t = T.ArrayType(t, containsNull=False)
        return t


def field(*, shape: Tuple[int, ...] = (), dtype: Any = np.float32) -> ArraySpec:
    """Explicit field schema (reference ``dca.field``, `array_dataclass.py:120-142`)."""
    return ArraySpec(np.dtype(dtype), tuple(shape))


def dataclass_array(
    cls: Optional[type] = None,
    *,
    broadcast: bool = False,
    cast_dtype: bool = False,
    cast_list: bool = True,
):
    """Class decorator setting the coercion policy (reference
    `array_dataclass.py:75-117`).

    ``broadcast`` is deliberately MORE permissive than the reference:
    scalar ``()`` fields always broadcast (even with broadcast=False),
    and ``broadcast=True`` accepts any numpy-compatible batch-shape
    combination, not just scalar→batch.  See the constructor's
    broadcasting block for the rationale."""

    def wrap(c: type) -> type:
        c._dca_params = DataclassParams(broadcast, cast_dtype, cast_list)
        return c

    return wrap(cls) if cls is not None else wrap


def _strides(shape: Sequence[int]) -> List[int]:
    out = [1] * len(shape)
    for i in range(len(shape) - 2, -1, -1):
        out[i] = out[i + 1] * shape[i + 1]
    return out


def _size(shape: Sequence[int]) -> int:
    return int(math.prod(shape)) if shape else 1


def _idiv(a: Column, b) -> Column:
    """Exact integer division on long columns (SQL ``div``).  Double
    division + cast('long') is only floor-exact while the dividend is
    below ~2^53; rowids at the 100 TB design point can exceed that, and
    a quotient half-ulp under an integer would round up and silently
    misindex a row."""
    return F.call_function("div", a, F.lit(b) if isinstance(b, int) else b)


class _DcaMeta(type):
    def __getitem__(cls, spec: str) -> NestedSpec:
        return NestedSpec(cls, parse_shape(spec))


def _resolve_hint(ann: Any) -> Any:
    """Annotation (possibly a ``Union``/``Optional``) → ArraySpec |
    NestedSpec | None, mirroring the reference's ``get_array_type``
    truth table (`type_parsing.py:78-147`):

    - ``Optional[X]`` → resolve ``X`` (``None`` members are dropped)
    - a union with any non-array member (``Ray | int``) → None (static)
    - a union of DcaTable types with one common inner shape → the field
      degrades to the base ``DcaTable`` at that shape
    - mixing DcaTable and plain array members, unions of DcaTables with
      different inner shapes, or unions of distinct array specs →
      NotImplementedError (reference raises the same)
    """
    leaves = [l for l in dsch.get_leaf_hints(ann) if l is not None]
    if not leaves:
        return None
    specs: list = []
    dcas: list = []
    others: list = []
    for leaf in leaves:
        s = dsch.resolve_annotation(leaf)
        if s is not None:
            specs.append(s)
        elif isinstance(leaf, NestedSpec):
            dcas.append(leaf)
        elif isinstance(leaf, type) and issubclass(leaf, DcaTable):
            dcas.append(NestedSpec(leaf, ()))
        else:
            others.append(leaf)
    if others:
        return None  # non-array member → whole union is a static field
    if specs and dcas:
        raise NotImplementedError(
            f"{ann!r} mixes dataclass and array annotation members"
        )
    if dcas:
        if len(set(dcas)) == 1:
            return dcas[0]
        shapes = {d.extra_inner_shape for d in dcas}
        if len(shapes) != 1:
            raise NotImplementedError(
                f"{ann!r} mixes dataclasses with different inner shapes"
            )
        return NestedSpec(DcaTable, next(iter(shapes)))
    if len(set(specs)) != 1:
        raise NotImplementedError(f"{ann!r} mixes multiple array types")
    return specs[0]


class DcaTable(metaclass=_DcaMeta):
    """DataFrame-backed N-d batch of typed structs.

    Subclass with annotated fields::

        class Ray(DcaTable):
            pos: f32['*batch 3']
            dir: f32['*batch 3']

    Construct from in-memory arrays (``Ray(pos=..., dir=...)``), from a
    DataFrame (``Ray.from_df(df)``), or from parquet
    (``Ray.read_parquet(spark, path)``).
    """

    _dca_params: DataclassParams = DataclassParams()
    _dca_compiled: Optional[Dict[str, Any]] = None  # per-class cache

    # ---------------- class-level schema compilation ----------------

    @classmethod
    def _fields(cls) -> Dict[str, Any]:
        """name → ArraySpec | NestedSpec for array fields; static fields
        are everything else (reference ``_init_cls``,
        `array_dataclass.py:894-956`)."""
        cached = cls.__dict__.get("_dca_compiled")
        if cached is not None:
            return cached
        import sys

        out: Dict[str, Any] = {}
        for klass in reversed(cls.__mro__):
            mod_globals = getattr(sys.modules.get(klass.__module__), "__dict__", {})
            for name, ann in getattr(klass, "__annotations__", {}).items():
                if name.startswith("_"):
                    continue
                if isinstance(ann, str):
                    # `from __future__ import annotations` stringifies
                    # annotations; evaluate in the defining namespace
                    try:
                        ann = eval(ann, mod_globals, dict(vars(klass)))  # noqa: S307
                    except Exception as exc:
                        # a typo'd / unimportable alias would silently
                        # drop this column from the schema — warn loudly
                        # per field instead (the field stays static)
                        import warnings

                        warnings.warn(
                            f"{cls.__name__}.{name}: string annotation "
                            f"{ann!r} failed to evaluate "
                            f"({type(exc).__name__}: {exc}); treating as a "
                            f"STATIC field. If this was meant to be an "
                            f"array field, make the dtype alias importable "
                            f"in {klass.__module__}.",
                            stacklevel=3,
                        )
                spec = _resolve_hint(ann)
                if spec is not None:
                    out[name] = spec
                else:
                    out[name] = ("static", ann)
        if not any(
            not (isinstance(v, tuple) and v[0] == "static") for v in out.values()
        ) and any(
            isinstance(a, str)
            for k in reversed(cls.__mro__)
            for a in getattr(k, "__annotations__", {}).values()
        ):
            # every field came out static but string annotations exist:
            # almost certainly an unresolvable PEP-563 annotation (e.g. a
            # dtype alias not importable in the defining module) — fail
            # loudly instead of silently degrading fields to statics
            import warnings

            warnings.warn(
                f"{cls.__name__}: no array fields resolved but string "
                f"annotations present — check that dtype aliases are "
                f"importable in {cls.__module__}",
                stacklevel=3,
            )
        cls._dca_compiled = out
        return out

    @classmethod
    def _array_fields(cls) -> Dict[str, Union[ArraySpec, NestedSpec]]:
        return {
            k: v for k, v in cls._fields().items() if not (isinstance(v, tuple) and v[0] == "static")
        }

    @classmethod
    def _static_field_names(cls) -> List[str]:
        return [k for k, v in cls._fields().items() if isinstance(v, tuple) and v[0] == "static"]

    @classmethod
    def _struct_type(cls) -> T.StructType:
        fields = []
        for name, spec in cls._array_fields().items():
            fields.append(T.StructField(name, spec.spark_type, nullable=False))
        if not fields:
            # only-static class: dummy scalar field so shape machinery works
            # (reference `_dca_dummy_array`, `array_dataclass.py:939-952`)
            fields.append(T.StructField("__dummy", T.FloatType(), nullable=False))
        return T.StructType(fields)

    @classmethod
    def spark_schema(cls) -> T.StructType:
        """Full DataFrame schema including the ``__rowid`` column."""
        return T.StructType(
            [T.StructField(ROWID, T.LongType(), nullable=False)] + list(cls._struct_type())
        )

    # ---------------- construction ----------------

    def __init__(self, spark: Optional[SparkSession] = None, shape: Tuple[int, ...] = None, **values):
        """Build from in-memory values (the reference's only ingress,
        `array_dataclass.py:264-314`): validates dtype + inner shape,
        broadcasts batch shapes per the class policy, and materializes one
        DataFrame with a dense C-order ``__rowid``."""
        if spark is None:
            spark = SparkSession.getActiveSession()
            if spark is None:
                from dataclass_array_spark.session import get_spark

                spark = get_spark()
        fields = type(self)._fields()
        params = type(self)._dca_params

        statics: Dict[str, Any] = {}
        arrays: Dict[str, Any] = {}  # name → numpy array or nested tree
        batch_shapes: Dict[str, Tuple[int, ...]] = {}

        for name, spec in fields.items():
            if isinstance(spec, tuple) and spec[0] == "static":
                if name in values:
                    statics[name] = values.pop(name)
                continue
            if name not in values:
                raise TypeError(f"{type(self).__name__} missing array field {name!r}")
            val = values.pop(name)
            if isinstance(spec, ArraySpec):
                arr = self._coerce_array(name, val, spec, params)
                arrays[name] = arr
                ndim_inner = len(spec.inner_shape)
                batch_shapes[name] = arr.shape[: arr.ndim - ndim_inner] if ndim_inner else arr.shape
            else:  # NestedSpec
                tree = _nested_to_tree(val, spec.table_cls)
                nested_batch = _tree_batch_shape(tree, spec.table_cls)
                n_extra = len(spec.extra_inner_shape)
                if n_extra:
                    if len(nested_batch) < n_extra:
                        raise ShapeError(
                            f"field {name!r}: nested batch {nested_batch} shorter than "
                            f"declared inner shape {spec.extra_inner_shape}"
                        )
                    inner = nested_batch[len(nested_batch) - n_extra :]
                    for got, want in zip(inner, spec.extra_inner_shape):
                        if want is not None and got != want:
                            raise ShapeError(
                                f"field {name!r}: inner shape {inner} != declared "
                                f"{spec.extra_inner_shape}"
                            )
                    batch_shapes[name] = nested_batch[: len(nested_batch) - n_extra]
                else:
                    batch_shapes[name] = nested_batch
                arrays[name] = tree
        if values:
            raise TypeError(f"unexpected fields {sorted(values)}")

        # batch-shape broadcasting.  INTENTIONAL RELAXATION vs the
        # reference (`_broadcast_shape_inplace`, `array_dataclass.py:678-728`):
        # the reference rejects scalar () auto-broadcast when
        # broadcast=False and restricts broadcast=True to scalar→batch
        # only; here broadcast=False still broadcasts scalar () fields
        # (a scalar per-row constant is unambiguous) and broadcast=True
        # accepts any np.broadcast_shapes-compatible combination, e.g.
        # (1,3) vs (2,3) — strictly more permissive, never silently
        # different for inputs the reference accepts.
        if arrays:
            shapes = list(batch_shapes.values())
            try:
                target = np.broadcast_shapes(*shapes)
            except ValueError as e:
                raise ShapeError(f"incompatible batch shapes {shapes}: {e}") from None
            for name, bshape in batch_shapes.items():
                if tuple(bshape) == tuple(target):
                    continue
                if not params.broadcast and bshape != ():
                    raise ShapeError(
                        f"field {name!r} batch shape {bshape} != {tuple(target)} and "
                        f"broadcast=False (only scalar fields auto-broadcast)"
                    )
                arrays[name] = _tree_broadcast(arrays[name], bshape, tuple(target))
            batch_shape = tuple(int(d) for d in target)
        else:
            batch_shape = tuple(shape) if shape is not None else ()

        self._init_from_tree(spark, arrays, batch_shape, statics)

    def _init_from_tree(self, spark, arrays, batch_shape, statics):
        cls = type(self)
        struct = cls._struct_type()
        n = _size(batch_shape)
        rows = []
        for i in range(n):
            row: List[Any] = [i]
            for f_ in struct.fields:
                if f_.name == "__dummy":
                    row.append(0.0)
                else:
                    row.append(_tree_row_value(arrays[f_.name], cls._array_fields()[f_.name], i, batch_shape))
            rows.append(tuple(row))
        df = spark.createDataFrame(rows, schema=cls.spark_schema())
        self._bind(df, batch_shape, statics, spark)

    def _bind(self, df: DataFrame, shape: Tuple[int, ...], statics: Dict[str, Any], spark: SparkSession):
        self._df = df
        self._shape = tuple(shape)
        self._statics = dict(statics)
        self._spark = spark
        for k, v in self._statics.items():
            setattr(self, k, v)

    @classmethod
    def _wrap(cls, df: DataFrame, shape: Tuple[int, ...], statics: Dict[str, Any], spark: SparkSession) -> "DcaTable":
        obj = cls.__new__(cls)
        obj._bind(df, shape, statics, spark)
        return obj

    @classmethod
    def from_df(
        cls,
        df: DataFrame,
        shape: Optional[Tuple[int, ...]] = None,
        validate: bool = True,
        **statics,
    ) -> "DcaTable":
        """Adopt an existing DataFrame as a 1-D (or given-shape) batch.

        If ``df`` has no ``__rowid`` it gets one via zipWithIndex-style
        dense numbering.  With ``validate``, columns are cast to the class
        schema (errors surface at Catalyst analysis, i.e. immediately).
        """
        spark = df.sparkSession
        if ROWID not in df.columns:
            df = attach_dense_rowid(df)
        if validate:
            exprs = [F.col(ROWID).cast("long").alias(ROWID)]
            for name, spec in cls._array_fields().items():
                if name not in df.columns:
                    raise ShapeError(f"{cls.__name__}.from_df: missing column {name!r}")
                exprs.append(F.col(name).cast(_nullable_variant(spec.spark_type)).alias(name))
            if not cls._array_fields():
                exprs.append(F.lit(0.0).cast("float").alias("__dummy"))
            df = df.select(*exprs)
        if shape is None:
            n = df.count()
            shape = (n,)
        return cls._wrap(df, tuple(shape), statics, spark)

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str, **statics) -> "DcaTable":
        """Columnar scan source; schema enforced by cast-select so Catalyst
        still prunes columns and pushes filters into the parquet reader."""
        return cls.from_df(spark.read.parquet(path), **statics)

    # ---------------- coercion helpers ----------------

    @staticmethod
    def _coerce_array(name: str, val: Any, spec: ArraySpec, params: DataclassParams) -> np.ndarray:
        if isinstance(val, (list, tuple)):
            if not params.cast_list:
                raise TypeError(f"field {name!r}: list input with cast_list=False")
            val = np.asarray(val)
        if np.isscalar(val):
            val = np.asarray(val)
        if not isinstance(val, np.ndarray):
            raise TypeError(f"field {name!r}: expected array-like, got {type(val)}")
        want = np.dtype(spec.np_dtype)
        if val.dtype != want:
            # int→float and widening casts are always fine; narrowing needs
            # cast_dtype=True (reference `_cast_xnp_dtype_inplace` policy,
            # `array_dataclass.py:626-676`)
            if params.cast_dtype or np.can_cast(val.dtype, want, casting="safe"):
                val = val.astype(want)
            else:
                raise TypeError(
                    f"field {name!r}: dtype {val.dtype} != {want} and cast_dtype=False"
                )
        inner = spec.inner_shape
        if len(inner) > val.ndim:
            raise ShapeError(f"field {name!r}: rank {val.ndim} < inner rank {len(inner)}")
        got_inner = val.shape[val.ndim - len(inner) :] if inner else ()
        for got, want_d in zip(got_inner, inner):
            if want_d is not None and got != want_d:
                raise ShapeError(
                    f"field {name!r}: inner shape {got_inner} incompatible with declared {inner}"
                )
        return val

    # ---------------- introspection ----------------

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def spark(self) -> SparkSession:
        return self._spark

    @property
    def shape(self) -> Tuple[int, ...]:
        return self._shape

    @property
    def size(self) -> int:
        return _size(self._shape)

    @property
    def ndim(self) -> int:
        return len(self._shape)

    def __len__(self) -> int:
        if not self._shape:
            raise TypeError("len() of unsized object (scalar batch shape)")
        return self._shape[0]

    def __bool__(self) -> bool:
        # reference `array_dataclass.py:412-453`: always truthy, but
        # ambiguous (error) for an empty batch
        if self.size == 0:
            raise ValueError(
                f"The truth value of {type(self).__name__} (size 0) is ambiguous"
            )
        return True

    def __repr__(self) -> str:
        return f"{type(self).__name__}(shape={self._shape}, fields={list(type(self)._array_fields())})"

    # ---------------- shape ops (all shuffle-free) ----------------

    def reshape(self, shape: Union[Tuple[int, ...], str], **axes_length: int) -> "DcaTable":
        """Tuple reshape is metadata-only (``__rowid`` is already the
        C-order linear index — reference `array_dataclass.py:333-369`).
        A string is einops-style ``'b h w -> b (h w)'`` (transpose +
        regroup), compiled to pure ``__rowid`` arithmetic in one select
        (reference `array_dataclass.py:351-362`)."""
        if isinstance(shape, str):
            return self._reshape_einops(shape, axes_length)
        shape = tuple(shape)
        n = self.size
        negs = [i for i, d in enumerate(shape) if d == -1]
        if len(negs) > 1:
            raise ShapeError("only one -1 allowed in reshape")
        if negs:
            rest = _size([d for d in shape if d != -1])
            if rest == 0 or n % rest:
                raise ShapeError(f"cannot reshape size {n} into {shape}")
            shape = tuple(n // rest if d == -1 else d for d in shape)
        if _size(shape) != n:
            raise ShapeError(f"cannot reshape size {n} into {shape}")
        return type(self)._wrap(self._df, shape, self._statics, self._spark)

    def flatten(self) -> "DcaTable":
        return self.reshape((-1,))

    def _reshape_einops(self, pattern: str, axes_length: Dict[str, int]) -> "DcaTable":
        lhs, rhs = [s.strip() for s in pattern.split("->")]
        lhs_groups = _parse_einops_side(lhs)
        rhs_groups = _parse_einops_side(rhs)
        if len(lhs_groups) != self.ndim:
            raise ShapeError(
                f"einops lhs {lhs!r} has {len(lhs_groups)} dims, batch shape is {self._shape}"
            )
        # resolve atomic dim sizes from lhs groups + provided axes lengths
        dim_size: Dict[str, int] = dict(axes_length)
        for group, actual in zip(lhs_groups, self._shape):
            unknown = [a for a in group if a not in dim_size]
            known = _size([dim_size[a] for a in group if a in dim_size])
            if len(unknown) > 1:
                raise ShapeError(f"cannot infer sizes for {unknown} in group {group}")
            if unknown:
                if actual % known:
                    raise ShapeError(f"group {group} does not divide dim {actual}")
                dim_size[unknown[0]] = actual // known
            elif known != actual:
                raise ShapeError(f"group {group} sizes {known} != dim {actual}")
        atoms = [a for g in lhs_groups for a in g]
        if sorted(atoms) != sorted([a for g in rhs_groups for a in g]):
            raise ShapeError(f"einops sides use different axes: {pattern!r}")
        atom_shape = [dim_size[a] for a in atoms]
        atom_strides = _strides(atom_shape)
        atom_pos = {a: i for i, a in enumerate(atoms)}
        # new linear index = Σ idx[atom] * new_stride[atom] over rhs order
        new_shape = tuple(_size([dim_size[a] for a in g]) for g in rhs_groups)
        rhs_atoms = [a for g in rhs_groups for a in g]
        rhs_atom_shape = [dim_size[a] for a in rhs_atoms]
        rhs_strides = _strides(rhs_atom_shape)
        rid = F.col(ROWID)
        new_rid: Optional[Column] = None
        for a, stride in zip(rhs_atoms, rhs_strides):
            i = atom_pos[a]
            idx = _idiv(rid, atom_strides[i]) % atom_shape[i]
            term = idx * stride
            new_rid = term if new_rid is None else (new_rid + term)
        out = self._df.withColumn(ROWID, new_rid.cast("long"))
        return type(self)._wrap(out, new_shape, self._statics, self._spark)

    def broadcast_to(self, shape: Tuple[int, ...]) -> "DcaTable":
        """Tile batch dims (reference `array_dataclass.py:375-380`).

        Implemented as ``range(new_size) ⋈ df`` on the computed source
        rowid — an equi-join Catalyst turns into a broadcast join whenever
        either side is small; for pure prefix extension the join key is
        ``new_rowid % old_size`` so AQE handles it even at scale."""
        shape = tuple(int(d) for d in shape)
        old = self._shape
        if len(shape) < len(old):
            raise ShapeError(f"broadcast_to {shape} has fewer dims than {old}")
        pad = len(shape) - len(old)
        for i, d in enumerate(old):
            if d != shape[pad + i] and d != 1:
                raise ShapeError(f"cannot broadcast {old} to {shape}")
        new_size = _size(shape)
        old_strides = _strides(old) if old else []
        new_strides = _strides(shape)
        rng = self._spark.range(new_size).withColumnRenamed("id", "__new_rowid")
        rid = F.col("__new_rowid")
        src: Optional[Column] = None
        for i, d in enumerate(old):
            new_idx = _idiv(rid, new_strides[pad + i]) % shape[pad + i]
            old_idx = new_idx if d != 1 else F.lit(0)
            term = old_idx * old_strides[i]
            src = term if src is None else (src + term)
        if src is None:
            src = F.lit(0)
        rng = rng.withColumn(ROWID, src.cast("long"))
        out = (
            rng.join(self._df, on=ROWID, how="inner")
            .drop(ROWID)
            .withColumnRenamed("__new_rowid", ROWID)
        )
        return type(self)._wrap(out, shape, self._statics, self._spark)

    def __getitem__(self, indices) -> "DcaTable":
        """Numpy basic indexing on batch dims (int/slice/Ellipsis/None
        tuples — reference `array_dataclass.py:382-390`, `:1017-1035`)
        compiled to filter + rowid-arithmetic select (no shuffle), plus
        boolean-mask (→ filter + dense reindex) and integer-array gather
        (→ equi-join) — reference README "Numpy slicing/indexing/masking"."""
        if isinstance(indices, (np.ndarray, list)) and np.asarray(indices).dtype == bool:
            return self._mask(np.asarray(indices))
        if isinstance(indices, Column):
            return self._mask_column(indices)
        if isinstance(indices, (np.ndarray, list)) and np.asarray(indices).dtype.kind in "iu":
            return self._gather(np.asarray(indices))
        if not isinstance(indices, tuple):
            indices = (indices,)
        if indices.count(Ellipsis) > 1:
            raise IndexError("an index can only have a single ellipsis ('...')")
        n_real = sum(1 for ix in indices if ix is not None and ix is not Ellipsis)
        if n_real > self.ndim:
            raise IndexError(
                f"too many indices for array: array is {self.ndim}-dimensional, "
                f"but {n_real} were indexed"
            )
        # expand Ellipsis
        if Ellipsis in indices:
            pos = indices.index(Ellipsis)
            fill = self.ndim - n_real
            indices = indices[:pos] + (slice(None),) * fill + indices[pos + 1 :]
        else:
            indices = indices + (slice(None),) * (self.ndim - n_real)

        old_shape = self._shape
        old_strides = _strides(old_shape)
        rid = F.col(ROWID)
        filters: List[Column] = []
        out_dims: List[int] = []
        out_idx_exprs: List[Column] = []
        dim_i = 0
        for ix in indices:
            if ix is None:
                out_dims.append(1)
                out_idx_exprs.append(F.lit(0))
                continue
            d = old_shape[dim_i]
            idx_expr = _idiv(rid, old_strides[dim_i]) % d
            if isinstance(ix, (int, np.integer)):
                i = int(ix)
                if i < 0:
                    i += d
                if not (0 <= i < d):
                    raise IndexError(f"index {ix} out of bounds for axis {dim_i} with size {d}")
                filters.append(idx_expr == i)
                # dim removed
            elif isinstance(ix, slice):
                start, stop, step = ix.indices(d)
                if step <= 0:
                    raise IndexError("negative slice steps not supported")
                length = max(0, (stop - start + step - 1) // step)
                if start != 0 or stop != d or step != 1:
                    filters.append((idx_expr >= start) & (idx_expr < stop))
                    if step != 1:
                        filters.append(((idx_expr - start) % step) == 0)
                out_dims.append(length)
                out_idx_exprs.append(_idiv(idx_expr - start, step))
            else:
                raise IndexError(f"unsupported index {ix!r}")
            dim_i += 1
        new_shape = tuple(out_dims)
        new_strides = _strides(new_shape)
        new_rid: Optional[Column] = None
        for e, s in zip(out_idx_exprs, new_strides):
            term = e * s
            new_rid = term if new_rid is None else (new_rid + term)
        if new_rid is None:
            new_rid = F.lit(0)
        df = self._df
        for f_ in filters:
            df = df.filter(f_)
        df = df.withColumn(ROWID, new_rid.cast("long"))
        return type(self)._wrap(df, new_shape, self._statics, self._spark)

    def _mask(self, mask: np.ndarray) -> "DcaTable":
        """numpy boolean-mask semantics: the mask matches the LEADING
        batch dims; masked dims collapse to one, trailing dims survive
        (``v[mask]`` with mask.shape == v.shape[:k])."""
        k = mask.ndim
        if mask.shape != self._shape[:k]:
            raise IndexError(
                f"mask shape {mask.shape} != leading batch dims {self._shape[:k]}"
            )
        trailing = self._shape[k:]
        t_sz = _size(trailing)
        sel = np.flatnonzero(mask.reshape(-1))
        pairs = [(int(old), int(new)) for new, old in enumerate(sel)]
        idx_df = self._spark.createDataFrame(
            pairs, schema=T.StructType([
                T.StructField("__old_outer", T.LongType(), False),
                T.StructField("__new_outer", T.LongType(), False),
            ]),
        )
        rid = F.col(ROWID)
        df = self._df.withColumn("__old_outer", _idiv(rid, t_sz))
        out = (
            df.join(F.broadcast(idx_df), on="__old_outer", how="inner")
            .withColumn(ROWID, (F.col("__new_outer") * t_sz + rid % t_sz).cast("long"))
            .drop("__old_outer", "__new_outer")
        )
        return type(self)._wrap(out, (len(sel),) + trailing, self._statics, self._spark)

    def _mask_column(self, pred: Column) -> "DcaTable":
        """Filter by a Column predicate — the distributed mask path.
        Result is flattened to 1-D with re-densified rowids (two-pass
        partition-offset numbering; see ``attach_dense_rowid``)."""
        out = attach_dense_rowid(self._df.filter(pred).drop(ROWID))
        n = out.count()
        return type(self)._wrap(out, (n,), self._statics, self._spark)

    def _gather(self, idx: np.ndarray) -> "DcaTable":
        """Integer-array indexing along axis 0 — an equi-join in disguise
        (reference gather, SURVEY §2 #15)."""
        if self.ndim == 0:
            raise IndexError("cannot gather from scalar batch")
        d0 = self._shape[0]
        flat = idx.reshape(-1)
        norm = [int(i) + d0 if i < 0 else int(i) for i in flat]
        for i in norm:
            if not (0 <= i < d0):
                raise IndexError(f"gather index {i} out of bounds for axis 0 size {d0}")
        rest = self._shape[1:]
        rest_sz = _size(rest)
        pairs = [(int(old), int(new)) for new, old in enumerate(norm)]
        idx_df = self._spark.createDataFrame(
            pairs, schema=T.StructType([
                T.StructField("__old0", T.LongType(), False),
                T.StructField("__new0", T.LongType(), False),
            ]),
        )
        rid = F.col(ROWID)
        df = self._df.withColumn("__old0", _idiv(rid, rest_sz))
        out = (
            df.join(F.broadcast(idx_df), on="__old0", how="inner")
            .withColumn(ROWID, (F.col("__new0") * rest_sz + rid % rest_sz).cast("long"))
            .drop("__old0", "__new0")
        )
        new_shape = tuple(idx.shape) + rest
        return type(self)._wrap(out, new_shape, self._statics, self._spark)

    # ---- relational passthroughs (§2.B surfaced on the wrapper):
    # thin delegations so users never need to drop to .df for the
    # common relational verbs; results are plain DataFrames (the
    # relational layer is row-set, not batch-shaped).

    def join(self, other, on=None, how: str = "inner") -> DataFrame:
        odf = other.df if isinstance(other, DcaTable) else other
        if isinstance(other, DcaTable):
            assert_same_session(self, other)
            odf = odf.drop(ROWID)
        return self._df.drop(ROWID).join(odf, on=on, how=how)

    def groupBy(self, *cols):
        return self._df.drop(ROWID).groupBy(*cols)

    def select_fields(self, *names: str) -> DataFrame:
        return self._df.select(*names)

    def sql(self, query: str, view: str = "self") -> DataFrame:
        """Run SQL with this table registered as ``view``."""
        self._df.createOrReplaceTempView(view)
        return self._spark.sql(query)

    def filter(self, pred: Column) -> "DcaTable":
        """Named alias for Column-mask indexing (``dc[pred]``) — the
        distributed filter; result is 1-D with dense rowids."""
        return self._mask_column(pred)

    def __iter__(self) -> Iterator["DcaTable"]:
        # driver-side convenience, like the reference (`array_dataclass.py:393-402`)
        for i in range(len(self)):
            yield self[i]

    # ---------------- field ops ----------------

    def map_field(self, fn: Callable[[Column], Column]) -> "DcaTable":
        """Apply ``fn`` to every array-field column, recursing into nested
        DcaTable struct fields (reference ``map_field`` + ``_map_field``
        dc recursion, `array_dataclass.py:455-463, 740-770`).  One select —
        stays inside whole-stage codegen."""
        exprs = [F.col(ROWID)]
        for name, spec in type(self)._array_fields().items():
            exprs.append(_map_field_expr(F.col(name), spec, lambda c, s: fn(c)).alias(name))
        if not type(self)._array_fields():
            exprs.append(F.col("__dummy"))
        out = self._df.select(*exprs)
        return type(self)._wrap(out, self._shape, self._statics, self._spark)

    def map_leaves(self, fn: Callable[[Column], Column]) -> "DcaTable":
        """Elementwise variant of ``map_field``: descends through the
        inner-shape ArrayType nesting (including inside nested struct
        fields) with ``F.transform`` so ``fn`` sees scalar elements.
        Still a single codegen'd select."""

        def leafwise(col: Column, spec: ArraySpec) -> Column:
            apply = fn
            for _ in spec.inner_shape:
                prev = apply
                apply = (lambda p: (lambda c: F.transform(c, p)))(prev)
            return apply(col)

        exprs = [F.col(ROWID)]
        for name, spec in type(self)._array_fields().items():
            exprs.append(_map_field_expr(F.col(name), spec, leafwise).alias(name))
        out = self._df.select(*exprs)
        return type(self)._wrap(out, self._shape, self._statics, self._spark)

    def replace(self, **changes) -> "DcaTable":
        """New instance with replaced fields (reference
        `array_dataclass.py:467-494`).  Column values go straight into a
        ``withColumns`` (revalidated by cast); array-likes must match the
        batch shape and are joined in by rowid."""
        statics = dict(self._statics)
        col_changes: Dict[str, Column] = {}
        np_changes: Dict[str, np.ndarray] = {}
        specs = type(self)._array_fields()
        for name, val in changes.items():
            if name in statics or name in type(self)._static_field_names():
                statics[name] = val
            elif name in specs:
                if isinstance(val, Column):
                    col_changes[name] = val
                else:
                    spec = specs[name]
                    if not isinstance(spec, ArraySpec):
                        raise TypeError(f"replace of nested field {name!r} requires a Column")
                    np_changes[name] = self._coerce_array(
                        name, val, spec, DataclassParams(broadcast=True, cast_dtype=True)
                    )
            else:
                raise TypeError(f"unknown field {name!r}")
        df = self._df
        if col_changes:
            df = df.withColumns(
                {k: v.cast(specs[k].spark_type) if isinstance(specs[k], ArraySpec) else v
                 for k, v in col_changes.items()}
            )
        if np_changes:
            n = self.size
            rows = []
            for i in range(n):
                row: List[Any] = [i]
                for name, arr in np_changes.items():
                    spec = specs[name]
                    a = arr
                    if a.shape[: a.ndim - len(spec.inner_shape)] != self._shape:
                        a = np.broadcast_to(a, self._shape + tuple(
                            d if d is not None else s
                            for d, s in zip(spec.inner_shape, a.shape[a.ndim - len(spec.inner_shape):])
                        ))
                    flat = a.reshape((n,) + a.shape[a.ndim - len(spec.inner_shape):])
                    v = flat[i]
                    row.append(v.tolist() if isinstance(v, np.ndarray) else v.item())
                rows.append(tuple(row))
            sch = T.StructType(
                [T.StructField(ROWID, T.LongType(), False)]
                + [T.StructField(f"__new_{k}", specs[k].spark_type, False) for k in np_changes]
            )
            upd = self._spark.createDataFrame(
                [tuple([r[0]] + list(r[1:])) for r in rows], schema=sch
            )
            df = df.join(F.broadcast(upd), on=ROWID, how="inner")
            for k in np_changes:
                df = df.withColumn(k, F.col(f"__new_{k}")).drop(f"__new_{k}")
        out = type(self)._wrap(df, self._shape, statics, self._spark)
        return out

    # ---------------- sinks / interchange ----------------

    def to_pandas(self):
        """Ordered local export (Arrow path)."""
        return (
            self._df.orderBy(ROWID).toPandas().set_index(ROWID, drop=True)
        )

    def to_numpy_fields(self) -> Dict[str, np.ndarray]:
        """Collect every array field back to a numpy array with the full
        ``batch_shape + inner_shape`` (the reference's ``as_np`` exit,
        `array_dataclass.py:496-538`)."""
        pdf = self.to_pandas()
        out: Dict[str, np.ndarray] = {}
        for name, spec in type(self)._array_fields().items():
            if isinstance(spec, ArraySpec):
                vals = [_deep_tolist(v) for v in pdf[name].tolist()]
                if np.dtype(spec.np_dtype).kind == "c":
                    def from_struct(x):
                        if isinstance(x, dict):
                            return complex(x["re"], x["im"])
                        if isinstance(x, (list, tuple)) and x and isinstance(
                            x[0], (dict, list, tuple)
                        ):
                            return [from_struct(y) for y in x]
                        if isinstance(x, (list, tuple)) and len(x) == 2 and not isinstance(
                            x[0], (dict, list, tuple)
                        ):
                            return complex(x[0], x[1])
                        return x

                    vals = [from_struct(v) for v in vals]
                arr = np.array(vals, dtype=spec.np_dtype)
                out[name] = arr.reshape(self._shape + arr.shape[1:])
            else:
                out[name] = np.array(pdf[name].tolist(), dtype=object).reshape(self._shape)
        return out

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        self._df.write.mode(mode).parquet(path)

    # ---- tree protocol (reference pytree registration,
    # `array_dataclass.py:772-861`): decompose into (DataFrame, metadata)
    # and rebuild — the basis for persistence and interop.

    def tree_flatten(self) -> Tuple[DataFrame, Dict[str, Any]]:
        meta = {
            "class": type(self).__name__,
            "shape": list(self._shape),
            "statics": dict(self._statics),
        }
        return self._df, meta

    @classmethod
    def tree_unflatten(cls, df: DataFrame, meta: Dict[str, Any]) -> "DcaTable":
        return cls._wrap(
            df, tuple(meta["shape"]), dict(meta.get("statics", {})), df.sparkSession
        )

    # ---- persistence (pickle analog, reference `array_dataclass.py:863-878`):
    # parquet + JSON sidecar carrying logical shape and static fields.

    def save(self, path: str, mode: str = "overwrite") -> None:
        """Write parquet + a `_dca_meta.json` sidecar (shape metadata).

        The sidecar goes through the Hadoop FileSystem API, not local
        ``open()`` — so it lands next to the parquet on ANY supported
        filesystem (HDFS/S3A/GCS), matching the 100 TB deployment story
        where ``path`` is rarely driver-local."""
        import json

        self._df.write.mode(mode).parquet(path)
        _, meta = self.tree_flatten()
        _hadoop_write_text(
            self._spark, f"{path.rstrip('/')}/_dca_meta.json", json.dumps(meta)
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "DcaTable":
        import json

        df = spark.read.parquet(path)
        meta = json.loads(
            _hadoop_read_text(spark, f"{path.rstrip('/')}/_dca_meta.json")
        )
        return cls.tree_unflatten(df, meta)

    def cache(self) -> "DcaTable":
        self._df = self._df.cache()
        return self

    def explain(self, mode: str = "formatted") -> None:
        """Show the physical plan — the first thing to check when an op
        chain might be shuffling more than it should (see PERF.md)."""
        self._df.explain(mode)


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for a path string, resolved through the
    session's Hadoop conf — works for file:/, hdfs:/, s3a:/, gs:/ ..."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    return p.getFileSystem(hconf), p


def _hadoop_write_text(spark: SparkSession, path_str: str, text: str) -> None:
    fs, p = _hadoop_fs(spark, path_str)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _hadoop_read_text(spark: SparkSession, path_str: str) -> str:
    jvm = spark._jvm
    fs, p = _hadoop_fs(spark, path_str)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()


def assert_same_session(*tables: "DcaTable") -> None:
    """Cross-input engine guard (reference ``assert_same_xnp``,
    `array_dataclass.py:884-891`)."""
    sessions = {id(t.spark) for t in tables}
    if len(sessions) > 1:
        raise ValueError("inputs belong to different SparkSessions")


# ---------------- module helpers ----------------


def _nullable_variant(t: T.DataType) -> T.DataType:
    """Structurally-equal type with nullable containers — Spark refuses
    to cast nullable-element arrays to containsNull=False ones."""
    if isinstance(t, T.ArrayType):
        return T.ArrayType(_nullable_variant(t.elementType), containsNull=True)
    if isinstance(t, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _nullable_variant(f.dataType), True) for f in t.fields]
        )
    return t


def _deep_tolist(v):
    """Arrow hands nested arrays back as object-dtype ndarrays of
    ndarrays; normalize to plain nested python lists."""
    if isinstance(v, np.ndarray):
        return [_deep_tolist(x) for x in v] if v.dtype == object else v.tolist()
    if isinstance(v, (list, tuple)):
        return [_deep_tolist(x) for x in v]
    return v


def _parse_einops_side(side: str) -> List[List[str]]:
    """``'b (h w) c'`` → ``[['b'], ['h', 'w'], ['c']]``."""
    groups: List[List[str]] = []
    i = 0
    toks = side.replace("(", " ( ").replace(")", " ) ").split()
    cur: Optional[List[str]] = None
    for tok in toks:
        if tok == "(":
            if cur is not None:
                raise ShapeError(f"nested parens in einops pattern {side!r}")
            cur = []
        elif tok == ")":
            if cur is None:
                raise ShapeError(f"unbalanced parens in {side!r}")
            groups.append(cur)
            cur = None
        elif tok.isidentifier() or tok == "1":
            if cur is None:
                groups.append([tok])
            else:
                cur.append(tok)
        else:
            raise ShapeError(f"bad einops token {tok!r} in {side!r}")
    if cur is not None:
        raise ShapeError(f"unbalanced parens in {side!r}")
    return groups


def _map_field_expr(col: Column, spec, fn: Callable[[Column, ArraySpec], Column]) -> Column:
    """Apply ``fn(col, leaf_spec)`` at every ArraySpec leaf, rebuilding
    nested structs and descending extra inner-shape array nesting."""
    if isinstance(spec, ArraySpec):
        return fn(col, spec)

    def rebuild(c: Column, depth: int) -> Column:
        if depth:
            return F.transform(c, lambda x: rebuild(x, depth - 1))
        sub = []
        for name, s in spec.table_cls._array_fields().items():
            sub.append(_map_field_expr(c.getField(name), s, fn).alias(name))
        return F.struct(*sub)

    return rebuild(col, len(spec.extra_inner_shape))


# Every pin created by :func:`pin_materialization` is recorded here so a
# long-lived multi-query driver process (bench sweeps, ETL loops) can
# release the pinned blocks deterministically via :func:`release_pins`
# once the consuming query's final action has run.  Without this, dead
# localCheckpoint blocks sit in the block manager until the
# ContextCleaner notices the RDD is unreachable — which needs a JVM GC
# (periodic GC interval: session.py) — and the accumulated blocks were
# measured degrading LATE queries in a 195-query sweep (round-15 bench:
# one spiked pass-3 sample on alphabetically-late gates).  Entries are
# py4j handles to the checkpointed internal RDD (the object that owns
# the blocks; unpersisting the *DataFrame* would not reach it).
_LIVE_PIN_RDDS: List[Any] = []


def _register_pin(df: DataFrame) -> DataFrame:
    """Record the checkpointed RDD behind ``df`` for later release."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        _LIVE_PIN_RDDS.append(plan.rdd())  # LogicalRDD.rdd — block owner
    except Exception:
        pass  # registry is best-effort; the ContextCleaner remains the backstop
    return df


def release_pins() -> int:
    """Unpersist every pinned materialization created since the last call.

    Call ONLY between queries — after the consuming query's final action
    — never while a returned DataFrame may still be evaluated: a
    localCheckpoint's lineage is truncated, so a released pin cannot be
    recomputed (Spark fails loudly with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    Returns the number of pins released.  Non-blocking: block removal
    proceeds asynchronously in the block manager."""
    n = 0
    while _LIVE_PIN_RDDS:
        rdd = _LIVE_PIN_RDDS.pop()
        try:
            rdd.unpersist(False)
            n += 1
        except Exception:
            pass  # context stopped or RDD already cleaned — nothing to release
    return n


def pin_materialization(df: DataFrame, pin: str = "local") -> DataFrame:
    """Pin exactly ONE materialization of ``df`` so every later job sees
    identical partition contents (RangePartitioner boundaries are sampled
    with an RDD-id-derived seed, so re-executing the same plan can place
    rows differently — see :func:`attach_dense_rowid`).

    ``pin`` selects the failure-domain tradeoff (PERF.md "Pinning"):

    - ``"local"`` (default): ``localCheckpoint(eager=True)`` — blocks in
      executor memory/disk, no replication.  Fast and right for
      single-node or short-lived jobs, but on a cluster an executor loss
      makes the pinned RDD unrecoverable (lineage is truncated), failing
      the job instead of recomputing, and blocks are held until the
      frame is GC'd.
    - ``"reliable"``: ``checkpoint(eager=True)`` to the SparkContext
      checkpoint directory — survives executor loss; the write/read
      round-trip costs one extra pass over the data.  Set
      ``sc.setCheckpointDir`` to HDFS/object storage on a real cluster;
      if unset, a local temp dir is auto-configured (sandbox fallback —
      NOT durable across machines).
    """
    if pin == "local":
        return _register_pin(df.localCheckpoint(eager=True))
    if pin == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            import tempfile

            sc.setCheckpointDir(tempfile.mkdtemp(prefix="dca-checkpoint-"))
        return _register_pin(df.checkpoint(eager=True))
    raise ValueError(f"pin must be 'local' or 'reliable', got {pin!r}")


def attach_dense_rowid(
    df: DataFrame, order_by: Optional[str] = None, pin: str = "local"
) -> DataFrame:
    """Add a dense 0..N-1 ``__rowid`` without a single-partition sort.

    Two-pass partition-offset numbering (the standard distributed
    zipWithIndex), entirely JVM-side: count rows per partition (tiny
    collect), broadcast the prefix sums, then number within each
    partition by decoding ``monotonically_increasing_id`` (its low 33
    bits ARE the within-partition record index) — a pure column
    expression, so the data never round-trips through a Python worker
    and the numbering pass adds no shuffle (the offset join is a
    broadcast of |partitions| rows).  If ``order_by`` is given the frame
    is range-repartitioned on it first so the global order follows that
    column; otherwise existing partition order is kept.  ``pin`` picks
    the materialization-pinning mode (see :func:`pin_materialization`).
    """
    if order_by is not None:
        # pin so the counts job and the output job share one
        # materialization: RangePartitioner boundaries are sampled with
        # an RDD-id-derived seed, so two executions of the same
        # repartitionByRange plan can split rows differently once
        # partitions exceed the reservoir sample — silent mis-numbering.
        df = pin_materialization(
            df.repartitionByRange(order_by).sortWithinPartitions(order_by), pin
        )
    with_pid = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    counts = {r["__pid"]: r["cnt"] for r in with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: Dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    offs = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "__pid int, __off long",
    )
    local_idx = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    return (
        with_pid.join(F.broadcast(offs), on="__pid", how="inner")
        .withColumn(ROWID, (F.col("__off") + local_idx).cast("long"))
        .select(ROWID, *df.columns)
    )


# ---------------- nested-value helpers (construction path) ----------------


def _nested_to_tree(val: Any, table_cls: type) -> Dict[str, Any]:
    if isinstance(val, DcaTable):
        if not isinstance(val, table_cls):
            raise TypeError(f"expected {table_cls.__name__}, got {type(val).__name__}")
        return {"__tree": val.to_numpy_fields(), "__cls": table_cls}
    if isinstance(val, dict):
        tree = {}
        for name, spec in table_cls._array_fields().items():
            sub = val[name]
            if isinstance(spec, ArraySpec):
                tree[name] = np.asarray(sub, dtype=spec.np_dtype)
            else:
                tree[name] = _nested_to_tree(sub, spec.table_cls)
        return {"__tree": tree, "__cls": table_cls}
    raise TypeError(f"nested field value must be {table_cls.__name__} or dict, got {type(val)}")


def _tree_batch_shape(node: Dict[str, Any], table_cls: type) -> Tuple[int, ...]:
    tree = node["__tree"]
    shapes = []
    for name, spec in table_cls._array_fields().items():
        arr = tree[name]
        if isinstance(spec, ArraySpec):
            nd = len(spec.inner_shape)
            shapes.append(arr.shape[: arr.ndim - nd] if nd else arr.shape)
        else:
            shapes.append(_tree_batch_shape(arr, spec.table_cls))
    if not shapes:
        return ()
    return tuple(np.broadcast_shapes(*shapes))


def _tree_broadcast(node: Any, old: Tuple[int, ...], new: Tuple[int, ...]):
    if isinstance(node, np.ndarray):
        inner = node.shape[len(old):]
        return np.broadcast_to(node, tuple(new) + inner)
    tree = {k: (_tree_broadcast(v, old, new) if k != "__cls" else v) for k, v in node["__tree"].items()}
    return {"__tree": tree, "__cls": node["__cls"]}


def _tree_row_value(node: Any, spec, i: int, batch_shape: Tuple[int, ...]):
    """Python value for row ``i`` (C-order) of a field, as nested tuples/
    lists matching the Spark schema."""
    n = _size(batch_shape)
    if isinstance(spec, ArraySpec):
        arr = node
        inner = arr.shape[arr.ndim - len(spec.inner_shape):] if spec.inner_shape else ()
        flat = np.ascontiguousarray(arr).reshape((n,) + tuple(inner))
        v = flat[i]
        if np.dtype(spec.np_dtype).kind == "c":
            # complex → struct<re, im> (SURVEY §1.4 dtype mapping)
            def to_struct(x):
                return (
                    [to_struct(y) for y in x]
                    if isinstance(x, (list, np.ndarray))
                    else (float(x.real), float(x.imag))
                )

            return to_struct(v)
        out = v.tolist() if isinstance(v, np.ndarray) else v.item()
        if np.dtype(spec.np_dtype) == np.dtype(np.uint64):
            # ui64 maps to DecimalType(20,0): Spark requires Decimal objs
            import decimal

            def to_dec(x):
                return (
                    [to_dec(y) for y in x]
                    if isinstance(x, list)
                    else decimal.Decimal(int(x))
                )

            out = to_dec(out)
        return out
    # NestedSpec
    tree = node["__tree"]
    cls = spec.table_cls

    def struct_at(sub_tree, flat_idx, sub_batch_n):
        vals = []
        for name, s in cls._array_fields().items():
            vals.append(_tree_row_value(sub_tree[name] if not isinstance(sub_tree[name], dict) else sub_tree[name], s, flat_idx, (sub_batch_n,)))
        return tuple(vals)

    extra = spec.extra_inner_shape
    if not extra:
        return struct_at(tree, i, n)
    # extra inner dims: row i holds a nested list over the extra shape
    extra_sz = _size([d for d in extra])
    def build(level: int, base: int):
        if level == len(extra):
            return struct_at(tree, base, n * extra_sz)
        d = extra[level]
        stride = _size([x for x in extra[level + 1:]])
        return [build(level + 1, base + j * stride) for j in range(d)]
    return build(0, i * extra_sz)
