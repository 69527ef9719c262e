"""``@vectorize_method`` — auto-batching of scalar-written methods.

Reference: `vectorization.py:53-198` — the user writes a method assuming
``self.shape == ()``; the decorator batches it over the whole table.

Spark-first compilation tiers (SURVEY.md §4.3):

- **Tier 1 — Column tracing** (preferred): the method is called once with a
  view of ``self`` whose fields are Catalyst ``Column`` expressions.  If it
  composes (arithmetic, ``F.*``), the whole batched computation is a single
  codegen'd ``select`` — the moral equivalent of the reference's compiled
  ``jax.vmap`` path (`vectorization.py:350-378`) but JVM-side.
- **Tier 2 — Arrow batch loop**: ``mapInPandas``; each Arrow batch is
  decoded to numpy and the scalar method runs per row (the reference's
  numpy backend is exactly this unrolled loop, `vectorization.py:333-347`).
  Output schema is inferred by running the method once on the first row,
  mirroring the reference's tf signature inference
  (`vectorization.py:437-450`), or declared via ``returns=``.

``static_args`` are passed through un-batched (closure capture — the
Spark analog of the reference's static-arg routing,
`vectorization.py:488-503`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, FrozenSet, Optional, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataclass_array_spark.core.schema import ArraySpec, spark_type_for_np
from dataclass_array_spark.core.table import DcaTable, NestedSpec, ROWID

_RESULT_CLS_CACHE: Dict[Tuple, type] = {}


def make_table_cls(name: str, fields: Dict[str, ArraySpec]) -> type:
    """Dynamically build a DcaTable subclass for computed outputs."""
    key = (name, tuple(sorted((k, v.np_dtype.name, v.inner_shape) for k, v in fields.items())))
    if key in _RESULT_CLS_CACHE:
        return _RESULT_CLS_CACHE[key]
    cls = type(name, (DcaTable,), {"__annotations__": dict(fields)})
    _RESULT_CLS_CACHE[key] = cls
    return cls


class _ColumnView:
    """``self`` proxy whose array fields are Column expressions."""

    def __init__(self, table: DcaTable):
        object.__setattr__(self, "_fields", {})
        for fname, spec in type(table)._array_fields().items():
            self._fields[fname] = F.col(fname)
            object.__setattr__(self, fname, F.col(fname))
        for k, v in table._statics.items():
            object.__setattr__(self, k, v)


class _ScalarView:
    """``self`` proxy for the per-row tier-2 path: numpy values."""

    def __init__(self, fields: Dict[str, Any], statics: Dict[str, Any]):
        for k, v in fields.items():
            object.__setattr__(self, k, v)
        for k, v in statics.items():
            object.__setattr__(self, k, v)


def _normalize_out(out: Any) -> Dict[str, Any]:
    if isinstance(out, dict):
        return out
    return {"value": out}


def vectorize_method(fn: Optional[Callable] = None, *, static_args: FrozenSet[str] = frozenset(), returns: Optional[Dict[str, ArraySpec]] = None):
    """Decorator; see module docstring.  ``returns`` optionally declares
    the output field specs (skips the inference probe)."""

    def decorate(method: Callable) -> Callable:
        @functools.wraps(method)
        def wrapper(self: DcaTable, *args, **kwargs):
            statics = {k: kwargs.pop(k) for k in list(kwargs) if k in static_args}

            # scalar fast-path (reference `vectorization.py:162-163`)
            # — still executed through Spark for engine uniformity.

            # ---- Tier 1: Column tracing ----
            try:
                view = _ColumnView(self)
                out = method(view, *args, **{**kwargs, **statics})
                out_d = _normalize_out(out)
                if all(isinstance(v, Column) for v in out_d.values()):
                    sel = [F.col(ROWID)] + [v.alias(k) for k, v in out_d.items()]
                    res_df = self.df.select(*sel)
                    specs = returns or {
                        k: _spec_from_spark_type(res_df.schema[k].dataType) for k in out_d
                    }
                    cls = make_table_cls(f"{type(self).__name__}_{method.__name__}_out", specs)
                    return cls._wrap(
                        res_df.select(
                            ROWID, *[F.col(k).cast(specs[k].spark_type).alias(k) for k in out_d]
                        ),
                        self.shape,
                        {},
                        self.spark,
                    )
            except Exception:
                pass  # fall through to tier 2

            # ---- Tier 2: Arrow batch + per-row scalar loop ----
            in_specs = {
                k: v for k, v in type(self)._array_fields().items() if isinstance(v, ArraySpec)
            }
            statics_b = dict(self._statics, **statics)

            # output-schema inference probe on the first row
            if returns is not None:
                out_specs = returns
            else:
                probe = self.df.orderBy(ROWID).limit(1).toPandas()
                if len(probe) == 0:
                    raise ValueError("cannot infer vectorized output schema from empty table")
                row_fields = {
                    k: _to_np(probe[k].iloc[0], spec) for k, spec in in_specs.items()
                }
                probe_out = _normalize_out(
                    method(_ScalarView(row_fields, statics_b), *args, **kwargs)
                )
                out_specs = {
                    k: ArraySpec(np.asarray(v).dtype, tuple(np.asarray(v).shape))
                    for k, v in probe_out.items()
                }

            out_schema = T.StructType(
                [T.StructField(ROWID, T.LongType(), False)]
                + [T.StructField(k, s.spark_type, True) for k, s in out_specs.items()]
            )
            in_names = list(in_specs)
            spec_items = list(in_specs.items())
            meth = method

            def run(batches):
                import pandas as pd

                for pdf in batches:
                    out_cols: Dict[str, list] = {k: [] for k in out_specs}
                    for i in range(len(pdf)):
                        row_fields = {
                            k: _to_np(pdf[k].iloc[i], spec) for k, spec in spec_items
                        }
                        r = _normalize_out(
                            meth(_ScalarView(row_fields, statics_b), *args, **kwargs)
                        )
                        for k in out_specs:
                            v = np.asarray(r[k])
                            out_cols[k].append(v.tolist() if v.ndim else v.item())
                    res = pd.DataFrame({ROWID: pdf[ROWID]})
                    for k in out_specs:
                        res[k] = out_cols[k]
                    yield res

            res_df = self.df.select(ROWID, *in_names).mapInPandas(run, schema=out_schema)
            cls = make_table_cls(f"{type(self).__name__}_{method.__name__}_out", out_specs)
            return cls._wrap(res_df, self.shape, {}, self.spark)

        return wrapper

    return decorate(fn) if fn is not None else decorate


def _to_np(v: Any, spec: ArraySpec) -> np.ndarray:
    return np.asarray(v, dtype=spec.np_dtype)


def _spec_from_spark_type(t: T.DataType) -> ArraySpec:
    inner: Tuple[Optional[int], ...] = ()
    while isinstance(t, T.ArrayType):
        inner = inner + (None,)
        t = t.elementType
    np_dtype = {
        "float": np.float32,
        "double": np.float64,
        "tinyint": np.int8,
        "smallint": np.int16,
        "int": np.int32,
        "bigint": np.int64,
        "boolean": np.bool_,
        "string": np.str_,
    }.get(t.simpleString(), np.float64)
    return ArraySpec(np.dtype(np_dtype) if np_dtype is not np.str_ else np.dtype("U"), inner)
