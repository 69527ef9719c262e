"""Symbolic numpy tracing for vectorize tier-1.

The reference's best path is a compiled ``jax.vmap`` of the scalar
method (`vectorization.py:350-378`).  Our analog: wrap each field Column
in a ``SymbolicArray`` that implements the numpy operator protocols
(``__array_ufunc__`` / ``__array_function__``), so a scalar method
written in plain numpy style —

    def norm(self):
        return np.sqrt(np.dot(self.dir, self.dir))

— traces to pure Catalyst expressions (``zip_with`` + ``aggregate`` +
``sqrt``) and runs inside whole-stage codegen, never touching a Python
worker.  Unsupported numpy calls raise → the decorator falls back to the
tier-2 Arrow loop, so tracing is strictly an optimization.

Supported surface (grows as needed): elementwise ufuncs (+ − × ÷ **,
neg, abs, sqrt, exp, log, maximum, minimum, comparisons), ``np.dot``
(1-d), ``np.sum``, ``np.linalg.norm`` — over scalar fields
(inner_ndim 0) and vector fields (inner_ndim 1).
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


class TraceError(TypeError):
    pass


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr.cast("array<double>"), F.lit(0.0), lambda a, x: a + x)


class SymbolicArray:
    """A Column standing in for one row's field value (scalar or fixed-
    length vector) during method tracing."""

    def __init__(self, col: Column, inner_ndim: int):
        if inner_ndim > 1:
            raise TraceError("symbolic tracing supports inner rank <= 1")
        self.col = col
        self.inner_ndim = inner_ndim

    # ---- helpers ----
    def _binop(self, other: Any, fn, reverse: bool = False):
        if isinstance(other, SymbolicArray):
            if other.inner_ndim != self.inner_ndim:
                # scalar vs vector broadcast
                scal, vec = (
                    (other, self) if self.inner_ndim else (self, other)
                )
                apply = (lambda x: fn(scal.col, x)) if (scal is self) != reverse else (
                    lambda x: fn(x, scal.col)
                )
                return SymbolicArray(F.transform(vec.col, apply), 1)
            if self.inner_ndim == 0:
                a, b = (other.col, self.col) if reverse else (self.col, other.col)
                return SymbolicArray(fn(a, b), 0)
            l, r = (other.col, self.col) if reverse else (self.col, other.col)
            return SymbolicArray(F.zip_with(l, r, lambda x, y: fn(x, y)), 1)
        # plain python scalar
        lit = F.lit(float(other) if isinstance(other, (int, float, np.floating, np.integer)) else other)
        if self.inner_ndim == 0:
            a, b = (lit, self.col) if reverse else (self.col, lit)
            return SymbolicArray(fn(a, b), 0)
        apply = (lambda x: fn(lit, x)) if reverse else (lambda x: fn(x, lit))
        return SymbolicArray(F.transform(self.col, apply), 1)

    def _map(self, fn):
        if self.inner_ndim == 0:
            return SymbolicArray(fn(self.col), 0)
        return SymbolicArray(F.transform(self.col, fn), 1)

    # ---- python operators ----
    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: a - b, reverse=True)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._binop(o, lambda a, b: a / b, reverse=True)

    def __pow__(self, o):
        return self._binop(o, lambda a, b: F.pow(a, b))

    def __neg__(self):
        return self._map(lambda c: -c)

    def __abs__(self):
        return self._map(F.abs)

    def __gt__(self, o):
        return self._binop(o, lambda a, b: a > b)

    def __ge__(self, o):
        return self._binop(o, lambda a, b: a >= b)

    def __lt__(self, o):
        return self._binop(o, lambda a, b: a < b)

    def __le__(self, o):
        return self._binop(o, lambda a, b: a <= b)

    # ---- numpy protocols ----
    _UFUNC_MAP = {
        np.add: lambda a, b: a + b,
        np.subtract: lambda a, b: a - b,
        np.multiply: lambda a, b: a * b,
        np.true_divide: lambda a, b: a / b,
        np.power: lambda a, b: F.pow(a, b),
        np.maximum: F.greatest,
        np.minimum: F.least,
    }
    _UNARY_MAP = {
        np.negative: lambda c: -c,
        np.absolute: F.abs,
        np.sqrt: F.sqrt,
        np.exp: F.exp,
        np.log: F.log,
    }

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out"):
            raise TraceError(f"unsupported ufunc call {ufunc}")
        if ufunc in self._UNARY_MAP and len(inputs) == 1:
            return self._map(self._UNARY_MAP[ufunc])
        if ufunc in self._UFUNC_MAP and len(inputs) == 2:
            a, b = inputs
            if a is self:
                return self._binop(b, self._UFUNC_MAP[ufunc])
            return self._binop(a, self._UFUNC_MAP[ufunc], reverse=True)
        raise TraceError(f"unsupported ufunc {ufunc}")

    def __array_function__(self, func, types, args, kwargs):
        if func is np.dot and len(args) == 2:
            a, b = args
            if isinstance(a, SymbolicArray) and isinstance(b, SymbolicArray):
                if a.inner_ndim == 1 and b.inner_ndim == 1:
                    prods = F.zip_with(
                        a.col.cast("array<double>"),
                        b.col.cast("array<double>"),
                        lambda x, y: x * y,
                    )
                    return SymbolicArray(
                        F.aggregate(prods, F.lit(0.0), lambda s, x: s + x), 0
                    )
            raise TraceError("np.dot supported for 1-d symbolic arrays only")
        if func is np.sum and len(args) == 1 and isinstance(args[0], SymbolicArray):
            s = args[0]
            if s.inner_ndim == 1:
                return SymbolicArray(_fold_sum(s.col), 0)
            return s
        if func is np.mean and len(args) == 1 and isinstance(args[0], SymbolicArray):
            s = args[0]
            if s.inner_ndim == 1:
                return SymbolicArray(
                    _fold_sum(s.col) / F.size(s.col).cast("double"), 0
                )
            return s
        if func in (np.max, np.amax) and len(args) == 1 and isinstance(args[0], SymbolicArray):
            s = args[0]
            if s.inner_ndim == 1:
                return SymbolicArray(F.array_max(s.col), 0)
            return s
        if func in (np.min, np.amin) and len(args) == 1 and isinstance(args[0], SymbolicArray):
            s = args[0]
            if s.inner_ndim == 1:
                return SymbolicArray(F.array_min(s.col), 0)
            return s
        if func is np.linalg.norm and len(args) == 1 and isinstance(args[0], SymbolicArray):
            s = args[0]
            if s.inner_ndim == 1:
                prods = F.zip_with(
                    s.col.cast("array<double>"),
                    s.col.cast("array<double>"),
                    lambda x, y: x * y,
                )
                return SymbolicArray(
                    F.sqrt(F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)), 0
                )
        raise TraceError(f"unsupported numpy function {func}")

    def __array__(self, *a, **k):
        # np.asarray would force materialization — refuse so the
        # decorator falls back to tier-2
        raise TraceError("cannot materialize a SymbolicArray (use tier-2)")

    def __iter__(self):
        raise TraceError("cannot iterate a SymbolicArray (use tier-2)")

    def __float__(self):
        raise TraceError("cannot coerce a SymbolicArray to float (use tier-2)")
