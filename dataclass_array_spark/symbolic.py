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
neg, abs, sqrt, exp, log, maximum, minimum, comparisons), ``np.dot`` /
``@`` (vector·vector, matrix·vector, vector·matrix, matrix·matrix),
``np.sum/mean/max/min`` (with ``axis=`` on matrices), comparisons and
boolean algebra (``> >= < <= == !=``, ``& | ^ ~``) with boolean
reductions ``np.sum/count_nonzero/any/all/mean`` compiling to
``size(filter(...))`` / ``exists`` / ``forall``, ``.astype``,
``np.asarray`` passthrough during the trace (see ``trace_context``),
``np.transpose`` / ``.T``, int indexing, ``np.linalg.norm``,
``np.where`` (``when/otherwise``, numpy dtype rule: bool only when both
branches are bool), ``np.clip``, ``np.argmax``/``np.argmin`` (first-
match tie rule via ``array_position``), ``np.floor``/``np.ceil``/
``np.sign``/``np.rint``/``np.round(decimals=0)`` (half-even →
``bround``) / ``np.tanh``, and Python scalar coercion ``float(x)`` /
``int(x)`` on 0-d results (trace-window builtins stand-ins — see
``trace_context``) — over scalar fields
(inner_ndim 0), vector fields (inner_ndim 1), and matrix fields
(inner_ndim 2, e.g. a 3×3 rotation: reference
`array_dataclass_test.py:78-102` ``Isometrie``).  All folds are
sequential left-folds (``F.aggregate``), bit-identical to DuckDB's
``list_reduce(list_prepend(0.0, ...))``.

NaN parity (round 7): traced expressions follow NUMPY/IEEE NaN
semantics even where Spark SQL's differ (Spark orders NaN largest and
makes ``NaN = NaN`` true).  Guarded: comparisons (False on NaN, True
for ``!=``), ``np.minimum``, ``np.clip``, min-reductions, ``argmin``,
``np.floor``/``np.ceil`` (BIGINT NaN→0 / ±inf clamp), division
(round 9 — Spark returns NULL for any zero divisor where IEEE says
±inf/NaN; see ``_ieee_div``), ``arcsinh``/``arccosh`` (round 9 —
Spark's naive log-forms lose precision near domain edges; fdlibm
branch structures in ``_asinh_acc``/``_acosh_acc``), ``fmod``/
``np.mod``/``%`` (zero-divisor NaN + sign-of-divisor correction),
``fmax`` (Spark greatest ranks NaN largest; fmax ignores it),
``floor_divide``/``//`` (npy_math's fmod-based construction — the
naive floor(a/b) misses the inf-dividend specials).  Already-correct
by Spark's own behavior: ``maximum``/``greatest``, max-reductions,
``argmax`` (first-NaN), ``bround``, ``signum``, arithmetic folds.
Differentially fuzzed with NaN-bearing corpora in
tests/test_fuzz_vectorize.py.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


class TraceError(TypeError):
    pass


_NP_TO_SPARK = {
    "float32": "float",
    "float64": "double",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "bool": "boolean",
}

_trace_patch_lock = threading.Lock()

_REAL_FLOAT, _REAL_INT = float, int


class _CoercionMeta(type):
    """Metaclass for the trace-window ``float``/``int`` stand-ins:
    ``isinstance``/``issubclass`` against the stand-in delegate to the
    REAL builtin, so library code running concurrently with a trace
    (``isinstance(v, float)``) sees unchanged semantics."""

    def __instancecheck__(cls, inst):
        return isinstance(inst, cls._real)

    def __subclasscheck__(cls, sub):
        return issubclass(sub, cls._real)


class _TraceFloat(float, metaclass=_CoercionMeta):
    """``float(x)`` during a trace: a 0-d SymbolicArray stays symbolic
    (cast to double — numpy's ``float(np.float32(v))`` widening), so
    reference-style bodies that round-trip scalars through ``float``
    (`vectorization_test.py:39-106`) keep compiling to Catalyst.
    ``__new__`` may return any object, so non-symbolic inputs coerce
    through the real ``float`` unchanged."""

    _real = _REAL_FLOAT

    def __new__(cls, x=0.0):
        if isinstance(x, SymbolicArray):
            if x.inner_ndim != 0:
                raise TraceError("float() of a non-scalar SymbolicArray")
            return SymbolicArray(x.col.cast("double"), 0)
        return _REAL_FLOAT(x)


class _TraceInt(int, metaclass=_CoercionMeta):
    """``int(x)`` during a trace: 0-d SymbolicArray → ``cast('long')``
    — Spark's double→long cast truncates toward zero exactly like
    ``int(np.float64(v))``."""

    _real = _REAL_INT

    def __new__(cls, x=0, *a, **k):
        if isinstance(x, SymbolicArray):
            if a or k:
                raise TraceError("int(symbolic, base=...) is unsupported")
            if x.inner_ndim != 0:
                raise TraceError("int() of a non-scalar SymbolicArray")
            return SymbolicArray(x.col.cast("long"), 0)
        return _REAL_INT(x, *a, **k)


@contextlib.contextmanager
def trace_context():
    """Driver-side patch active only while the tier-1 symbolic trace
    calls the user method: ``np.asarray``/``np.array``/``np.asanyarray``
    pass a SymbolicArray through (honoring ``dtype=`` via ``astype``)
    instead of raising in ``__array__``, and the ``float``/``int``
    builtins pass a 0-d SymbolicArray through as a Catalyst cast (they
    cannot be taught per-object: CPython requires ``__float__`` to
    return a real float, so ``float(symb)`` would otherwise force the
    tier-2 loop for every reference-style body that mixes Python
    scalars with field math).  The reference's scalar methods are
    written numpy-first (`vectorization_test.py:39-106` bodies use
    ``np.asarray``/``float`` freely), so without this every such body
    lands on the tier-2 per-row loop.  The patch is process-local,
    driver-only, lock-serialized, and reverted in ``finally`` —
    executor-side tier-2 code never sees it; the stand-ins delegate
    isinstance/issubclass and all non-symbolic calls to the real
    builtins."""
    import builtins

    orig = {n: getattr(np, n) for n in ("asarray", "array", "asanyarray", "ascontiguousarray")}

    def _passthrough(name):
        real = orig[name]

        def fn(obj, dtype=None, *a, **k):
            if isinstance(obj, SymbolicArray):
                return obj.astype(dtype) if dtype is not None else obj
            return real(obj, dtype, *a, **k) if dtype is not None else real(obj, *a, **k)

        return fn

    with _trace_patch_lock:
        for n in orig:
            setattr(np, n, _passthrough(n))
        builtins.float, builtins.int = _TraceFloat, _TraceInt
        try:
            yield
        finally:
            builtins.float, builtins.int = _REAL_FLOAT, _REAL_INT
            for n, f in orig.items():
                setattr(np, n, f)


def _nan_minimum(a: Column, b: Column) -> Column:
    """numpy ``minimum``: NaN in EITHER operand propagates.  Spark's
    ``least`` treats NaN as the LARGEST value (``least(NaN, x) = x``) —
    a silent wrong value on NaN input, so guard explicitly.  Only the
    isnan probes cast to double; the value branches keep the operands'
    own type (integer minimum stays integral)."""
    return (
        F.when(F.isnan(a.cast("double")), a)
        .when(F.isnan(b.cast("double")), b)
        .otherwise(F.least(a, b))
    )


def _ieee_log(fn, boundary: float):
    """numpy log-family IEEE semantics: ``log(boundary) = -inf`` and
    ``log(x < boundary) = NaN``.  Spark's log/log10/log2/log1p return
    NULL at and below the domain boundary — a silent semantic change
    (NULL propagates differently from NaN through comparisons), so
    guard explicitly.  NaN input falls through both probes (NaN < b
    and NaN == b are false) into ``fn(NaN) = NaN`` — correct."""

    def g(c: Column) -> Column:
        return (
            F.when(c < F.lit(boundary), F.lit(float("nan")))
            .when(c == F.lit(boundary), F.lit(float("-inf")))
            .otherwise(fn(c))
        )

    return g


def _nan_int_round(c: Column, fn) -> Column:
    """numpy ``floor``/``ceil``: stay float64, pass non-finite and
    huge values through.  Spark's floor/ceil return BIGINT — NaN
    silently becomes 0 and ±inf / |x| ≥ 2⁶³ clamp to Long bounds.
    Doubles with |x| ≥ 2⁶³ are already integers (and NaN/±inf must
    survive), so pass them through unchanged and only round the
    in-range finite values."""
    cd = c.cast("double")
    return F.when(
        F.isnan(cd) | (F.abs(cd) >= F.lit(float(2**63))), cd
    ).otherwise(fn(c).cast("double"))


_LN2 = 0.6931471805599453  # double nearest ln(2), fdlibm's constant


def _asinh_acc(c: Column) -> Column:
    """numpy-grade ``arcsinh``.  Spark's own ``asinh`` is the naive
    ``log(x + sqrt(x²+1))``, which loses ALL precision near zero
    (asinh(1e-300) → 0.0 — x² underflows and log(1.0) = 0) and drifts
    to ~1e5 ulp in the small-|x| band where log(1+y) cancels.  This is
    the fdlibm branch structure instead — probed ≤1 ulp vs numpy over
    a 130-value corpus incl. 1e±300, denormals, 2^±28 and specials:

    - |x| ≤ 2⁻²⁸: asinh(x) = x (next Taylor term is x³/6 < 2⁻⁵⁷·x)
    - |x| ≥ 2²⁸ (incl. ±inf): sign·(log|x| + ln2)
    - |x| > 2:   sign·log(2|x| + 1/(|x| + sqrt(x²+1)))
    - else:      sign·log1p(|x| + x²/(1 + sqrt(1+x²)))

    NaN: Spark orders NaN above every value, so NaN ≤ 2⁻²⁸ is false
    and NaN falls through to a branch that propagates it."""
    u = F.abs(c)
    one = F.lit(1.0)
    return F.when(u <= F.lit(2.0**-28), c).otherwise(
        F.signum(c)
        * (
            F.when(u >= F.lit(2.0**28), F.log(u) + F.lit(_LN2))
            .when(
                u > F.lit(2.0),
                F.log(F.lit(2.0) * u + one / (u + F.sqrt(u * u + one))),
            )
            .otherwise(F.log1p(u + u * u / (one + F.sqrt(one + u * u))))
        )
    )


def _acosh_acc(c: Column) -> Column:
    """numpy-grade ``arccosh`` (domain x ≥ 1).  Spark's naive
    ``log(x + sqrt(x²-1))`` overflows x² at x ~ 1e300 (→ +inf instead
    of ~691) and cancels in x²−1 just above 1 (~10 ulp at x = 1.02,
    ~1e6 ulp at 1+1e-7).  fdlibm branches, probed ≤1 ulp vs numpy:

    - x ≥ 2²⁸ (incl. +inf): log(x) + ln2
    - x ≥ 2: log(2x − 1/(x + sqrt(x²−1)))
    - 1 < x < 2: log1p(t + sqrt(2t + t²)), t = x−1  (no cancellation)
    - x = 1: 0;  x < 1 or NaN: NaN (NaN falls into the x ≥ 2²⁸ branch
      under Spark's NaN-is-largest ordering — log(NaN) + ln2 = NaN)."""
    t = c - F.lit(1.0)
    return (
        F.when(c >= F.lit(2.0**28), F.log(c) + F.lit(_LN2))
        .when(
            c >= F.lit(2.0),
            F.log(F.lit(2.0) * c - F.lit(1.0) / (c + F.sqrt(c * c - F.lit(1.0)))),
        )
        .when(c > F.lit(1.0), F.log1p(t + F.sqrt(F.lit(2.0) * t + t * t)))
        .when(c == F.lit(1.0), F.lit(0.0))
        .otherwise(F.lit(float("nan")))
    )


def _ieee_fmod(a: Column, b: Column) -> Column:
    """numpy ``fmod`` (C semantics — result sign follows the
    DIVIDEND): Spark's ``%`` is Java's, which already matches C fmod
    on every special (inf % x = NaN, x % inf = x, NaN propagation)
    EXCEPT a zero divisor, where Spark returns NULL and IEEE says
    NaN."""
    return F.when(b.cast("double") == F.lit(0.0), F.lit(float("nan"))).otherwise(
        a % b
    )


def _np_mod(a: Column, b: Column) -> Column:
    """numpy ``mod``/``remainder`` (Python semantics — result sign
    follows the DIVISOR): C fmod plus the classic correction ``r + b``
    when r is nonzero with the opposite sign.  The correction also
    reproduces numpy's odd-looking special ``mod(-5, inf) = inf``
    (fmod = -5, signs differ, -5 + inf = inf).  NaN r falls through
    either branch as NaN (Spark's NaN != 0 is true, but r + b and r
    are both NaN)."""
    r = _ieee_fmod(a, b)
    return F.when(
        (r != F.lit(0.0)) & ((r < F.lit(0.0)) != (b.cast("double") < F.lit(0.0))),
        r + b,
    ).otherwise(r)


def _np_floor_divide(a: Column, b: Column) -> Column:
    """numpy ``floor_divide``/``//``, replicating npy_math's own
    construction rather than the naive ``floor(a/b)``: ``div =
    (a − fmod(a, b))/b``, minus 1 when the fmod remainder is nonzero
    with sign opposite the divisor (the same correction ``_np_mod``
    applies to the remainder), then npy_divmod's final *snap to the
    nearest integral value* — ``fd = floor(div); if div − fd > 0.5:
    fd += 1``.  The snap matters for any NON-dyadic divisor: the
    intermediate ``(a − fmod(a, b))/b`` is a rounded division of two
    doubles and need not land exactly on an integer (``3.0 // 0.1``
    gives 29.000000000000004 without it; numpy and CPython return
    29.0).  This also reproduces every numpy special the naive form
    misses — ``floor_divide(-5, inf) = -1`` (not floor(-0.0) = -0),
    ``floor_divide(inf, 3) = NaN`` (fmod(inf, 3) is NaN and poisons
    the quotient), while a zero divisor takes the IEEE division
    directly (``5//0 = inf``, ``0//0 = NaN`` — numpy returns a/b
    there).

    The snap uses Spark ``floor`` (double → BIGINT), so it is gated
    to ``|div| < 2^52``: above that every double is already integral
    (no fractional bits remain) and the snap is the identity, and the
    gate keeps NaN/±inf quotients (whose comparisons are all false)
    on the untouched-``div`` branch, clear of the long cast.  One
    knowing divergence, shared with ``_ieee_div``: a ±0.0 quotient
    loses its sign bit (numpy emits ``copysign(0, a/b)``) — invisible
    to ``==`` and to every downstream comparison or hash."""
    r = _ieee_fmod(a, b)
    corr = (r != F.lit(0.0)) & (
        (r < F.lit(0.0)) != (b.cast("double") < F.lit(0.0))
    )
    div0 = _ieee_div(a - r, b)
    div = F.when(corr, div0 - F.lit(1.0)).otherwise(div0)
    fd = F.floor(div)
    snapped = (
        F.when(div - fd > F.lit(0.5), fd + F.lit(1)).otherwise(fd).cast("double")
    )
    return F.when(b.cast("double") == F.lit(0.0), _ieee_div(a, b)).otherwise(
        F.when(F.abs(div) < F.lit(2.0**52), snapped).otherwise(div)
    )


def _nan_fmax(a: Column, b: Column) -> Column:
    """numpy ``fmax``: NaN-IGNORING max (returns the non-NaN operand;
    NaN only if both are).  Spark's ``greatest`` ranks NaN LARGEST, so
    greatest(NaN, x) = NaN — wrong for fmax; guard explicitly.  (fmin
    needs no guard: least(NaN, x) = x is already fmin.)"""
    ad, bd = a.cast("double"), b.cast("double")
    return (
        F.when(F.isnan(ad), b)
        .when(F.isnan(bd), a)
        .otherwise(F.greatest(a, b))
    )


def _ieee_div(a: Column, b: Column) -> Column:
    """IEEE-754 division: numpy gives ``x/0 = ±inf`` (sign of x) and
    ``0/0 = NaN/0 = NaN``; Spark SQL division returns NULL for ANY
    zero divisor — a silent semantic change (NULL propagates
    differently from ±inf through every downstream comparison).  The
    one knowing divergence: a ``-0.0`` divisor is treated as ``+0.0``
    (Spark cannot see a float's sign bit; numpy would flip the
    result's sign).  NaN divisors skip the guard (``NaN == 0.0`` is
    false even under Spark's NaN ordering) and propagate through the
    raw division."""
    return F.when(
        b.cast("double") == F.lit(0.0),
        F.when(
            F.isnan(a.cast("double")) | (a.cast("double") == F.lit(0.0)),
            F.lit(float("nan")),
        ).otherwise(F.signum(a) * F.lit(float("inf"))),
    ).otherwise(a / b)


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr.cast("array<double>"), F.lit(0.0), lambda a, x: a + x)


def _dot_fold(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two 1-d array columns (double)."""
    prods = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda s, x: s + x)


def _transpose2(col: Column) -> Column:
    """array<array<T>> transpose: result[j][i] = col[i][j]."""
    ncols = F.size(F.element_at(col, 1))
    return F.transform(
        F.sequence(F.lit(0), ncols - 1),
        lambda j: F.transform(col, lambda row: F.get(row, j)),
    )


def _nested_map(col: Column, ndim: int, fn) -> Column:
    if ndim == 0:
        return fn(col)
    if ndim == 1:
        return F.transform(col, fn)
    return F.transform(col, lambda row: F.transform(row, fn))


def _nested_zip(a: Column, b: Column, ndim: int, fn) -> Column:
    if ndim == 0:
        return fn(a, b)
    if ndim == 1:
        return F.zip_with(a, b, fn)
    return F.zip_with(a, b, lambda ra, rb: F.zip_with(ra, rb, fn))


class SymbolicArray:
    """A Column standing in for one row's field value (scalar or fixed-
    length vector) during method tracing."""

    def __init__(
        self,
        col: Column,
        inner_ndim: int,
        t_base: Column | None = None,
        is_bool: bool = False,
    ):
        if inner_ndim > 2:
            raise TraceError("symbolic tracing supports inner rank <= 2")
        self.col = col
        self.inner_ndim = inner_ndim
        # provenance: if this matrix IS a transpose, the pre-transpose
        # column — lets matmul (which needs the transpose of its right
        # operand) avoid building transpose(transpose(X)) trees for the
        # common ``A @ B.T`` pattern
        self._t_base = t_base
        # element type is boolean (result of a comparison / logical op):
        # reductions over it compile to count/exists/forall forms
        self.is_bool = is_bool

    # ---- helpers ----
    def _num(self) -> "SymbolicArray":
        """numpy arithmetic treats booleans as 0/1 — coerce a boolean
        array to long so ``count + (x > 1)`` traces like numpy instead
        of failing Spark's strict BIGINT+BOOLEAN type check."""
        if not self.is_bool:
            return self
        return SymbolicArray(
            _nested_map(self.col, self.inner_ndim, lambda c: c.cast("long")),
            self.inner_ndim,
        )

    def _binop(self, other: Any, fn, reverse: bool = False, numeric: bool = False):
        """Elementwise fn with numpy broadcasting; operand order is
        (self, other), or (other, self) when ``reverse``.  ``numeric``
        marks arithmetic context: boolean operands coerce to 0/1."""
        self = self._num() if numeric else self  # noqa: PLW0642 — local rebind
        if isinstance(other, SymbolicArray):
            if numeric:
                other = other._num()
            a, b = (other, self) if reverse else (self, other)
            an, bn = a.inner_ndim, b.inner_ndim
            if an == bn:
                return SymbolicArray(_nested_zip(a.col, b.col, an, fn), an)
            if an == 0 or bn == 0:
                # scalar broadcast against vector/matrix
                scal_left = an == 0
                scal, vec = (a, b) if scal_left else (b, a)
                vn = bn if scal_left else an
                g = (lambda x: fn(scal.col, x)) if scal_left else (
                    lambda x: fn(x, scal.col)
                )
                return SymbolicArray(_nested_map(vec.col, vn, g), vn)
            # numpy (c,) vs (r,c) broadcast: zip the vector against each row
            vec_left = an == 1
            v, m = (a, b) if vec_left else (b, a)
            g = (lambda row: F.zip_with(v.col, row, fn)) if vec_left else (
                lambda row: F.zip_with(row, v.col, fn)
            )
            return SymbolicArray(F.transform(m.col, g), 2)
        # 0-d numpy array: numpy scalar-vs-object dispatch (e.g.
        # ``np.float64(0) > symb``) hands the scalar over as a 0-d
        # ndarray — unwrap it to its python scalar
        if isinstance(other, np.ndarray) and other.ndim == 0:
            other = other.item()
        # plain python scalar (bool first — it's an int subclass)
        if isinstance(other, (bool, np.bool_)):
            lit = F.lit(int(other)) if numeric else F.lit(bool(other))
        elif isinstance(other, (int, float, np.floating, np.integer)):
            lit = F.lit(float(other))
        else:
            lit = F.lit(other)
        g = (lambda x: fn(lit, x)) if reverse else (lambda x: fn(x, lit))
        return SymbolicArray(_nested_map(self.col, self.inner_ndim, g), self.inner_ndim)

    def _map(self, fn):
        return SymbolicArray(_nested_map(self.col, self.inner_ndim, fn), self.inner_ndim)

    def _matmul(self, other: Any, reverse: bool = False):
        if not isinstance(other, SymbolicArray):
            raise TraceError("matmul requires two symbolic operands")
        # numpy: dot of boolean vectors is an integer count
        a, b = (other._num(), self._num()) if reverse else (self._num(), other._num())
        an, bn = a.inner_ndim, b.inner_ndim
        if an == 1 and bn == 1:
            return SymbolicArray(_dot_fold(a.col, b.col), 0)
        if an == 2 and bn == 1:
            # (r,c) @ (c,) → (r,): per-row dot
            return SymbolicArray(
                F.transform(a.col, lambda row: _dot_fold(row, b.col)), 1
            )
        if an == 1 and bn == 2:
            # (r,) @ (r,c) → (c,): dot against each column of b
            bt = b._t_base if b._t_base is not None else _transpose2(b.col)
            return SymbolicArray(
                F.transform(bt, lambda colv: _dot_fold(a.col, colv)),
                1,
            )
        if an == 2 and bn == 2:
            # (r,k) @ (k,c): rows of a against columns of b (reuses the
            # pre-transpose column when b is itself a transpose — A @ B.T
            # then never materializes transpose(transpose(B)))
            bt = b._t_base if b._t_base is not None else _transpose2(b.col)
            return SymbolicArray(
                F.transform(
                    a.col,
                    lambda row: F.transform(bt, lambda colv: _dot_fold(row, colv)),
                ),
                2,
            )
        raise TraceError(f"matmul unsupported for ranks ({an}, {bn})")

    def _reduce(self, elem_fn, axis):
        """Reduction: elem_fn ∈ {'sum','mean','max','min','any','all',
        'countnz'}.  axis=None collapses everything; on matrices axis 0/1
        reduce columns/rows.  Boolean elements compile to count/exists/
        forall — ``np.sum(x > 0)`` becomes ``size(filter(col, x -> x))``,
        pure Catalyst (the reference batches predicate bodies the same as
        arithmetic ones, `vectorization.py:151-196`)."""
        n = self.inner_ndim
        if n == 0:
            if elem_fn in ("sum", "countnz") and self.is_bool:
                return SymbolicArray(self.col.cast("long"), 0)
            return self

        bool_in = self.is_bool
        # numpy: max/min over booleans stay boolean (≡ any/all)
        if bool_in and elem_fn == "max":
            elem_fn = "any"
        if bool_in and elem_fn == "min":
            elem_fn = "all"
        bool_out = elem_fn in ("any", "all")

        def red1(arr: Column) -> Column:
            if elem_fn == "any":
                pred = (lambda x: x) if bool_in else (lambda x: x != F.lit(0))
                return F.exists(arr, pred)
            if elem_fn == "all":
                pred = (lambda x: x) if bool_in else (lambda x: x != F.lit(0))
                return F.forall(arr, pred)
            if elem_fn == "countnz" or (elem_fn == "sum" and bool_in):
                pred = (lambda x: x) if bool_in else (lambda x: x != F.lit(0))
                return F.size(F.filter(arr, pred)).cast("long")
            if elem_fn == "mean" and bool_in:
                cnt = F.size(F.filter(arr, lambda x: x)).cast("double")
                return cnt / F.size(arr).cast("double")
            if elem_fn == "sum":
                return _fold_sum(arr)
            if elem_fn == "mean":
                return _fold_sum(arr) / F.size(arr).cast("double")
            # numpy max/min PROPAGATE NaN.  Spark ranks NaN largest, so
            # array_max already returns the NaN (correct by
            # coincidence) but array_min would skip it — guard.
            if elem_fn == "max":
                return F.array_max(arr)
            return F.when(
                F.exists(arr, lambda x: F.isnan(x.cast("double"))),
                F.lit(float("nan")),
            ).otherwise(F.array_min(arr))

        if n == 1:
            if axis not in (None, 0, -1):
                raise TraceError(f"axis {axis} out of range for rank-1 field")
            return SymbolicArray(red1(self.col), 0, is_bool=bool_out)
        # rank 2
        if axis is None:
            if elem_fn == "max" and not bool_in:
                # nested array_max — NaN-correct (Spark ranks NaN
                # largest = numpy propagation); min flattens into the
                # NaN-guarded red1 path instead
                return SymbolicArray(
                    F.array_max(F.transform(self.col, F.array_max)), 0
                )
            flat = F.flatten(self.col)
            return SymbolicArray(red1(flat), 0, is_bool=bool_out)
        if axis in (1, -1):
            return SymbolicArray(F.transform(self.col, red1), 1, is_bool=bool_out)
        if axis == 0:
            return SymbolicArray(
                F.transform(_transpose2(self.col), red1), 1, is_bool=bool_out
            )
        raise TraceError(f"axis {axis} out of range for rank-2 field")

    def astype(self, dtype) -> "SymbolicArray":
        """numpy ``.astype`` — an elementwise Catalyst cast."""
        # inside the trace window `float`/`int` resolve to the stand-in
        # classes — map them to the dtypes the real builtins mean
        if dtype is _TraceFloat:
            dtype = np.float64
        elif dtype is _TraceInt:
            dtype = np.int64
        key = np.dtype(dtype).name
        if key not in _NP_TO_SPARK:
            raise TraceError(f"astype({dtype!r}) has no Spark cast")
        t = _NP_TO_SPARK[key]
        return SymbolicArray(
            _nested_map(self.col, self.inner_ndim, lambda c: c.cast(t)),
            self.inner_ndim,
            is_bool=(t == "boolean"),
        )

    def clip(self, lo=None, hi=None) -> "SymbolicArray":
        """numpy ``clip``: ``minimum(maximum(x, lo), hi)`` — the same
        order, so ``lo > hi`` yields ``hi`` exactly like numpy.

        NaN semantics match numpy too: NaN in the VALUE or either BOUND
        propagates (``maximum``/``minimum`` propagate NaN).  Spark's
        greatest/least rank NaN largest — unguarded,
        ``least(greatest(NaN, lo), hi)`` yields ``hi``, a silent wrong
        value — so any-NaN short-circuits to NaN explicitly.  Known-
        finite literal bounds skip their probe driver-side."""

        def bound(v):
            """→ (column, may_be_nan)"""
            if isinstance(v, SymbolicArray):
                if v.inner_ndim != 0:
                    raise TraceError("clip bounds must be scalar")
                return v._num().col, True
            if isinstance(v, np.ndarray) and v.ndim == 0:
                v = v.item()
            if isinstance(v, (bool, np.bool_, int, float, np.floating, np.integer)):
                fv = float(v)
                return F.lit(fv), fv != fv
            raise TraceError(f"unsupported clip bound {v!r}")

        lo_c, lo_nan = bound(lo) if lo is not None else (None, False)
        hi_c, hi_nan = bound(hi) if hi is not None else (None, False)
        if lo_c is None and hi_c is None:
            raise TraceError("clip needs at least one bound")

        def g(c):
            cd = c.cast("double")
            nan_cond = F.isnan(cd)
            if lo_nan:
                nan_cond = nan_cond | F.isnan(lo_c.cast("double"))
            if hi_nan:
                nan_cond = nan_cond | F.isnan(hi_c.cast("double"))
            out = c
            if lo_c is not None:
                out = F.greatest(out, lo_c)
            if hi_c is not None:
                out = F.least(out, hi_c)
            return F.when(nan_cond, cd).otherwise(out)

        return self._num()._map(g)

    def argmax(self, axis=None):
        return self._arg_extreme(F.array_max, axis)

    def argmin(self, axis=None):
        return self._arg_extreme(F.array_min, axis)

    def _arg_extreme(self, f2, axis):
        """numpy argmax/argmin over a vector field: index of the FIRST
        extreme element — ``array_position`` finds the first match
        (numpy's tie rule), 1-based so minus 1.

        NaN: numpy returns the index of the FIRST NaN for both argmax
        and argmin (NaN propagates as the extreme).  For argmax Spark
        agrees by coincidence (array_max ranks NaN largest and
        ``NaN = NaN`` is true in array_position, so the first NaN is
        found); for argmin array_min would skip NaN — guard with an
        explicit first-NaN position."""
        if self.inner_ndim != 1 or axis not in (None, 0, -1):
            raise TraceError("argmax/argmin trace only on rank-1 fields")
        c = self._num().col
        pos = F.array_position(c, f2(c))
        if f2 is F.array_min:
            nan_pos = F.array_position(
                F.transform(c, lambda x: F.isnan(x.cast("double"))), F.lit(True)
            )
            pos = F.when(nan_pos > 0, nan_pos).otherwise(pos)
        return SymbolicArray((pos - F.lit(1)).cast("long"), 0)

    # numpy-style reduction methods (arr.sum() / arr.any() / ...)
    def sum(self, axis=None):
        return self._reduce("sum", axis)

    def mean(self, axis=None):
        return self._reduce("mean", axis)

    def max(self, axis=None):
        return self._reduce("max", axis)

    def min(self, axis=None):
        return self._reduce("min", axis)

    def any(self, axis=None):
        return self._reduce("any", axis)

    def all(self, axis=None):
        return self._reduce("all", axis)

    # ---- python operators ----
    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b, numeric=True)

    __radd__ = __add__

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b, numeric=True)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: a - b, reverse=True, numeric=True)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b, numeric=True)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return self._binop(o, _ieee_div, numeric=True)

    def __rtruediv__(self, o):
        return self._binop(o, _ieee_div, reverse=True, numeric=True)

    def __pow__(self, o):
        return self._binop(o, lambda a, b: F.pow(a, b), numeric=True)

    def __mod__(self, o):
        # Python % = sign-of-divisor semantics (np.mod), NOT Spark/C %
        return self._binop(o, _np_mod, numeric=True)

    def __rmod__(self, o):
        return self._binop(o, _np_mod, reverse=True, numeric=True)

    def __floordiv__(self, o):
        return self._binop(o, _np_floor_divide, numeric=True)

    def __rfloordiv__(self, o):
        return self._binop(o, _np_floor_divide, reverse=True, numeric=True)

    def __neg__(self):
        return self._num()._map(lambda c: -c)

    def __abs__(self):
        return self._num()._map(F.abs)

    def _cmp(self, o, fn, nan_result: bool = False):
        """IEEE/numpy comparison semantics: any NaN operand makes the
        comparison False (True only for ``!=``).  Spark SQL instead
        ORDERS NaN largest and makes ``NaN = NaN`` true — silent wrong
        booleans on NaN input — so guard explicitly.  The isnan probes
        constant-fold away for literal operands."""

        def guarded(a, b):
            return F.when(
                F.isnan(a.cast("double")) | F.isnan(b.cast("double")),
                F.lit(bool(nan_result)),
            ).otherwise(fn(a, b))

        r = self._binop(o, guarded)
        r.is_bool = True
        return r

    def __gt__(self, o):
        return self._cmp(o, lambda a, b: a > b)

    def __ge__(self, o):
        return self._cmp(o, lambda a, b: a >= b)

    def __lt__(self, o):
        return self._cmp(o, lambda a, b: a < b)

    def __le__(self, o):
        return self._cmp(o, lambda a, b: a <= b)

    def __eq__(self, o):  # noqa: D105 — numpy semantics: elementwise
        return self._cmp(o, lambda a, b: a == b)

    def __ne__(self, o):
        return self._cmp(o, lambda a, b: a != b, nan_result=True)

    # __eq__ above would otherwise drop default hashability (the tracer
    # itself stores SymbolicArrays in containers)
    __hash__ = object.__hash__

    def _logical(self, o, fn, reverse: bool = False):
        if isinstance(o, np.ndarray) and o.ndim == 0 and o.dtype.kind == "b":
            o = bool(o)
        if isinstance(o, SymbolicArray):
            if not (self.is_bool and o.is_bool):
                raise TraceError("&/|/^ trace only between boolean arrays")
        elif not isinstance(o, (bool, np.bool_)):
            raise TraceError("&/|/^ trace only against booleans")
        r = self._binop(bool(o) if not isinstance(o, SymbolicArray) else o, fn, reverse)
        r.is_bool = True
        return r

    def __and__(self, o):
        return self._logical(o, lambda a, b: a & b)

    __rand__ = __and__

    def __or__(self, o):
        return self._logical(o, lambda a, b: a | b)

    __ror__ = __or__

    def __xor__(self, o):
        return self._logical(o, lambda a, b: a != b)

    __rxor__ = __xor__

    def __invert__(self):
        if not self.is_bool:
            raise TraceError("~ traces only on boolean arrays")
        r = self._map(lambda c: ~c)
        r.is_bool = True
        return r

    def __matmul__(self, o):
        return self._matmul(o)

    def __rmatmul__(self, o):
        return self._matmul(o, reverse=True)

    @property
    def T(self):
        if self.inner_ndim < 2:
            return self  # numpy: transpose of scalar/1-d is itself
        if self._t_base is not None:
            return SymbolicArray(self._t_base, 2, t_base=self.col)
        return SymbolicArray(_transpose2(self.col), 2, t_base=self.col)

    @staticmethod
    def _element(col, i: int):
        """numpy-style int index over an array column.  ``F.get`` is
        0-based but returns NULL for negative indices, so negative
        numpy indices translate to ``element_at`` (1-based, where -1 is
        the last element — exactly numpy's convention)."""
        i = int(i)
        return F.get(col, i) if i >= 0 else F.element_at(col, i)

    def __getitem__(self, idx):
        if isinstance(idx, tuple) and len(idx) == 2 and self.inner_ndim == 2:
            i, j = idx
            if isinstance(i, (int, np.integer)) and isinstance(j, (int, np.integer)):
                return SymbolicArray(self._element(self._element(self.col, i), j), 0)
            raise TraceError("only int,int matrix indexing traces")
        if isinstance(idx, (int, np.integer)) and self.inner_ndim >= 1:
            return SymbolicArray(self._element(self.col, idx), self.inner_ndim - 1)
        raise TraceError(f"unsupported symbolic index {idx!r}")

    # ---- numpy protocols ----
    _UFUNC_MAP = {
        np.add: lambda a, b: a + b,
        np.subtract: lambda a, b: a - b,
        np.multiply: lambda a, b: a * b,
        np.true_divide: _ieee_div,
        np.power: lambda a, b: F.pow(a, b),
        # wrapped in a 2-arg lambda: zip_with inspects its lambda's
        # signature and rejects the (*cols) varargs of greatest/least.
        # greatest is numpy-correct on NaN as-is (Spark ranks NaN
        # largest, so greatest(NaN, x) = NaN = numpy maximum); least
        # is NOT (least(NaN, x) = x) — hence the guarded _nan_minimum.
        np.maximum: lambda a, b: F.greatest(a, b),
        np.minimum: _nan_minimum,
        # transcendental binaries: JVM Math.* is within ~2 ulp of the
        # platform libm numpy links (probed round 8 over an 11k-value
        # corpus incl. specials); IEEE special-value placement agrees
        # bitwise.  The tier-2 Arrow path stays available for callers
        # needing numpy-bit-identical results.
        np.arctan2: lambda a, b: F.atan2(a, b),
        np.hypot: lambda a, b: F.hypot(a, b),
        # round 9: NaN-ignoring extrema + the modulo/floordiv family
        # (np.remainder IS np.mod — same ufunc object)
        np.fmin: lambda a, b: F.least(a, b),  # least(NaN,x)=x = fmin
        np.fmax: _nan_fmax,
        np.fmod: _ieee_fmod,
        np.mod: _np_mod,
        np.floor_divide: _np_floor_divide,
    }
    # comparison/logical ufuncs dispatch to the dunders so is_bool
    # propagates (np.greater(a, b) ≡ a > b)
    _CMP_UFUNCS = {
        np.greater: "__gt__",
        np.greater_equal: "__ge__",
        np.less: "__lt__",
        np.less_equal: "__le__",
        np.equal: "__eq__",
        np.not_equal: "__ne__",
        np.logical_and: "__and__",
        np.logical_or: "__or__",
        np.bitwise_and: "__and__",
        np.bitwise_or: "__or__",
        np.logical_xor: "__xor__",
        np.bitwise_xor: "__xor__",
    }
    _CMP_REVERSE = {
        "__gt__": "__lt__", "__lt__": "__gt__",
        "__ge__": "__le__", "__le__": "__ge__",
        "__eq__": "__eq__", "__ne__": "__ne__",
        "__and__": "__and__", "__or__": "__or__", "__xor__": "__xor__",
    }
    _UNARY_MAP = {
        np.negative: lambda c: -c,
        np.absolute: F.abs,
        np.sqrt: F.sqrt,  # correctly rounded by IEEE — bit-exact vs numpy
        np.exp: F.exp,
        np.log: _ieee_log(F.log, 0.0),
        np.tanh: F.tanh,
        # transcendentals trace tier-1 to the 1:1 Catalyst functions.
        # Exactness contract (probed round 8, 11k-value corpus incl.
        # specials): JVM Math.* agrees with numpy's platform libm to
        # ≤3 ulp (most ≤2; sqrt/radians/degrees bit-exact) and on every
        # IEEE special — with the log-family boundary guarded
        # (_ieee_log: Spark returns NULL where numpy says -inf/NaN).
        # Callers needing numpy-bit-identical transcendentals use the
        # tier-2 Arrow path (which IS numpy).
        np.sin: F.sin,
        np.cos: F.cos,
        np.tan: F.tan,
        np.arcsin: F.asin,
        np.arccos: F.acos,
        np.arctan: F.atan,
        np.sinh: F.sinh,
        np.cosh: F.cosh,
        np.log10: _ieee_log(F.log10, 0.0),
        np.log2: _ieee_log(F.log2, 0.0),
        np.log1p: _ieee_log(F.log1p, -1.0),
        np.expm1: F.expm1,
        np.cbrt: F.cbrt,
        # inverse hyperbolics (round 9): asinh/acosh need the fdlibm
        # branch structure — Spark's naive log-forms lose precision
        # near their domain edges (see _asinh_acc/_acosh_acc); raw
        # atanh probed ≤1 ulp everywhere incl. 1e-300 and ±1 → ±inf.
        np.arcsinh: _asinh_acc,
        np.arccosh: _acosh_acc,
        np.arctanh: F.atanh,
        np.square: lambda c: c * c,  # bit-exact
        np.positive: lambda c: c,
        np.reciprocal: lambda c: _ieee_div(F.lit(1.0), c),
        np.exp2: lambda c: F.pow(F.lit(2.0), c),  # probed ≤1 ulp
        # trunc = round toward zero; NaN takes the floor branch
        # (NaN < 0 is false) where _nan_int_round passes it through
        np.trunc: lambda c: F.when(
            c < 0, _nan_int_round(c, F.ceil)
        ).otherwise(_nan_int_round(c, F.floor)),
        np.radians: F.radians,  # x * (pi/180) — bit-exact vs numpy
        np.degrees: F.degrees,  # x * (180/pi) — bit-exact vs numpy
        # alias ufuncs are DISTINCT objects in numpy (deg2rad is not
        # radians) — without their own entries they'd fall to tier 2
        np.deg2rad: F.radians,
        np.rad2deg: F.degrees,
        np.fabs: F.abs,
        np.sign: F.signum,  # signum(NaN) = NaN — numpy-correct as-is
        # Spark floor/ceil return BIGINT (NaN→0, ±inf/huge→Long bounds)
        # — the guard keeps float64 semantics: NaN/±inf/|x|≥2⁶³ pass
        # through (probed this round: floor(NaN)=0, floor(1e300)=2⁶³-1)
        np.floor: lambda c: _nan_int_round(c, F.floor),
        np.ceil: lambda c: _nan_int_round(c, F.ceil),
        # rint rounds half-to-even — Spark's bround, NOT round (half-up);
        # bround(NaN)=NaN, bround(inf)=inf — numpy-correct as-is
        np.rint: lambda c: F.bround(c, 0),
    }

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out"):
            raise TraceError(f"unsupported ufunc call {ufunc}")
        if ufunc is np.matmul and len(inputs) == 2:
            a, b = inputs
            if a is self:
                return self._matmul(b)
            return self._matmul(a, reverse=True)
        if ufunc in (np.logical_not, np.invert) and len(inputs) == 1:
            return self.__invert__()
        if ufunc in self._UNARY_MAP and len(inputs) == 1:
            return self._num()._map(self._UNARY_MAP[ufunc])
        if ufunc in self._CMP_UFUNCS and len(inputs) == 2:
            a, b = inputs
            name = self._CMP_UFUNCS[ufunc]
            if a is self:
                return getattr(self, name)(b)
            return getattr(self, self._CMP_REVERSE[name])(a)
        if ufunc in self._UFUNC_MAP and len(inputs) == 2:
            a, b = inputs
            if a is self:
                return self._binop(b, self._UFUNC_MAP[ufunc], numeric=True)
            return self._binop(a, self._UFUNC_MAP[ufunc], reverse=True, numeric=True)
        raise TraceError(f"unsupported ufunc {ufunc}")

    _REDUCTIONS = {np.sum: "sum", np.mean: "mean", np.max: "max", np.amax: "max",
                   np.min: "min", np.amin: "min", np.any: "any", np.all: "all",
                   np.count_nonzero: "countnz"}

    @staticmethod
    def _where(cond: "SymbolicArray", a, b) -> "SymbolicArray":
        """``np.where(cond, a, b)`` → ``when(c, a).otherwise(b)``
        elementwise.  cond must be a traced boolean; each branch is a
        same-rank SymbolicArray or a scalar (symbolic or literal).
        Rank ≤ 1 (vector conds zip with vector/scalar branches)."""
        # a constant-folded condition (comparison of two literals in
        # the body) arrives as a plain numpy bool — lift it to a
        # literal boolean column (numpy accepts scalar conds)
        if isinstance(cond, np.ndarray) and cond.ndim == 0:
            cond = cond.item()
        if isinstance(cond, (bool, np.bool_)):
            cond = SymbolicArray(F.lit(bool(cond)), 0, is_bool=True)
        if not isinstance(cond, SymbolicArray) or not cond.is_bool:
            raise TraceError("np.where condition must be a traced boolean")
        r = cond.inner_ndim
        if r > 1:
            raise TraceError("np.where traces only rank <= 1 conditions")

        def branch(v, numeric):
            """→ (col_or_lit, is_vector); ``numeric`` coerces booleans
            to 0/1 (numpy upcasting when the OTHER branch is numeric)"""
            if isinstance(v, SymbolicArray):
                if numeric:
                    v = v._num()
                if v.inner_ndim == r and r > 0:
                    return v.col, True
                if v.inner_ndim == 0:
                    return v.col, False
                raise TraceError("np.where branch rank mismatch")
            if isinstance(v, np.ndarray) and v.ndim == 0:
                v = v.item()
            if isinstance(v, (bool, np.bool_)) and not numeric:
                return F.lit(bool(v)), False
            if isinstance(v, (bool, np.bool_, int, float, np.floating, np.integer)):
                return F.lit(float(v)), False
            raise TraceError(f"unsupported np.where branch {v!r}")

        def is_boolish(v):
            if isinstance(v, SymbolicArray):
                return v.is_bool
            if isinstance(v, np.ndarray) and v.ndim == 0:
                v = v.item()
            return isinstance(v, (bool, np.bool_))

        # numpy dtype rule: bool result only when BOTH branches are bool
        both_bool = is_boolish(a) and is_boolish(b)
        ac, avec = branch(a, numeric=not both_bool)
        bc, bvec = branch(b, numeric=not both_bool)
        if r == 0:
            return SymbolicArray(
                F.when(cond.col, ac).otherwise(bc), 0, is_bool=both_bool
            )
        if avec and bvec:
            paired = F.zip_with(ac, bc, lambda x, y: F.struct(x.alias("a"), y.alias("b")))
            out = F.zip_with(
                cond.col, paired, lambda c, s: F.when(c, s["a"]).otherwise(s["b"])
            )
        elif avec:
            out = F.zip_with(cond.col, ac, lambda c, x: F.when(c, x).otherwise(bc))
        elif bvec:
            out = F.zip_with(cond.col, bc, lambda c, y: F.when(c, ac).otherwise(y))
        else:
            out = F.transform(cond.col, lambda c: F.when(c, ac).otherwise(bc))
        return SymbolicArray(out, 1, is_bool=both_bool)

    def __array_function__(self, func, types, args, kwargs):
        if func is np.where and len(args) == 3 and not kwargs:
            return SymbolicArray._where(*args)
        if func is np.clip and len(args) >= 1 and isinstance(args[0], SymbolicArray):
            lo = args[1] if len(args) > 1 else kwargs.pop("a_min", None)
            hi = args[2] if len(args) > 2 else kwargs.pop("a_max", None)
            return args[0].clip(lo, hi)
        if func in (np.round, np.around) and args and isinstance(args[0], SymbolicArray):
            dec = kwargs.pop("decimals", args[1] if len(args) > 1 else 0)
            if dec != 0 or kwargs:
                # binary-double rounding at decimals>0 differs subtly
                # between engines — refuse rather than near-miss
                raise TraceError("np.round traces only with decimals=0")
            return args[0]._num()._map(lambda c: F.bround(c, 0))
        if func in (np.argmax, np.argmin) and args and isinstance(args[0], SymbolicArray):
            axis = kwargs.pop("axis", args[1] if len(args) > 1 else None)
            if kwargs:
                raise TraceError(f"unsupported argmax/argmin kwargs {kwargs}")
            f2 = F.array_max if func is np.argmax else F.array_min
            return args[0]._arg_extreme(f2, axis)
        if func in (np.dot, np.matmul) and len(args) == 2:
            a, b = args
            if isinstance(a, SymbolicArray):
                return a._matmul(b)
            if isinstance(b, SymbolicArray):
                return b._matmul(a, reverse=True)
            raise TraceError("np.dot needs a symbolic operand")
        if func in self._REDUCTIONS and args and isinstance(args[0], SymbolicArray):
            axis = kwargs.pop("axis", args[1] if len(args) > 1 else None)
            if kwargs.pop("keepdims", False) or kwargs:
                raise TraceError(f"unsupported reduction kwargs for {func}")
            return args[0]._reduce(self._REDUCTIONS[func], axis)
        if func is np.transpose and args and isinstance(args[0], SymbolicArray):
            if len(args) > 1 or kwargs.get("axes"):
                raise TraceError("np.transpose axes= not supported")
            return args[0].T
        if func is np.linalg.norm and len(args) == 1 and isinstance(args[0], SymbolicArray):
            s = args[0]
            if s.inner_ndim == 1:
                return SymbolicArray(F.sqrt(_dot_fold(s.col, s.col)), 0)
        raise TraceError(f"unsupported numpy function {func}")

    def __array__(self, *a, **k):
        # np.asarray would force materialization — refuse so the
        # decorator falls back to tier-2
        raise TraceError("cannot materialize a SymbolicArray (use tier-2)")

    def __iter__(self):
        raise TraceError("cannot iterate a SymbolicArray (use tier-2)")

    def __float__(self):
        raise TraceError("cannot coerce a SymbolicArray to float (use tier-2)")

    def __int__(self):
        raise TraceError("cannot coerce a SymbolicArray to int (use tier-2)")

    def __len__(self):
        raise TraceError("cannot take len() of a SymbolicArray (use tier-2)")

    def __bool__(self):
        # without this a SymbolicArray is always truthy, so a data-
        # dependent branch (`if self.x > 0:`) would trace one arm and
        # produce silently wrong results instead of falling back
        raise TraceError(
            "data-dependent branch on a SymbolicArray (use tier-2)"
        )
