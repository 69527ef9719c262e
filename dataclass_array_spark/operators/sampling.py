"""Deterministic sampling & splitting for training-data pipelines.

A 100 TB corpus can't be split with ``rand()`` — re-runs must land every
row in the same split (reproducibility, incremental re-processing, and
leak-free train/test boundaries across pipeline versions).  Everything
here derives from an md5 hash of a stable key, the only hash portable
across Spark / DuckDB / Python (see workload oracle parity):

- :func:`hash_bucket` — uniform integer bucket in [0, 10^6).
- :func:`hash_split` — named train/val/test assignment by cumulative
  weight boundaries on that bucket.
- :func:`stratified_sample` — per-stratum keep-fractions via the same
  bucket threshold; deterministic analog of ``DataFrame.sampleBy``.

All are pure column expressions: no shuffle, no UDF, fully pushdown-
transparent — the split column costs one md5 per row in-scan.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000  # bucket space; weights quantized to parts-per-million


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, PPM): first 15 hex digits of
    md5(salt || key) mod PPM.  15 hex digits fit a long exactly
    (DuckDB: ``CAST('0x'||substr(md5(..),1,15) AS BIGINT) % 1000000``)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % PPM).alias("bucket")


def sql_hash_bucket(key_expr: str, salt: str = "") -> str:
    """DuckDB expression computing the identical bucket."""
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST(({key_expr}) AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {PPM}"
    )


def _boundaries(weights: Dict[str, float]) -> Sequence[Tuple[str, int]]:
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out = []
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        out.append((name, min(PPM, round(acc * PPM))))
    out[-1] = (out[-1][0], PPM)  # close the last interval exactly
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash of ``key_col``.

    Weights are normalized and quantized to ppm, so e.g.
    ``{"train": 0.9, "val": 0.05, "test": 0.05}`` puts buckets
    [0, 900000) → train, [900000, 950000) → val, rest → test.  Keying on
    a *document* id (not a row id) keeps all shards/chunks of one
    document in one split — the standard leakage guard.
    """
    b = hash_bucket(F.col(key_col), salt)
    expr: Column | None = None
    for name, hi in _boundaries(weights)[:-1]:
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = list(weights)[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def sql_hash_split(key_expr: str, weights: Dict[str, float], salt: str = "split") -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`."""
    b = sql_hash_bucket(key_expr, salt)
    parts = [f"CASE"]
    for name, hi in _boundaries(weights)[:-1]:
        parts.append(f"WHEN ({b}) < {hi} THEN '{name}'")
    parts.append(f"ELSE '{list(weights)[-1]}' END")
    return " ".join(parts)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: Dict[str, float],
    key_col: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's
    fraction — a deterministic, re-run-stable ``sampleBy``.  Strata not
    listed keep ``default_fraction``.  One md5 per row, no shuffle; the
    filter pushes into the scan."""
    b = hash_bucket(F.col(key_col), salt)
    thr: Column | None = None
    for stratum, frac in fractions.items():
        cond = F.col(stratum_col) == stratum
        lim = F.lit(int(round(frac * PPM)))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    thr = (
        F.lit(int(round(default_fraction * PPM)))
        if thr is None
        else thr.otherwise(int(round(default_fraction * PPM)))
    )
    return df.filter(b < thr)


def sql_stratified_sample_pred(
    stratum_expr: str,
    fractions: Dict[str, float],
    key_expr: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB predicate mirroring :func:`stratified_sample`."""
    b = sql_hash_bucket(key_expr, salt)
    cases = ["CASE"]
    for stratum, frac in fractions.items():
        cases.append(f"WHEN ({stratum_expr}) = '{stratum}' THEN {int(round(frac * PPM))}")
    cases.append(f"ELSE {int(round(default_fraction * PPM))} END")
    return f"({b}) < ({' '.join(cases)})"


def temperature_mixture_rates(
    df: DataFrame,
    domain_col: str,
    target_rows: float,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-domain sampling rates for temperature-weighted mixing.

    The standard pre-training recipe (GPT-3 / PaLM style): domain d with
    n_d rows gets probability p_d = n_d^alpha / sum(n^alpha), flattening
    the natural distribution toward uniform as alpha -> 0, and the
    per-row keep-rate is ``min(1, target_rows * p_d / n_d)``.

    Returns ``(domain, n_docs, rate)`` — one row per domain (driver-tiny;
    broadcast it into :func:`temperature_sample`).  alpha=0.5 uses
    ``sqrt`` (IEEE correctly-rounded, so the DuckDB oracle reproduces it
    bit-for-bit) and alpha=1.0 is the identity; EVERY OTHER alpha now
    computes ``n^alpha = exp_exact(alpha * ln_exact(n))`` — the
    fixed-order series pair, bit-portable across engines (round 13;
    previously these went through libm ``pow``, whose last-ulp behavior
    is implementation-specific, and were documented gate-unsafe).
    Domain: each weight ``n^alpha`` must fit the exact
    ``decimal(38,6)`` accumulator, i.e. ``n^alpha < 10^32``
    (``alpha * ln(n) <= 32*ln10 ~= 73.7`` — alpha=2 up to ~10^16 rows
    per domain; ``exp_exact``'s own 2^124 ceiling is wider and never
    binds first).  Out-of-domain fails LOUDLY on BOTH engines: Spark
    guards the decimal cast with ``assert_true`` (round 14 — Spark's
    non-ANSI cast would otherwise overflow to NULL and ``F.sum`` would
    silently skip the weight, inflating every other domain's rate,
    while DuckDB raised on the same cast — a silent cross-engine
    divergence), DuckDB raises natively.  The weight total is an exact
    decimal sum, so the 20-way addition is order-independent.
    """
    from dataclass_array_spark.operators.text import exp_exact, ln_exact

    cnt = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    if alpha == 0.5:
        wt = F.sqrt(F.col("n_docs").cast("double"))
    elif alpha == 1.0:
        wt = F.col("n_docs").cast("double")
    else:
        wt = exp_exact(F.lit(float(alpha)) * ln_exact(F.col("n_docs")))
    w = cnt.withColumn("wt", wt)
    # Guarded exact accumulator: decimal(38,6) holds weights < 10^32;
    # a larger weight must raise, never silently become NULL-and-skipped.
    wt_ok = F.col("wt") < F.lit(1.0e32)
    wt_dec = F.when(wt_ok, F.col("wt").cast("decimal(38,6)")).otherwise(
        F.assert_true(
            wt_ok,
            F.lit("temperature_mixture_rates: weight exceeds decimal(38,6)"),
        ).cast("decimal(38,6)")
    )
    # ... and guard the SUM itself: individually-legal weights can
    # still overflow the decimal(38,6) TOTAL, which Spark's non-ANSI
    # Sum silently NULLs (every rate would go NULL) while DuckDB
    # raises (round-14 review).  An empty input legitimately sums to
    # NULL — only a non-empty NULL total is an overflow.
    ssum = F.sum(wt_dec)
    sok = (F.count("*") == 0) | ssum.isNotNull()
    tot = w.agg(
        F.when(sok, ssum)
        .otherwise(
            F.assert_true(
                sok,
                F.lit("temperature_mixture_rates: weight TOTAL exceeds "
                      "decimal(38,6)"),
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("tot")
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_rows)) * (F.col("wt") / F.col("tot")) / F.col("n_docs"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        domain_col, "n_docs", rate.alias("rate")
    )


def temperature_sample(
    df: DataFrame,
    rates: DataFrame,
    domain_col: str,
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Keep each row iff its hash bucket clears its domain's quantized
    rate.  The rates frame is broadcast (one row per domain), so the
    corpus side samples map-side with no shuffle."""
    b = hash_bucket(F.col(key_col), salt)
    thr = F.floor(F.col("rate") * PPM).cast("long")
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(b < thr)
        .withColumn("rate_ppm", thr)
    )


def sql_temperature_sample(
    table: str,
    domain_col: str,
    key_col: str,
    target_rows: float,
    salt: str = "mix",
) -> str:
    """DuckDB CTE prefix + predicate mirroring rates (alpha=0.5) and
    selection; yields rows ``(key, domain, rate_ppm)``."""
    b = sql_hash_bucket(f"d.{key_col}", salt)
    return f"""
WITH cnt AS (SELECT {domain_col}, COUNT(*) AS n_docs FROM {table} GROUP BY {domain_col}),
w AS (SELECT {domain_col}, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS wt FROM cnt),
tot AS (SELECT CAST(SUM(CAST(wt AS DECIMAL(38,6))) AS DOUBLE) AS tot FROM w),
r AS (SELECT {domain_col}, n_docs,
        least(1.0, {float(target_rows)} * (wt / tot) / n_docs) AS rate FROM w, tot)
SELECT d.{key_col}, d.{domain_col},
       CAST(FLOOR(rate * {PPM}) AS BIGINT) AS rate_ppm
FROM {table} d JOIN r USING ({domain_col})
WHERE ({b}) < CAST(FLOOR(rate * {PPM}) AS BIGINT)
ORDER BY d.{key_col}
"""


def sql_temperature_sample_alpha(
    table: str,
    domain_col: str,
    key_col: str,
    target_rows: float,
    alpha: float,
    salt: str = "mix",
) -> str:
    """DuckDB mirror of :func:`temperature_mixture_rates` +
    :func:`temperature_sample` for an ARBITRARY alpha — weights via the
    fixed-order ``exp_exact(alpha * ln_exact(n))`` CTE chains, so any
    temperature is gate-exact.  alpha 0.5 / 1.0 are REJECTED here: the
    Spark side computes those via IEEE sqrt / identity (different op
    sequence than the series pair) — use :func:`sql_temperature_sample`
    for alpha=0.5.  The alpha literal is emitted as
    ``CAST('<repr>' AS DOUBLE)`` so DuckDB routes it through strtod's
    correct rounding (a bare 17-digit decimal literal would parse as
    DECIMAL and double-round)."""
    if alpha in (0.5, 1.0):
        raise ValueError(
            "sql_temperature_sample_alpha: alpha=0.5/1.0 use sqrt/identity "
            "on the Spark side — mirror with sql_temperature_sample instead"
        )
    from dataclass_array_spark.operators.text import (
        sql_exp_exact_ctes,
        sql_ln_exact_ctes,
    )

    b = sql_hash_bucket(f"d.{key_col}", salt)
    return f"""
WITH cnt AS (SELECT {domain_col}, COUNT(*) AS n_docs FROM {table} GROUP BY {domain_col}),
{sql_ln_exact_ctes("cnt", f"{domain_col}, n_docs", "n_docs", "lnc")},
wx AS (SELECT {domain_col}, n_docs, CAST('{float(alpha)!r}' AS DOUBLE) * ln AS x FROM lnc),
{sql_exp_exact_ctes("wx", f"{domain_col}, n_docs", "x", "expw")},
w AS (SELECT {domain_col}, n_docs, ex AS wt FROM expw),
tot AS (SELECT CAST(SUM(CAST(wt AS DECIMAL(38,6))) AS DOUBLE) AS tot FROM w),
r AS (SELECT {domain_col}, n_docs,
        least(1.0, {float(target_rows)} * (wt / tot) / n_docs) AS rate FROM w, tot)
SELECT d.{key_col}, d.{domain_col},
       CAST(FLOOR(rate * {PPM}) AS BIGINT) AS rate_ppm
FROM {table} d JOIN r USING ({domain_col})
WHERE ({b}) < CAST(FLOOR(rate * {PPM}) AS BIGINT)
ORDER BY d.{key_col}
"""


def budget_select(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score: Column,
    n_tokens: Column,
    budget: int,
) -> DataFrame:
    """Quality-ranked selection under a per-group token budget — the
    data-curation step that picks each domain's best documents until
    the domain's token allowance is spent (mixture weights × token
    budgets is how pre-training corpora are actually assembled).

    Per group: rank by ``(score DESC, id)`` (fully tie-broken), take
    the running token sum, keep every document whose INCLUSIVE
    cumulative count fits ``budget``.  Returns
    ``(id, group, n_tokens, cum_tokens)`` for the kept set.

    Scale shape: one hash shuffle on the group key and one windowed
    running sum per group — no global sort, no driver materialization;
    groups are processed independently, so skewed domains parallelize
    across their own partitions' window frames only as far as the
    group's size (the same bound any per-domain budget semantics
    implies).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        F.col(group_col),
        score.alias("__score"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("__score"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, group_col, "n_tokens", "cum_tokens")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    n: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): every row gets the key
    ``ln(u_i) / w_i`` with ``u_i`` a deterministic md5-uniform in
    (0, 1]; the ``n`` LARGEST keys are exactly a weighted sample
    without replacement.  Heavier rows draw keys nearer 0 and win more
    often; the same ``(id, salt)`` always draws the same u, so the
    sample is reproducible AND oracle-replayable (``ln`` is the
    engine-portable ``text.ln_exact`` fixed-order series, not libm).

    Returns ``(id, w, key_e9)`` of the selected rows.  Rows with
    non-positive weight are excluded (zero-weight rows must never be
    sampled; the filter is mirrored in the oracle).

    Scale shape: key assignment is in-scan; selection is one global
    top-n — ``TakeOrderedAndProject`` (map-side bounded heaps, single
    reduce), no full sort.  This is the primitive behind
    mixture-weighted corpus subsampling when the PER-ROW weight
    matters (temperature mixtures reweight whole domains;
    ``budget_select`` ranks by quality — this samples proportionally).
    """
    from dataclass_array_spark.operators.text import LN2_DOUBLE, ln_exact

    w = weight.cast("double")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + 1
    )  # 60-bit uniform in [1, 2^60]: u = h / 2^60 in (0, 1]
    ln_u60 = 60.0 * LN2_DOUBLE  # ln(2^60), one python-double product
    key = (ln_exact(h) - F.lit(ln_u60)) / w
    return (
        df.select(F.col(id_col), w.alias("w"), key.alias("__key"))
        .filter(F.col("w") > 0)
        .orderBy(F.desc("__key"), F.col(id_col))
        .limit(int(n))
        .select(
            id_col,
            "w",
            F.floor(F.col("__key") * 1e9).cast("long").alias("key_e9"),
        )
    )


def weighted_sample_sql(
    table: str, id_col: str, weight_expr: str, n: int, salt: str = "ws"
) -> str:
    """DuckDB oracle for :func:`weighted_sample` (same md5-uniform,
    same ln series, same tie-break)."""
    from dataclass_array_spark.operators.text import LN2_DOUBLE, sql_ln_exact_ctes

    ln_ctes = sql_ln_exact_ctes("src", id_col, "h", "lnt")
    # DuckDB parses decimal-point literals as DECIMAL (whose arithmetic
    # overflows and differs from doubles) — string-cast the constant
    ln_u60 = f"CAST('{60.0 * LN2_DOUBLE!r}' AS DOUBLE)"
    return f"""
WITH src AS (
  SELECT {id_col}, CAST({weight_expr} AS DOUBLE) AS w,
         CAST('0x' || substr(md5('{salt}|' || CAST({id_col} AS VARCHAR)), 1, 15)
              AS BIGINT) + 1 AS h
  FROM {table}
  WHERE CAST({weight_expr} AS DOUBLE) > 0
),
{ln_ctes}
SELECT s.{id_col}, s.w,
       CAST(FLOOR(((lnt.ln - {ln_u60}) / s.w) * 1e9) AS BIGINT)
         AS key_e9
FROM src s JOIN lnt ON lnt.{id_col} = s.{id_col}
ORDER BY (lnt.ln - {ln_u60}) / s.w DESC, s.{id_col}
LIMIT {int(n)}"""


def nucleus_select(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score: Column,
    p_num: int,
    p_den: int,
) -> DataFrame:
    """Top-p ("nucleus") selection per group: rank rows by
    ``(score DESC, id)`` and keep the head whose INCLUSIVE cumulative
    score mass stays within ``p_num/p_den`` of the group's total —
    the relative-mass counterpart of :func:`budget_select`'s absolute
    token budget (keep the best 80% of quality MASS per domain, however
    large the domain is).

    Exactness: scores are decimal-cast once; the cumulative and total
    sums are DECIMAL, and the mass test is the cross-multiplied
    ``cum · p_den ≤ total · p_num`` — integer×decimal arithmetic, NO
    doubles anywhere, so the kept set is bit-free exact cross-engine.

    Scale shape: one hash shuffle on the group key, two window passes
    over it (running sum + group total) — no global sort.

    Returns ``(id, group, cum_e6)`` with ``cum_e6`` the exact
    decimal cumulative mass scaled by 10^6.
    """
    from pyspark.sql import Window

    dec = "decimal(25,6)"
    base = df.select(
        F.col(id_col), F.col(group_col), score.cast(dec).alias("__s")
    )
    wrank = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("__s"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    return (
        base.withColumn("__cum", F.sum("__s").over(wrank))
        .withColumn("__tot", F.sum("__s").over(wall))
        .filter(
            F.col("__cum") * F.lit(int(p_den))
            <= F.col("__tot") * F.lit(int(p_num))
        )
        .select(
            id_col,
            group_col,
            (F.col("__cum") * 1000000).cast("long").alias("cum_e6"),
        )
    )


def nucleus_select_sql(
    table: str,
    id_col: str,
    group_col: str,
    score_expr: str,
    p_num: int,
    p_den: int,
) -> str:
    """DuckDB oracle for :func:`nucleus_select` (same decimal sums,
    same cross-multiplied mass test)."""
    return f"""
WITH t AS (
  SELECT {id_col}, {group_col},
         CAST({score_expr} AS DECIMAL(25,6)) AS s
  FROM {table}
), r AS (
  SELECT {id_col}, {group_col},
         SUM(s) OVER (PARTITION BY {group_col} ORDER BY s DESC, {id_col}
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(s) OVER (PARTITION BY {group_col}) AS tot
  FROM t
)
SELECT {id_col}, {group_col}, CAST(cum * 1000000 AS BIGINT) AS cum_e6
FROM r WHERE cum * {int(p_den)} <= tot * {int(p_num)}
ORDER BY {id_col}"""


def cap_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    cap: int,
    id_cols: Sequence[str],
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per key — the crawl pipeline's
    PER-DOMAIN QUOTA (every production crawl caps documents per
    registrable domain so megasites don't dominate the corpus; see
    e.g. the C4/Gopher per-domain budgets).  Deterministic: surviving
    rows are the ``cap`` smallest under ``md5(salt | id)`` — an
    unbiased, re-run-stable uniform choice per key (the
    :func:`hash_bucket` discipline), with ``id_cols`` (a unique key)
    as the final tie-break so the order is total.  ``id_cols`` values
    must be NON-NULL, and the requirement is ENFORCED loudly on both
    engines (round 14 — Spark ``assert_true`` per id col, DuckDB
    ``error()`` in the mirror): Spark's concat_ws skips NULLs while
    the SQL mirror's ``||`` propagates them, so an unguarded NULL id
    would rank DIFFERENT survivors per engine — a silently
    non-reproducible sample; composite ids containing ``'|'`` alias identically in
    both engines (('a|b','c') hashes like ('a','b|c')) — harmless for
    determinism, but use a delimiter-free unique key for strict
    uniformity.

    Plan shape (100 TB): one hash-partition-by-key window.  The key is
    high-cardinality by use case (domains, hosts), so per-group state
    is tiny and parallelism is full; Spark's WindowGroupLimit pushes
    the ``rank <= cap`` filter below the shuffle (partial per-task
    top-cap before the exchange — plan-asserted in tests), so the
    shuffle carries at most ``cap`` rows per (task, key), not the full
    corpus.  For LOW-cardinality keys use ``operators.rank.grouped_rank``
    + a filter instead (the single-task-per-group sort caveat there).
    """
    if cap < 1:
        raise ValueError("cap_per_key: cap must be >= 1")
    from pyspark.sql import Window

    def _nn(c: str):  # non-NULL id contract, loudly enforced
        s = F.col(c).cast("string")
        ok = s.isNotNull()
        return F.when(ok, s).otherwise(
            F.assert_true(
                ok, F.lit(f"cap_per_key: NULL in id_cols ({c})")
            ).cast("string")
        )

    pri = F.md5(F.concat_ws("|", F.lit(salt), *[_nn(c) for c in id_cols]))
    w = Window.partitionBy(*key_cols).orderBy(
        pri, *[F.col(c) for c in id_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def sql_cap_per_key_pred(
    key_cols: Sequence[str],
    cap: int,
    id_cols: Sequence[str],
    salt: str = "cap",
) -> str:
    """DuckDB QUALIFY predicate mirroring :func:`cap_per_key` (same
    md5 priority, same tie-break, same loud non-NULL id enforcement —
    ``error()`` here mirrors the Spark side's ``assert_true``)."""
    id_cat = " || '|' || ".join(
        f"CASE WHEN {c} IS NULL THEN error('cap_per_key: NULL in id_cols "
        f"({c})') ELSE CAST({c} AS VARCHAR) END"
        for c in id_cols
    )
    order = ", ".join([f"md5('{salt}|' || {id_cat})", *id_cols])
    keys = ", ".join(key_cols)
    return (
        f"ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY {order}) <= {int(cap)}"
    )
