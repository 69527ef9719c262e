"""Exact binary-classification metrics — the EVALUATE step of the
quality-filter loop (train ``classifier.classifier_fit`` → score
``classifier.classifier_score`` → evaluate here).

AUC is the Mann-Whitney rank statistic: AUC = P(score⁺ > score⁻) +
½·P(score⁺ = score⁻).  That is a RATIO OF INTEGERS —
``2U = Σ_g p_g·(2·cumneg_before(g) + n_g)`` over the distinct-score
groups g in ascending score order, AUC = 2U / (2·P·N) — so the house
exact-integer discipline applies with no ranking of individual rows
at all:

* one hash aggregation to per-DISTINCT-SCORE (p_g, n_g) counts — the
  value dimension, not the corpus;
* one two-phase global running sum over those groups
  (:func:`packing.global_cumsum` — range-partitioned, never a
  single-task global sort; the grouped variant uses
  :func:`packing.grouped_cumsum`, same shape partitioned by slice);
* one 1-row aggregation of decimal(38,0) products
  (:func:`text.checked_dec38` — loud on overflow, DuckDB's HUGEINT
  raises natively).

Ties group EXACTLY because scores from this package's scorers are
bit-identical doubles on both engines (the exactness recipes in
``text.py``); equal bits → equal group → identical half-credit.

NULL DISCIPLINE (round 15, ADVICE): labels and scores must be
non-NULL and the requirement is ENFORCED loudly on both engines — a
NULL score would form its own group that Spark's range sort orders
NULLS FIRST while DuckDB's ``SUM() OVER (ORDER BY)`` orders NULLS
LAST, silently shifting every group's running count; NULL labels
would silently drop rows from both classes.

Reference parity: the reference repo is an array library with no
classifier metrics; this extends SURVEY.md §2.B's training-data-
pipeline rows (rounds 14–15).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "auc_exact", "sql_auc_ctes", "pr_curve_exact", "sql_pr_curve_ctes",
    "ann_recall", "calibration_bins", "sql_calibration_ctes",
    "ece_exact", "sql_ece_ctes", "brier_exact", "sql_brier_ctes",
    "ks_exact", "sql_ks_ctes", "f1_best", "sql_f1_best_ctes",
]

# 2^63 as an exact double — the floor-grid overflow bound (Spark's
# floor() returns BIGINT and silently CLAMPS past it under non-ANSI
# semantics while DuckDB's floor stays DOUBLE; round 15, ADVICE)
_I64_EDGE = 9223372036854775808.0


def _nn_label(label_col: str, what: str) -> Column:
    """0/1 label as long, loudly non-NULL AND loudly in-domain (round-15
    review: a stray y=2 would under-count n_neg IDENTICALLY on both
    engines — the one failure class the oracle differential cannot
    catch, so it must fail at the source)."""
    raw = F.col(label_col)
    ok = raw.isNotNull() & raw.isin(0, 1)
    return F.when(ok, raw.cast("long")).otherwise(
        F.assert_true(
            ok,
            F.lit(f"{what}: label column {label_col} must be 0/1 non-NULL"),
        ).cast("long")
    )


def _nn_score(score_col: str, what: str) -> Column:
    """Score column, loudly non-NULL; the otherwise-branch is NullType
    so ``when`` keeps the score's own type (no silent double cast)."""
    s = F.col(score_col)
    ok = s.isNotNull()
    return F.when(ok, s).otherwise(
        F.assert_true(ok, F.lit(f"{what}: NULL in score column {score_col}"))
    )


def _sql_nn(expr: str, what: str) -> str:
    return (
        f"CASE WHEN ({expr}) IS NULL "
        f"THEN error('{what}: NULL input') ELSE ({expr}) END"
    )


def _sql_nn_label(expr: str, what: str) -> str:
    """Mirror of :func:`_nn_label` — non-NULL and in {0, 1}."""
    return (
        f"CASE WHEN ({expr}) IS NOT NULL AND ({expr}) IN (0, 1) "
        f"THEN ({expr}) "
        f"ELSE error('{what}: label must be 0/1 non-NULL') END"
    )


def _prob_guard(prob_col: str, what: str) -> Column:
    """Probability column, loudly non-NULL and in [0, 1] — shared by
    :func:`calibration_bins` and :func:`brier_exact` so the guard (and
    any future NaN/message fix) lives in ONE place per engine (round-15
    review: the expression used to be inlined four times)."""
    p = F.col(prob_col)
    ok = p.isNotNull() & (p >= 0.0) & (p <= 1.0)
    return F.when(ok, p).otherwise(
        F.assert_true(
            ok, F.lit(f"{what}: {prob_col} outside [0, 1]")
        ).cast("double")
    )


def _sql_prob_guard(expr: str, what: str) -> str:
    """Mirror of :func:`_prob_guard`."""
    return (
        f"CASE WHEN ({expr}) IS NOT NULL AND ({expr}) >= 0.0 "
        f"AND ({expr}) <= 1.0 THEN ({expr}) "
        f"ELSE error('{what}: prob outside [0, 1]') END"
    )


def _group_pairs(group_exprs) -> "list[tuple[str, str]]":
    """Normalize SQL group entries to (expr, alias) pairs — a bare
    column name aliases to itself; a computed expression must come as
    an explicit (expr, alias) pair because downstream CTEs only see
    the grouped frame (round-15 review)."""
    if isinstance(group_exprs, str):
        group_exprs = [group_exprs]
    return [
        (g, g) if isinstance(g, str) else (g[0], g[1])
        for g in (group_exprs or [])
    ]


def auc_exact(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exact ROC AUC of ``score_col`` against 0/1 ``label_col`` —
    ONE row ``(n_pos, n_neg, u2, auc)`` where ``u2`` is the integer
    ``2U`` Mann-Whitney numerator (decimal(38,0) — cast it yourself if
    you know it fits BIGINT) and ``auc = u2 / (2·P·N)`` as one double
    division of two correctly-rounded casts.  Labels and scores must
    be non-NULL (loud ``assert_true`` — see the module NULL
    discipline).  Both classes must be non-empty (AUC is undefined
    otherwise — loud ``assert_true``).

    GROUPED MODE (round 15 — the production fairness table): pass
    ``group_cols`` to get one row PER GROUP ``(group…, n_pos, n_neg,
    u2, auc)``.  Two deliberate semantic differences from the global
    path: a single-class group yields ``auc = NULL`` instead of
    raising (degenerate slices are an expected fairness-table outcome
    — n_pos/n_neg say why), and the running negative count is
    partitioned by group via :func:`packing.grouped_cumsum` (same
    two-phase no-single-task-sort shape; the per-group offset frame
    is |partitions × groups| rows — groups are slice dimensions,
    never corpus-scale ids)."""
    from dataclass_array_spark.operators.packing import (
        global_cumsum,
        grouped_cumsum,
    )
    from dataclass_array_spark.operators.text import checked_dec38

    def _dec(c: Column) -> Column:
        return c.cast("decimal(38,0)")

    if isinstance(group_cols, str):  # 'source' would explode per-char
        group_cols = [group_cols]
    gcols = list(group_cols) if group_cols else []
    y = _nn_label(label_col, "auc_exact")
    s = _nn_score(score_col, "auc_exact")
    g = df.groupBy(*gcols, s.alias("__s")).agg(
        F.sum(y).cast("long").alias("__pg"),
        F.sum(F.lit(1) - y).cast("long").alias("__ng"),
    )
    if gcols:
        gc = grouped_cumsum(g, gcols, "__s", "__ng", out_col="__cumneg")
    else:
        gc = global_cumsum(g, "__s", "__ng", out_col="__cumneg")
    row = gc.groupBy(*gcols).agg(
        F.sum("__pg").cast("long").alias("n_pos"),
        F.sum("__ng").cast("long").alias("n_neg"),
        F.sum(
            checked_dec38(
                _dec(F.col("__pg"))
                * (
                    _dec(F.col("__cumneg") - F.col("__ng")) * 2
                    + _dec(F.col("__ng"))
                ),
                "AUC numerator term p_g*(2*cumneg_before + n_g)",
            )
        ).cast("decimal(38,0)").alias("u2"),
    )
    both = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    denom = checked_dec38(
        _dec(F.col("n_pos")) * _dec(F.col("n_neg")) * 2,
        "AUC denominator 2*P*N",
    )
    ratio = F.col("u2").cast("double") / denom.cast("double")
    if gcols:
        auc = F.when(both, ratio).otherwise(F.lit(None).cast("double"))
    else:
        auc = F.when(both, ratio).otherwise(
            F.assert_true(
                both, F.lit("auc_exact: both classes must be non-empty")
            ).cast("double")
        )
    return row.select(*gcols, "n_pos", "n_neg", "u2", auc.alias("auc"))


def sql_auc_ctes(
    src: str,
    y_expr: str,
    s_expr: str,
    out: str = "auc",
    group_exprs: Optional[Sequence[str]] = None,
) -> str:
    """DuckDB mirror of :func:`auc_exact`: CTE chain ending in
    ``{out}(…group…, n_pos, n_neg, u2, auc)`` — same distinct-score
    grouping, same running negative count (``PARTITION BY`` the
    groups when ``group_exprs`` is set), same decimal products
    (DuckDB HUGEINT raises natively where checked_dec38 is loud),
    same loud non-NULL/0-1 label and non-NULL score enforcement
    (``error()`` mirrors the Spark side's ``assert_true``), same two
    casts + one division for ``auc`` — and in grouped mode the same
    NULL-for-single-class semantics.  ``{src}`` rows provide
    ``{y_expr}`` (0/1) and ``{s_expr}`` (the score).

    Each ``group_exprs`` entry is either a bare column name of
    ``{src}`` or an ``(expr, alias)`` pair: downstream CTEs see only
    the GROUPED frame, so a computed group expression must be aliased
    in the first CTE and referenced by alias afterwards (round-15
    review — a raw expression here used to produce a binder error)."""
    y_expr = _sql_nn_label(y_expr, "auc_exact")
    s_expr = _sql_nn(s_expr, "auc_exact score")
    pairs = _group_pairs(group_exprs)
    gx = [alias for _, alias in pairs]
    gdef = "".join(
        (f"{alias}, " if expr == alias else f"({expr}) AS {alias}, ")
        for expr, alias in pairs
    )
    gsel = "".join(f"{g}, " for g in gx)
    gby = ", ".join(str(i + 2) for i in range(len(gx)))
    part = f"PARTITION BY {', '.join(gx)} " if gx else ""
    if gx:
        auc_case = (
            "CASE WHEN n_pos > 0 AND n_neg > 0\n"
            "              THEN CAST(u2 AS DOUBLE)\n"
            "                   / CAST(CAST(n_pos AS HUGEINT) * CAST(n_neg AS HUGEINT) * 2\n"
            "                          AS DOUBLE)\n"
            "              ELSE CAST(NULL AS DOUBLE)\n"
            "         END AS auc"
        )
    else:
        auc_case = (
            "CASE WHEN n_pos > 0 AND n_neg > 0\n"
            "              THEN CAST(u2 AS DOUBLE)\n"
            "                   / CAST(CAST(n_pos AS HUGEINT) * CAST(n_neg AS HUGEINT) * 2\n"
            "                          AS DOUBLE)\n"
            "              ELSE error('auc_exact: both classes must be non-empty')\n"
            "         END AS auc"
        )
    return f"""{out}_g AS (
  SELECT ({s_expr}) AS __s,
         {gdef}CAST(SUM({y_expr}) AS BIGINT) AS __pg,
         CAST(SUM(1 - ({y_expr})) AS BIGINT) AS __ng
  FROM {src}
  GROUP BY 1{", " + gby if gby else ""}
),
{out}_c AS (
  SELECT *, CAST(SUM(__ng) OVER ({part}ORDER BY __s) AS BIGINT) AS __cumneg
  FROM {out}_g
),
{out}_r AS (
  SELECT {gsel}CAST(SUM(__pg) AS BIGINT) AS n_pos,
         CAST(SUM(__ng) AS BIGINT) AS n_neg,
         CAST(SUM(CAST(__pg AS HUGEINT)
                  * (CAST(__cumneg - __ng AS HUGEINT) * 2
                     + CAST(__ng AS HUGEINT))) AS HUGEINT) AS u2
  FROM {out}_c
  {("GROUP BY " + ", ".join(str(i + 1) for i in range(len(gx)))) if gx else ""}
),
{out} AS (
  SELECT {gsel}n_pos, n_neg, u2,
         {auc_case}
  FROM {out}_r
)"""


def pr_curve_exact(
    df: DataFrame,
    label_col: str,
    score_col: str,
    floor_digits: "int | None" = None,
) -> DataFrame:
    """Exact precision/recall/F1 at EVERY distinct-score threshold
    (predict positive when ``score >= t``) — one row per distinct
    score ``(threshold, tp, fp, fn, precision, recall, f1)``, counts
    exact integers, each ratio ONE division of two correctly-rounded
    casts.  Labels and scores must be non-NULL (loud ``assert_true``
    — see the module NULL discipline).  The classic PR curve for
    picking a quality-filter operating point; same scale shape as
    :func:`auc_exact` (score-value-dimension aggregation + the
    two-phase running sum — no single-task global sort, no per-row
    ranking).

    CONTINUOUS scores make "the value dimension" corpus-sized (every
    margin distinct) — at 100 TB pass ``floor_digits=k`` to quantize
    thresholds to ``floor(score·10^k)/10^k`` first (floor, not round:
    a double can land exactly on a decimal HALF, where the engines'
    tie-breaks could disagree; floor is unambiguous — the
    classifier_fit residual discipline).  Counts then bound the output
    at the bucket dimension; each row's counts remain exact for its
    quantized threshold ("score >= t" with t on the quantized grid is
    identical before/after quantization, since floor never moves a
    score across a grid line).  ``|score·10^k|`` must stay below 2^63
    (loud ``assert_true``): Spark's floor returns BIGINT and silently
    CLAMPS past the edge under non-ANSI semantics while DuckDB's
    floor stays DOUBLE — the guard turns that silent cross-engine
    divergence into an error (round 15, ADVICE).

    Degenerate input: an EMPTY frame (or one with zero positives)
    raises "positives must be non-empty" on BOTH engines — the SQL
    mirror carries an explicit emptiness guard because a window over
    zero rows would otherwise return empty silently."""
    from dataclass_array_spark.operators.packing import global_cumsum

    y = _nn_label(label_col, "pr_curve_exact")
    s = _nn_score(score_col, "pr_curve_exact")
    if floor_digits is not None:
        scale = float(10 ** int(floor_digits))
        scaled = s * F.lit(scale)
        in_range = F.abs(scaled) < F.lit(_I64_EDGE)
        scaled = F.when(in_range, scaled).otherwise(
            F.assert_true(
                in_range,
                F.lit(
                    "pr_curve_exact: |score * 10^floor_digits| >= 2^63 "
                    "— the floor grid would clamp"
                ),
            ).cast("double")
        )
        s = F.floor(scaled).cast("double") / F.lit(scale)
    g = df.groupBy(s.alias("threshold")).agg(
        F.sum(y).cast("long").alias("__pg"),
        F.sum(F.lit(1) - y).cast("long").alias("__ng"),
    )
    gc = global_cumsum(
        g, "threshold", ["__pg", "__ng"], out_col=["__cumpos", "__cumneg"]
    )
    ptot = F.sum("__pg").cast("long")
    pok = ptot > 0
    tot = gc.agg(
        # recall/F1 are 0/0 with no positives — fail loudly instead of
        # silently emitting NULL recall rows (the auc_exact discipline;
        # round-14 review).  Zero NEGATIVES is fine: tp+fp >= n_g >= 1
        # at every emitted threshold, so precision stays defined.
        F.when(pok, ptot)
        .otherwise(
            F.assert_true(
                pok, F.lit("pr_curve_exact: positives must be non-empty")
            ).cast("long")
        )
        .alias("__P"),
        F.sum("__ng").cast("long").alias("__N"),
    )
    tp = (F.col("__P") - (F.col("__cumpos") - F.col("__pg"))).alias("tp")
    fp = (F.col("__N") - (F.col("__cumneg") - F.col("__ng"))).alias("fp")
    out = gc.crossJoin(F.broadcast(tot)).select(
        "threshold",
        tp,
        fp,
        (F.col("__cumpos") - F.col("__pg")).alias("fn"),  # positives below t
    )
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double")
    rec = F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double")
    f1 = (F.col("tp") * 2).cast("double") / (
        F.col("tp") * 2 + F.col("fp") + F.col("fn")
    ).cast("double")
    result = out.select(
        "threshold", "tp", "fp", "fn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )
    # Sentinel branch (round 15): on an EMPTY input the cross join's
    # probe side is empty, and AQE can replace the join with an empty
    # relation before the totals row's assert ever evaluates — the
    # loud "positives must be non-empty" failure became a RACE.  The
    # union forces the totals row through its __P < 0 filter (never
    # true — __P >= 1 whenever the assert passes), so the assert
    # evaluates deterministically and the branch contributes zero rows
    # otherwise.
    sentinel = tot.filter(F.col("__P") < 0).select(
        F.lit(None).cast(result.schema["threshold"].dataType).alias("threshold"),
        *[F.lit(None).cast("long").alias(c) for c in ("tp", "fp", "fn")],
        *[
            F.lit(None).cast("double").alias(c)
            for c in ("precision", "recall", "f1")
        ],
    )
    return result.unionByName(sentinel)


def sql_pr_curve_ctes(
    src: str,
    y_expr: str,
    s_expr: str,
    out: str = "pr",
    floor_digits: "int | None" = None,
) -> str:
    """DuckDB mirror of :func:`pr_curve_exact` — same grouped counts,
    same ascending running sums, same integer tp/fp/fn and single-
    division ratios, same loud non-NULL / floor-grid-overflow /
    empty-input enforcement (``error()`` mirrors ``assert_true``; the
    ``{out}_guard`` CTE raises on an empty ``{src}`` where the Spark
    side's aggregate-over-empty assert fires), and the same floor-grid
    quantization when ``floor_digits`` is set."""
    y_expr = _sql_nn_label(y_expr, "pr_curve_exact")
    s_expr = _sql_nn(s_expr, "pr_curve_exact score")
    if floor_digits is not None:
        scale = float(10 ** int(floor_digits))
        scaled = (
            f"CASE WHEN abs(({s_expr}) * {scale!r}) < {_I64_EDGE!r} "
            f"THEN ({s_expr}) * {scale!r} "
            f"ELSE error('pr_curve_exact: |score * 10^floor_digits| >= 2^63 "
            f"— the floor grid would clamp') END"
        )
        s_expr = f"CAST(floor({scaled}) AS DOUBLE) / {scale!r}"
    return f"""{out}_guard AS (
  SELECT CASE WHEN EXISTS (SELECT 1 FROM {src}) THEN 1
              ELSE error('pr_curve_exact: positives must be non-empty')
         END AS __ok
),
{out}_g AS (
  SELECT ({s_expr}) AS threshold,
         CAST(SUM({y_expr}) AS BIGINT) AS __pg,
         CAST(SUM(1 - ({y_expr})) AS BIGINT) AS __ng
  FROM {src}
  GROUP BY 1
),
{out}_c AS (
  SELECT *,
         CAST(SUM(__pg) OVER (ORDER BY threshold) AS BIGINT) AS __cumpos,
         CAST(SUM(__ng) OVER (ORDER BY threshold) AS BIGINT) AS __cumneg,
         CAST(CASE WHEN SUM(__pg) OVER () > 0 THEN SUM(__pg) OVER ()
                   ELSE error('pr_curve_exact: positives must be non-empty')
              END AS BIGINT) AS __P,
         CAST(SUM(__ng) OVER () AS BIGINT) AS __N
  FROM {out}_g
),
{out} AS (
  SELECT threshold,
         __P - (__cumpos - __pg) AS tp,
         __N - (__cumneg - __ng) AS fp,
         __cumpos - __pg AS fn,
         CAST(__P - (__cumpos - __pg) AS DOUBLE)
           / CAST((__P - (__cumpos - __pg)) + (__N - (__cumneg - __ng)) AS DOUBLE)
           AS precision,
         CAST(__P - (__cumpos - __pg) AS DOUBLE)
           / CAST((__P - (__cumpos - __pg)) + (__cumpos - __pg) AS DOUBLE)
           AS recall,
         CAST((__P - (__cumpos - __pg)) * 2 AS DOUBLE)
           / CAST((__P - (__cumpos - __pg)) * 2 + (__N - (__cumneg - __ng))
                  + (__cumpos - __pg) AS DOUBLE) AS f1
  FROM {out}_c
  CROSS JOIN {out}_guard
  WHERE {out}_guard.__ok = 1
)"""


def ann_recall(
    approx_df: DataFrame,
    truth_df: DataFrame,
    qid_col: str = "qid",
    nid_col: str = "nid",
) -> DataFrame:
    """Recall@k of an ANN result against the exact top-k ground truth —
    per query ``(qid, hits, k, recall)`` where ``k`` is the TRUTH list
    size for that query (queries with no approximate hits keep recall
    0.0; a query missing from the truth side is dropped — it has no
    ground truth to recall).  The "measure, don't guess" closer for
    the similarity-search family: IVF/LSH/PQ trade recall for scan
    fraction, and this makes the trade a NUMBER on real data.

    Exact by construction: hits are integer SET-intersection counts —
    both inputs are deduplicated on (qid, nid) here rather than
    assumed set-shaped (round 15, ADVICE: a duplicate pair from a
    multi-probe ANN variant would otherwise inflate the intersection
    and report recall > 1) — and recall is one division.  Scale
    shape: one hash join on (qid, nid) — both sides k-bounded per
    query, so the join and the per-query counts are results-sized,
    never corpus-sized."""
    t = truth_df.select(
        F.col(qid_col).alias("__q"), F.col(nid_col).alias("__n")
    ).dropDuplicates(["__q", "__n"])
    a = approx_df.select(
        F.col(qid_col).alias("__q"), F.col(nid_col).alias("__n")
    ).dropDuplicates(["__q", "__n"])
    hits = a.join(t, ["__q", "__n"]).groupBy("__q").agg(
        F.count("*").cast("long").alias("hits")
    )
    base = t.groupBy("__q").agg(F.count("*").cast("long").alias("k"))
    return base.join(hits, "__q", "left").select(
        F.col("__q").alias(qid_col),
        F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        "k",
        (
            F.coalesce(F.col("hits"), F.lit(0)).cast("double")
            / F.col("k").cast("double")
        ).alias("recall"),
    )


def calibration_bins(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    nbins: int = 10,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier — per
    bin ``(bin, n, n_pos, mean_pred, frac_pos)`` with
    ``bin = min(floor(prob·nbins), nbins−1)`` (the floor grid; the
    top edge prob=1.0 folds into the last bin).  ``frac_pos`` is an
    integer ratio; ``mean_pred`` sums floor-quantized probabilities
    (``floor(p·10^9)`` — exact integers, order-free decimal sum) and
    divides once, so the whole table is engine-exact without any
    ordered float fold.  Bins with no rows are absent (a reliability
    plot has nothing to draw there).  For one Expected Calibration
    Error number use :func:`ece_exact`.  Pass ``group_cols`` for one
    reliability diagram PER SLICE (round 15 — the fairness-table
    companion of ``auc_exact(group_cols=…)``): output gains the group
    columns, everything else is per-(group, bin).  Scale: one
    map-side-combined aggregation to nbins (× groups) rows — nothing
    else; groups are slice dimensions, never corpus-scale ids."""
    nb = int(nbins)
    if nb < 1:
        raise ValueError("calibration_bins: nbins must be >= 1")
    if isinstance(group_cols, str):  # 'source' would explode per-char
        group_cols = [group_cols]
    gcols = list(group_cols) if group_cols else []
    guarded = _prob_guard(prob_col, "calibration_bins")
    b = F.least(
        F.floor(guarded * F.lit(float(nb))).cast("long"), F.lit(nb - 1)
    )
    y = F.col(label_col).cast("long")
    pq = F.floor(guarded * F.lit(1.0e9)).cast("long")
    g = df.groupBy(*gcols, b.alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(y).cast("long").alias("n_pos"),
        F.sum(pq.cast("decimal(38,0)")).cast("decimal(38,0)").alias("__sq"),
    )
    mean_pred = (
        F.col("__sq").cast("double") / F.lit(1.0e9)
    ) / F.col("n").cast("double")
    return g.select(
        *gcols,
        "bin",
        "n",
        "n_pos",
        mean_pred.alias("mean_pred"),
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
            "frac_pos"
        ),
    )


def sql_calibration_ctes(
    src: str,
    y_expr: str,
    p_expr: str,
    nbins: int,
    out: str = "calib",
    group_exprs=None,
) -> str:
    """DuckDB mirror of :func:`calibration_bins` — same floor-grid
    binning, same quantized-probability sums, same single divisions;
    out-of-range probabilities raise (``error()``) like the Spark
    side's ``assert_true``.  ``group_exprs`` entries are bare column
    names or (expr, alias) pairs (the :func:`sql_auc_ctes`
    convention)."""
    nb = int(nbins)
    pairs = _group_pairs(group_exprs)
    gx = [alias for _, alias in pairs]
    gdef = "".join(
        (f"{alias}, " if expr == alias else f"({expr}) AS {alias}, ")
        for expr, alias in pairs
    )
    gsel = "".join(f"{g}, " for g in gx)
    gby = "".join(f", {i + 2}" for i in range(len(gx)))
    pg = _sql_prob_guard(p_expr, "calibration_bins")
    return f"""{out}_g AS (
  SELECT least(CAST(floor(({pg}) * {float(nb)!r}) AS BIGINT), {nb - 1}) AS bin,
         {gdef}CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({y_expr}) AS BIGINT) AS n_pos,
         CAST(SUM(CAST(floor(({pg}) * 1000000000.0) AS HUGEINT))
              AS HUGEINT) AS __sq
  FROM {src}
  GROUP BY 1{gby}
),
{out} AS (
  SELECT {gsel}bin, n, n_pos,
         (CAST(__sq AS DOUBLE) / 1000000000.0) / CAST(n AS DOUBLE)
           AS mean_pred,
         CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos
  FROM {out}_g
)"""


def ece_exact(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    nbins: int = 10,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Expected Calibration Error — ONE row ``(n, ece)`` with
    ``ece = Σ_b (n_b/N)·|frac_pos_b − mean_pred_b|`` over the
    :func:`calibration_bins` rows (round 15 — the one-number closer
    the calibration gate's docstring promised).

    Engine-exact despite being a float sum: every per-bin term is a
    fixed IEEE expression over already-exact bin statistics, and the
    ≤ nbins terms are folded SEQUENTIALLY in ascending-bin order via
    ``F.aggregate`` over a sorted array — the house dot-product
    recipe (Spark ``aggregate`` ≡ DuckDB ``list_reduce``), so both
    engines run the identical left fold instead of an order-free SUM.
    Pass ``group_cols`` for one (group…, n, ece) row PER SLICE (round
    15 — the calibration half of the fairness table; N and the fold
    are then per-group).  Scale: each fold runs on ≤ nbins rows
    collected into one array — model-diagram-sized, never
    corpus-sized."""
    if isinstance(group_cols, str):  # 'source' would explode per-char
        group_cols = [group_cols]
    gcols = list(group_cols) if group_cols else []
    b = calibration_bins(df, label_col, prob_col, nbins, group_cols=gcols)
    one = b.groupBy(*gcols).agg(
        F.sum("n").cast("long").alias("n"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("bin"), F.col("n"), F.col("frac_pos"),
                    F.col("mean_pred"),
                )
            )
        ).alias("__bins"),
    )
    ece = F.aggregate(
        F.col("__bins"),
        F.lit(0.0),
        lambda acc, x: acc
        + (x["n"].cast("double") / F.col("n").cast("double"))
        * F.abs(x["frac_pos"] - x["mean_pred"]),
    )
    if not gcols:
        # Loud on EMPTY input (round-15 review, the brier_exact fix
        # applied family-wide): the ungrouped agg over zero bins would
        # otherwise emit a silent (n=NULL, ece=0.0) row.  Grouped mode
        # yields zero rows on empty input, consistently, on both
        # engines.
        nz = F.col("n").isNotNull() & (F.col("n") > 0)
        ece = F.when(nz, ece).otherwise(
            F.assert_true(
                nz, F.lit("ece_exact: input must be non-empty")
            ).cast("double")
        )
    return one.select(*gcols, "n", ece.alias("ece"))


def sql_ece_ctes(
    src: str,
    y_expr: str,
    p_expr: str,
    nbins: int,
    out: str = "ece",
    group_exprs=None,
) -> str:
    """DuckDB mirror of :func:`ece_exact` — the same
    :func:`sql_calibration_ctes` bins, the same ascending-bin term
    list, and the same sequential left fold (``list_reduce`` seeded
    with 0.0 ≡ ``F.aggregate``'s zero accumulator).  Grouped mode
    joins each slice's bins to its own total null-safely (``IS NOT
    DISTINCT FROM`` — NULL group values form their own group, matching
    Spark's groupBy)."""
    pairs = _group_pairs(group_exprs)
    gx = [alias for _, alias in pairs]
    calib = sql_calibration_ctes(
        src, y_expr, p_expr, nbins, out=f"{out}_calib", group_exprs=group_exprs
    )
    if not gx:
        return f"""{calib},
{out}_n AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n FROM {out}_calib
),
{out}_terms AS (
  SELECT list(
           CAST(n AS DOUBLE) / CAST((SELECT n FROM {out}_n) AS DOUBLE)
             * abs(frac_pos - mean_pred)
           ORDER BY bin
         ) AS __ts
  FROM {out}_calib
),
{out} AS (
  SELECT (SELECT n FROM {out}_n) AS n,
         CASE WHEN (SELECT n FROM {out}_n) IS NOT NULL
                   AND (SELECT n FROM {out}_n) > 0
              THEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), __ts),
                               (acc, x) -> acc + x)
              ELSE error('ece_exact: input must be non-empty')
         END AS ece
  FROM {out}_terms
)"""
    gsel_c = "".join(f"c.{g}, " for g in gx)
    gby = ", ".join(str(i + 1) for i in range(len(gx)))
    on = " AND ".join(f"c.{g} IS NOT DISTINCT FROM t.{g}" for g in gx)
    gsel = "".join(f"{g}, " for g in gx)
    return f"""{calib},
{out}_n AS (
  SELECT {gsel}CAST(SUM(n) AS BIGINT) AS n
  FROM {out}_calib
  GROUP BY {gby}
),
{out}_terms AS (
  SELECT {gsel_c}MAX(t.n) AS n,
         list(
           CAST(c.n AS DOUBLE) / CAST(t.n AS DOUBLE)
             * abs(c.frac_pos - c.mean_pred)
           ORDER BY c.bin
         ) AS __ts
  FROM {out}_calib c JOIN {out}_n t ON {on}
  GROUP BY {gby}
),
{out} AS (
  SELECT {gsel}n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), __ts),
                     (acc, x) -> acc + x) AS ece
  FROM {out}_terms
)"""


def brier_exact(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Brier score — ONE row ``(n, brier)`` with
    ``brier = (1/N)·Σ (p_i − y_i)²`` computed ON THE 10⁻⁹ QUANTIZED
    probability grid (round 15 — the overall proper-scoring-rule
    closer of the evaluation trio: AUC ranks, ECE calibrates, Brier
    scores both at once).

    Exactness: a raw double Σ(p−y)² is an order-dependent float fold,
    so the metric is DEFINED on the floor grid instead (the
    ``pr_curve_exact floor_digits`` discipline): with
    ``q = floor(p·10⁹)`` and the 0/1 label scaled to the same grid,
    every term ``(q − y·10⁹)²`` is an exact integer ≤ 10¹⁸, the sum is an
    order-free decimal(38,0) aggregation (loud overflow via
    ``checked_dec38``; DuckDB HUGEINT raises natively), and the final
    value is ONE double division by ``N·10¹⁸``.  Quantization bias is
    ≤ 2·10⁻⁹ absolute — far below any decision threshold the score
    feeds — and IDENTICAL on both engines, which a raw float fold
    cannot promise.  Labels enforced 0/1, probabilities enforced
    [0, 1] (loud, both engines).  Pass ``group_cols`` for one row per
    fairness slice.  Scale: one map-side-combined aggregation to
    1 (× groups) rows — nothing else."""
    from dataclass_array_spark.operators.text import checked_dec38

    if isinstance(group_cols, str):  # 'source' would explode per-char
        group_cols = [group_cols]
    gcols = list(group_cols) if group_cols else []
    y = _nn_label(label_col, "brier_exact")
    guarded = _prob_guard(prob_col, "brier_exact")
    q = F.floor(guarded * F.lit(1.0e9)).cast("long")
    d = (q - y * F.lit(1000000000)).cast("decimal(38,0)")
    g = df.groupBy(*gcols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(checked_dec38(d * d, "brier term (q - y*10^9)^2"))
        .cast("decimal(38,0)")
        .alias("__ss"),
    )
    brier = F.col("__ss").cast("double") / (
        F.col("n").cast("double") * F.lit(1.0e18)
    )
    if not gcols:
        # Loud on EMPTY input (round-15 review): the ungrouped agg
        # yields one (n=0, brier=NULL) row IDENTICALLY on both engines
        # — the one degenerate class the oracle differential can never
        # catch, so it must fail at the source (the pr_curve/ks
        # discipline).  Grouped mode is untouched: an empty frame
        # yields ZERO group rows, consistently, on both engines.
        nz = F.col("n") > 0
        brier = F.when(nz, brier).otherwise(
            F.assert_true(
                nz, F.lit("brier_exact: input must be non-empty")
            ).cast("double")
        )
    return g.select(*gcols, "n", brier.alias("brier"))


def sql_brier_ctes(
    src: str,
    y_expr: str,
    p_expr: str,
    out: str = "brier",
    group_exprs=None,
) -> str:
    """DuckDB mirror of :func:`brier_exact` — same 10⁻⁹ floor grid,
    same exact-integer squared terms (HUGEINT raises natively where
    checked_dec38 is loud), same single division, same loud label /
    probability-range / (in global mode) empty-input enforcement."""
    y_expr = _sql_nn_label(y_expr, "brier_exact")
    pg = _sql_prob_guard(p_expr, "brier_exact")
    pairs = _group_pairs(group_exprs)
    gx = [alias for _, alias in pairs]
    gdef = "".join(
        (f"{alias}, " if expr == alias else f"({expr}) AS {alias}, ")
        for expr, alias in pairs
    )
    gsel = "".join(f"{g}, " for g in gx)
    gby = (
        "GROUP BY " + ", ".join(str(i + 1) for i in range(len(gx)))
        if gx
        else ""
    )
    if gx:  # empty frame -> zero group rows on both engines, consistently
        bexpr = "CAST(__ss AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e18)"
    else:  # mirror the Spark side's loud empty-input assert
        bexpr = (
            "CASE WHEN n > 0 "
            "THEN CAST(__ss AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e18) "
            "ELSE error('brier_exact: input must be non-empty') END"
        )
    return f"""{out}_g AS (
  SELECT {gdef}CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(
           (CAST(floor(({pg}) * 1000000000.0) AS HUGEINT)
            - CAST(({y_expr}) AS HUGEINT) * 1000000000)
           * (CAST(floor(({pg}) * 1000000000.0) AS HUGEINT)
              - CAST(({y_expr}) AS HUGEINT) * 1000000000)
         ) AS HUGEINT) AS __ss
  FROM {src}
  {gby}
),
{out} AS (
  SELECT {gsel}n,
         {bexpr} AS brier
  FROM {out}_g
)"""


def ks_exact(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Kolmogorov-Smirnov separation of ``score_col`` between the two
    label classes — ONE row ``(n_pos, n_neg, d_num, ks)`` where
    ``d_num = max_g |cumpos_g·N − cumneg_g·P|`` over the distinct-score
    groups g in ascending order (cumulative counts INCLUSIVE of g) and
    ``ks = d_num / (P·N)`` — the standard two-sample KS statistic
    ``max_t |F⁺(t) − F⁻(t)|`` (round 15: the separation companion to
    AUC — AUC integrates the gap, KS reports its worst point, the
    number credit-risk/quality-filter reviews quote as "KS").

    Exactness: each candidate ``|cumpos·N − cumneg·P|`` is an exact
    integer (decimal(38,0), loud overflow via ``checked_dec38``; DuckDB
    HUGEINT raises natively), ``max`` over integers is ORDER-FREE, and
    the final value is ONE double division by the exact ``P·N`` — no
    float comparison ever decides the argmax.  Same scale skeleton as
    :func:`auc_exact`: one hash aggregation to the score-VALUE
    dimension, one two-phase :func:`packing.global_cumsum` (never a
    single-task global sort), one 1-row aggregation.  Labels/scores
    loudly non-NULL, labels loudly 0/1 (module NULL discipline); both
    classes must be non-empty (KS is undefined otherwise — loud on
    both engines, empty input included: the AQE sentinel-union keeps
    the assert from being pruned with the empty probe side).

    GROUPED MODE (round 15 — the fairness-table variant, completing
    the family: AUC/ECE/Brier already slice): pass ``group_cols`` for
    one row PER GROUP ``(group…, n_pos, n_neg, d_num, ks)``.  Grouped
    AUC semantics apply: a single-class slice yields ``ks = NULL``
    instead of raising (``d_num`` is then 0 — one empirical CDF is
    identically absent), and the running counts go through the
    multi-column :func:`packing.grouped_cumsum` (ONE per-group
    two-phase pass for both class counts).  The per-group totals
    broadcast-join back null-safely — the totals frame is
    |groups|-sized, never value-dimension-sized."""
    from dataclass_array_spark.operators.packing import (
        global_cumsum,
        grouped_cumsum,
    )
    from dataclass_array_spark.operators.text import checked_dec38

    def _dec(c: Column) -> Column:
        return c.cast("decimal(38,0)")

    if isinstance(group_cols, str):  # 'source' would explode per-char
        group_cols = [group_cols]
    gcols = list(group_cols) if group_cols else []
    y = _nn_label(label_col, "ks_exact")
    s = _nn_score(score_col, "ks_exact")
    g = df.groupBy(*gcols, s.alias("__s")).agg(
        F.sum(y).cast("long").alias("__pg"),
        F.sum(F.lit(1) - y).cast("long").alias("__ng"),
    )
    if gcols:
        gc = grouped_cumsum(
            g, gcols, "__s", ["__pg", "__ng"],
            out_col=["__cumpos", "__cumneg"],
        )
        tot = gc.groupBy(*gcols).agg(
            F.sum("__pg").cast("long").alias("__P"),
            F.sum("__ng").cast("long").alias("__N"),
        )
        renamed = tot.select(
            *[F.col(c).alias(f"__tg{i}") for i, c in enumerate(gcols)],
            "__P",
            "__N",
        )
        cond = F.lit(True)
        for i, c in enumerate(gcols):
            cond = cond & F.col(c).eqNullSafe(F.col(f"__tg{i}"))
        joined = gc.join(F.broadcast(renamed), cond).drop(
            *[f"__tg{i}" for i in range(len(gcols))]
        )
        d = checked_dec38(
            F.abs(
                _dec(F.col("__cumpos")) * _dec(F.col("__N"))
                - _dec(F.col("__cumneg")) * _dec(F.col("__P"))
            ),
            "KS candidate |cumpos*N - cumneg*P|",
        )
        row = joined.groupBy(*gcols, "__P", "__N").agg(
            F.max(d).cast("decimal(38,0)").alias("d_num")
        )
        both = (F.col("__P") > 0) & (F.col("__N") > 0)
        ks = F.when(
            both,
            F.col("d_num").cast("double")
            / checked_dec38(
                _dec(F.col("__P")) * _dec(F.col("__N")),
                "KS denominator P*N",
            ).cast("double"),
        ).otherwise(F.lit(None).cast("double"))
        return row.select(
            *gcols,
            F.col("__P").alias("n_pos"),
            F.col("__N").alias("n_neg"),
            "d_num",
            ks.alias("ks"),
        )
    gc = global_cumsum(
        g, "__s", ["__pg", "__ng"], out_col=["__cumpos", "__cumneg"]
    )
    ptot = F.sum("__pg").cast("long")
    ntot = F.sum("__ng").cast("long")
    both = (ptot > 0) & (ntot > 0)
    loud = F.assert_true(
        both, F.lit("ks_exact: both classes must be non-empty")
    )
    tot = gc.agg(
        F.when(both, ptot).otherwise(loud.cast("long")).alias("__P"),
        F.when(both, ntot).otherwise(loud.cast("long")).alias("__N"),
    )
    d = checked_dec38(
        F.abs(
            _dec(F.col("__cumpos")) * _dec(F.col("__N"))
            - _dec(F.col("__cumneg")) * _dec(F.col("__P"))
        ),
        "KS candidate |cumpos*N - cumneg*P|",
    )
    row = (
        gc.crossJoin(F.broadcast(tot))
        .groupBy("__P", "__N")
        .agg(F.max(d).cast("decimal(38,0)").alias("d_num"))
    )
    ks = F.col("d_num").cast("double") / checked_dec38(
        _dec(F.col("__P")) * _dec(F.col("__N")), "KS denominator P*N"
    ).cast("double")
    result = row.select(
        F.col("__P").alias("n_pos"),
        F.col("__N").alias("n_neg"),
        "d_num",
        ks.alias("ks"),
    )
    # Sentinel branch (the pr_curve_exact discipline): on an EMPTY
    # input AQE can prune the cross join before the totals row's
    # assert evaluates — the union forces the totals row through its
    # never-true __P < 0 filter so the loud failure is deterministic.
    sentinel = tot.filter(F.col("__P") < 0).select(
        *[F.lit(None).cast("long").alias(c) for c in ("n_pos", "n_neg")],
        F.lit(None).cast("decimal(38,0)").alias("d_num"),
        F.lit(None).cast("double").alias("ks"),
    )
    return result.unionByName(sentinel)


def sql_ks_ctes(
    src: str,
    y_expr: str,
    s_expr: str,
    out: str = "ks",
    group_exprs: Optional[Sequence[str]] = None,
) -> str:
    """DuckDB mirror of :func:`ks_exact`: CTE chain ending in
    ``{out}(…group…, n_pos, n_neg, d_num, ks)`` — same distinct-score
    grouping, same inclusive running counts, same exact-integer
    candidates (HUGEINT raises natively where checked_dec38 is loud),
    same order-free MAX and single division, same loud non-NULL/0-1
    label, non-NULL score, both-classes-non-empty, and empty-input
    enforcement (an emptiness guard CTE mirrors the Spark sentinel —
    a window over zero rows would otherwise return empty silently).
    In grouped mode the running counts and totals partition by the
    groups (NULL group values form one partition, matching Spark's
    groupBy/eqNullSafe) and single-class slices yield ``ks = NULL``
    with no guard CTE (an empty frame consistently yields zero group
    rows on both engines).  ``group_exprs`` entries are bare column
    names or (expr, alias) pairs (the :func:`sql_auc_ctes`
    convention)."""
    y_expr = _sql_nn_label(y_expr, "ks_exact")
    s_expr = _sql_nn(s_expr, "ks_exact score")
    pairs = _group_pairs(group_exprs)
    gx = [alias for _, alias in pairs]
    if gx:
        gdef = "".join(
            (f"{alias}, " if expr == alias else f"({expr}) AS {alias}, ")
            for expr, alias in pairs
        )
        gsel = "".join(f"{g}, " for g in gx)
        gby = ", ".join(str(i + 2) for i in range(len(gx)))
        part = ", ".join(gx)
        mby = ", ".join(
            [str(i + 1) for i in range(len(gx))]
            + [str(len(gx) + 1), str(len(gx) + 2)]
        )
        return f"""{out}_g AS (
  SELECT ({s_expr}) AS __s,
         {gdef}CAST(SUM({y_expr}) AS BIGINT) AS __pg,
         CAST(SUM(1 - ({y_expr})) AS BIGINT) AS __ng
  FROM {src}
  GROUP BY 1, {gby}
),
{out}_c AS (
  SELECT *,
         CAST(SUM(__pg) OVER (PARTITION BY {part} ORDER BY __s) AS BIGINT)
           AS __cumpos,
         CAST(SUM(__ng) OVER (PARTITION BY {part} ORDER BY __s) AS BIGINT)
           AS __cumneg,
         CAST(SUM(__pg) OVER (PARTITION BY {part}) AS BIGINT) AS __P,
         CAST(SUM(__ng) OVER (PARTITION BY {part}) AS BIGINT) AS __N
  FROM {out}_g
),
{out}_m AS (
  SELECT {gsel}__P, __N,
         CAST(MAX(abs(CAST(__cumpos AS HUGEINT) * CAST(__N AS HUGEINT)
                      - CAST(__cumneg AS HUGEINT) * CAST(__P AS HUGEINT)))
              AS HUGEINT) AS d_num
  FROM {out}_c
  GROUP BY {mby}
),
{out} AS (
  SELECT {gsel}__P AS n_pos, __N AS n_neg, d_num,
         CASE WHEN __P > 0 AND __N > 0
              THEN CAST(d_num AS DOUBLE)
                   / CAST(CAST(__P AS HUGEINT) * CAST(__N AS HUGEINT)
                          AS DOUBLE)
              ELSE CAST(NULL AS DOUBLE)
         END AS ks
  FROM {out}_m
)"""
    return f"""{out}_guard AS (
  SELECT CASE WHEN EXISTS (SELECT 1 FROM {src}) THEN 1
              ELSE error('ks_exact: both classes must be non-empty')
         END AS __ok
),
{out}_g AS (
  SELECT ({s_expr}) AS __s,
         CAST(SUM({y_expr}) AS BIGINT) AS __pg,
         CAST(SUM(1 - ({y_expr})) AS BIGINT) AS __ng
  FROM {src}
  GROUP BY 1
),
{out}_c AS (
  SELECT *,
         CAST(SUM(__pg) OVER (ORDER BY __s) AS BIGINT) AS __cumpos,
         CAST(SUM(__ng) OVER (ORDER BY __s) AS BIGINT) AS __cumneg,
         CAST(CASE WHEN SUM(__pg) OVER () > 0 AND SUM(__ng) OVER () > 0
                   THEN SUM(__pg) OVER ()
                   ELSE error('ks_exact: both classes must be non-empty')
              END AS BIGINT) AS __P,
         CAST(CASE WHEN SUM(__pg) OVER () > 0 AND SUM(__ng) OVER () > 0
                   THEN SUM(__ng) OVER ()
                   ELSE error('ks_exact: both classes must be non-empty')
              END AS BIGINT) AS __N
  FROM {out}_g
),
{out}_m AS (
  SELECT MAX(__P) AS __P, MAX(__N) AS __N,
         CAST(MAX(abs(CAST(__cumpos AS HUGEINT) * CAST(__N AS HUGEINT)
                      - CAST(__cumneg AS HUGEINT) * CAST(__P AS HUGEINT)))
              AS HUGEINT) AS d_num
  FROM {out}_c
  CROSS JOIN {out}_guard
  WHERE {out}_guard.__ok = 1
),
{out} AS (
  SELECT __P AS n_pos, __N AS n_neg, d_num,
         CAST(d_num AS DOUBLE)
           / CAST(CAST(__P AS HUGEINT) * CAST(__N AS HUGEINT) AS DOUBLE) AS ks
  FROM {out}_m
)"""


def f1_best(
    df: DataFrame,
    label_col: str,
    score_col: str,
    floor_digits: "int | None" = None,
) -> DataFrame:
    """The operating point a production quality filter actually
    deploys: the :func:`pr_curve_exact` row with the MAXIMUM F1 — ONE
    row ``(threshold, tp, fp, fn, precision, recall, f1)`` (round 15:
    the PR gate publishes the whole table; this gate closes the loop
    by SELECTING from it the way a filter-tuning job does).

    The argmax is DEFINED on an exact total order so both engines pick
    the identical row: the sort key is the integer
    ``⌊2·tp·10¹⁸ / (2·tp + fp + fn)⌋`` (exact integer division of
    exact integers — cross-engine-identical, never a float compare;
    two F1 values within 10⁻¹⁸ of each other share a key and fall to
    the tie-break), ties broken by the HIGHEST threshold (the more
    selective filter at equal F1).  The quotient is ≤ 10¹⁸ by
    construction (2·tp ≤ the denominator), so it fits BIGINT exactly
    on both engines.  Inherits pr_curve_exact's NULL discipline,
    ``floor_digits`` grid quantization (pass it at 100 TB so the
    candidate set is grid-bounded, not corpus-sized), and loud
    empty/no-positive enforcement.  Scale: the final selection is a
    top-1 over value-dimension rows (TakeOrderedAndProject — no global
    sort materialization)."""
    from dataclass_array_spark.operators.text import checked_dec38

    pr = pr_curve_exact(df, label_col, score_col, floor_digits=floor_digits)
    num = checked_dec38(
        F.col("tp").cast("decimal(38,0)")
        * F.lit(2).cast("decimal(38,0)")
        * F.lit(10**18).cast("decimal(38,0)"),
        "f1_best numerator 2*tp*10^18",
    )
    den = (
        F.col("tp").cast("decimal(38,0)") * 2
        + F.col("fp").cast("decimal(38,0)")
        + F.col("fn").cast("decimal(38,0)")
    )
    keyed = pr.select(
        "*", num.alias("__num"), den.cast("decimal(38,0)").alias("__den")
    ).select("*", F.expr("__num div __den").alias("__key"))
    return (
        keyed.orderBy(
            F.desc_nulls_last("__key"), F.desc_nulls_last("threshold")
        )
        .limit(1)
        .select(
            "threshold", "tp", "fp", "fn", "precision", "recall", "f1"
        )
    )


def sql_f1_best_ctes(
    src: str,
    y_expr: str,
    s_expr: str,
    out: str = "f1b",
    floor_digits: "int | None" = None,
) -> str:
    """DuckDB mirror of :func:`f1_best` — the :func:`sql_pr_curve_ctes`
    chain plus the identical integer sort key (HUGEINT ``//`` is floor
    division; both operands are non-negative so it matches Spark's
    truncating ``div`` exactly), the identical highest-threshold
    tie-break, and ``LIMIT 1``."""
    pr = sql_pr_curve_ctes(
        src, y_expr, s_expr, out=f"{out}_pr", floor_digits=floor_digits
    )
    return f"""{pr},
{out} AS (
  SELECT threshold, tp, fp, fn, precision, recall, f1
  FROM (
    SELECT *,
           (CAST(tp AS HUGEINT) * 2 * 1000000000000000000)
             // (CAST(tp AS HUGEINT) * 2 + fp + fn) AS __key
    FROM {out}_pr
  )
  ORDER BY __key DESC NULLS LAST, threshold DESC NULLS LAST
  LIMIT 1
)"""
