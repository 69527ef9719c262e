"""Robust per-group statistics: exact median / MAD outlier detection —
the data-quality screen (drop rows beyond ``k`` median-absolute-
deviations from their group's median) that survives heavy-tailed
columns where mean/stddev z-scores break.

Exactness: medians use the VALUE-HISTOGRAM two-middle-rows rule (the
``median_quantity_by_flag`` machinery — engine ``median()``
implementations differ in interpolation; the two-middle-rows convention
cannot), with DECIMAL middle sums and a single double division.
Deviations ``abs(x - med)`` and the threshold compare ``dev > k * mad``
are plain double ops identical across engines, so the whole report is
value-exact vs DuckDB.

Scale shape: each median pass shuffles ONE row per distinct (group,
value) pair with map-side partial counts — the histogram form suits the
discrete/low-cardinality numeric columns this screen is typically run
on (quantities, counts, scores); for continuous high-cardinality
columns bucketize first (``F.round``/``F.floor`` to the precision that
matters) or reach for ``approx_percentile`` — an EXACT median of a
truly continuous 100 TB column is a histogram the size of the distinct
set on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"


def _split_sum(c: Column) -> Column:
    """Exact decimal sum → double via the floor-split (round 9: direct
    decimal→double casts double-round differently across engines past
    2^53 scaled units — winsorized sf1 sums are ~7e16 scaled)."""
    t = F.sum(c.cast(_DEC))
    f = F.floor(t)
    return f.cast("double") + (t - f).cast("double")


def _hist_median(df: DataFrame, group_col: str, value: Column, out: str) -> DataFrame:
    """Exact per-group median of ``value`` via the cumulative value
    histogram → ``(group_col, out)``.  Two-middle-rows: a middle value
    covered twice gets weight 2, and ``double(2v)/2 == double(v)/1``
    exactly, so the weighted form is bit-identical to the oracle's
    ROW_NUMBER middle-rows form."""
    hist = df.groupBy(F.col(group_col), value.alias("_val")).agg(
        F.count("*").alias("cnt")
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy("_val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    h = (
        hist.select(
            group_col, "_val", "cnt",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt").over(wall).alias("n"),
        )
        .withColumn("prev", F.col("cum") - F.col("cnt"))
        .withColumn("p1", F.expr("(n + 1) div 2"))
        .withColumn("p2", F.expr("(n + 2) div 2"))
    )
    in_range = lambda p: (p > F.col("prev")) & (p <= F.col("cum"))  # noqa: E731
    mid = h.withColumn(
        "w",
        F.when(in_range(F.col("p1")), 1).otherwise(0)
        + F.when(in_range(F.col("p2")), 1).otherwise(0),
    ).filter(F.col("w") > 0)
    return mid.groupBy(group_col).agg(
        (
            F.sum(F.col("_val").cast(_DEC) * F.col("w")).cast("double")
            / F.sum("w")
        ).alias(out)
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group MAD outlier report → ``(group, median, mad,
    n_outliers, n_rows)``: rows with ``abs(x − median) > k · MAD`` are
    outliers (MAD = median of absolute deviations from the group
    median; the classic robust screen — unlike stddev, one huge value
    cannot drag the threshold).

    Two histogram-median passes (values, then deviations) + one count
    aggregation; the group medians are joined back broadcast (one row
    per group — dimension-sized by definition).
    """
    med = _hist_median(df, group_col, F.col(value_col), "med")
    dev = df.join(F.broadcast(med), on=group_col).select(
        group_col,
        F.col(value_col).alias("_x"),
        F.abs(F.col(value_col) - F.col("med")).alias("_dev"),
        "med",
    )
    mad = _hist_median(dev, group_col, F.col("_dev"), "mad")
    flagged = dev.join(F.broadcast(mad), on=group_col)
    return (
        flagged.groupBy(group_col)
        .agg(
            F.first("med").alias("median"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(F.col("_dev") > F.lit(float(k)) * F.col("mad"), 1)
                .otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count("*").cast("long").alias("n_rows"),
        )
        .orderBy(group_col)
    )


def mad_outliers_sql(
    table: str, group_col: str, value_col: str, k: float,
    order_cols: "list[str]",
) -> str:
    """DuckDB oracle for :func:`mad_outliers`.  ``order_cols`` is a
    full tie-break suffix for the ROW_NUMBER orderings (value ties are
    interchangeable for the median VALUE, but deterministic plans are
    cheaper to debug)."""
    oc = ", ".join(order_cols)

    def med_cte(src: str, val: str, name: str) -> str:
        return f"""{name}_r AS (
  SELECT {group_col}, {val} AS v,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY {val}, {oc}) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM {src}
), {name} AS (
  SELECT {group_col},
         CAST(SUM(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS m
  FROM {name}_r
  WHERE rn*2 = n OR rn*2 = n + 1 OR rn*2 = n + 2
  GROUP BY {group_col}
)"""

    return f"""
WITH {med_cte(table, value_col, "med")}
, dev AS (
  SELECT t.{group_col}, t.{value_col} AS x,
         abs(t.{value_col} - med.m) AS d, med.m AS med, {oc}
  FROM {table} t JOIN med ON med.{group_col} = t.{group_col}
), {med_cte("dev", "d", "mad")}
SELECT d.{group_col}, d.med AS median, mad.m AS mad,
       CAST(SUM(CASE WHEN d.d > {k!r} * mad.m THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM dev d JOIN mad ON mad.{group_col} = d.{group_col}
GROUP BY d.{group_col}, d.med, mad.m
ORDER BY d.{group_col}"""


def _hist_rank_value(
    df: DataFrame, group_col: str, value: Column, q: float, out: str
) -> DataFrame:
    """Exact per-group NEAREST-RANK quantile (rank = ``ceil(q·n)``,
    no interpolation — the convention both engines compute identically
    from the same doubles) via the cumulative value histogram →
    ``(group_col, out)``."""
    hist = df.groupBy(F.col(group_col), value.alias("_val")).agg(
        F.count("*").alias("cnt")
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy("_val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    h = (
        hist.select(
            group_col, "_val", "cnt",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt").over(wall).alias("n"),
        )
        .withColumn("prev", F.col("cum") - F.col("cnt"))
        .withColumn("p", F.greatest(F.ceil(F.lit(float(q)) * F.col("n")), F.lit(1)))
    )
    return (
        h.filter((F.col("p") > F.col("prev")) & (F.col("p") <= F.col("cum")))
        .select(F.col(group_col), F.col("_val").alias(out))
    )


def winsorize_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization report → ``(group, lo, hi, n_lo, n_hi,
    sum_winsorized)``: values below the exact nearest-rank ``q_lo``
    quantile clamp up to it, above ``q_hi`` clamp down; the winsorized
    decimal-exact sum is what a robust mean/total uses.  The two
    quantile frames are one histogram pass each and join back
    broadcast (dimension-sized).  Same scale caveat as
    :func:`mad_outliers`: the histogram carries one row per distinct
    (group, value) pair — bucketize continuous columns first."""
    lo = _hist_rank_value(df, group_col, F.col(value_col), q_lo, "lo")
    hi = _hist_rank_value(df, group_col, F.col(value_col), q_hi, "hi")
    j = df.join(F.broadcast(lo), on=group_col).join(F.broadcast(hi), on=group_col)
    v = F.col(value_col)
    w = F.when(v < F.col("lo"), F.col("lo")).when(v > F.col("hi"), F.col("hi")).otherwise(v)
    return (
        j.groupBy(group_col)
        .agg(
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.sum(F.when(v < F.col("lo"), 1).otherwise(0)).cast("long").alias("n_lo"),
            F.sum(F.when(v > F.col("hi"), 1).otherwise(0)).cast("long").alias("n_hi"),
            _split_sum(w).alias("sum_winsorized"),
        )
        .orderBy(group_col)
    )


def winsorize_sql(
    table: str, group_col: str, value_col: str, q_lo: float, q_hi: float,
    order_cols: "list[str]",
) -> str:
    """DuckDB oracle for :func:`winsorize_stats` (nearest-rank
    quantiles via ROW_NUMBER; identical double ``ceil(q*n)`` ranks)."""
    oc = ", ".join(order_cols)

    def qcte(q: float, name: str) -> str:
        return f"""{name} AS (
  SELECT {group_col}, v AS {name}_v FROM (
    SELECT {group_col}, {value_col} AS v,
           ROW_NUMBER() OVER (PARTITION BY {group_col}
                              ORDER BY {value_col}, {oc}) AS rn,
           COUNT(*) OVER (PARTITION BY {group_col}) AS n
    FROM {table}
  ) WHERE rn = GREATEST(CAST(ceil({q!r} * n) AS BIGINT), 1)
)"""

    return f"""
WITH {qcte(q_lo, "qlo")}, {qcte(q_hi, "qhi")}
SELECT t.{group_col}, qlo.qlo_v AS lo, qhi.qhi_v AS hi,
       CAST(SUM(CASE WHEN t.{value_col} < qlo.qlo_v THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
       CAST(SUM(CASE WHEN t.{value_col} > qhi.qhi_v THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       (CAST(FLOOR(SUM(CAST(CASE WHEN t.{value_col} < qlo.qlo_v THEN qlo.qlo_v
                          WHEN t.{value_col} > qhi.qhi_v THEN qhi.qhi_v
                          ELSE t.{value_col} END AS DECIMAL(25,6)))) AS DOUBLE)
         + CAST(SUM(CAST(CASE WHEN t.{value_col} < qlo.qlo_v THEN qlo.qlo_v
                          WHEN t.{value_col} > qhi.qhi_v THEN qhi.qhi_v
                          ELSE t.{value_col} END AS DECIMAL(25,6))) - FLOOR(SUM(CAST(CASE WHEN t.{value_col} < qlo.qlo_v THEN qlo.qlo_v
                          WHEN t.{value_col} > qhi.qhi_v THEN qhi.qhi_v
                          ELSE t.{value_col} END AS DECIMAL(25,6)))) AS DOUBLE))
         AS sum_winsorized
FROM {table} t
JOIN qlo ON qlo.{group_col} = t.{group_col}
JOIN qhi ON qhi.{group_col} = t.{group_col}
GROUP BY t.{group_col}, qlo.qlo_v, qhi.qhi_v
ORDER BY t.{group_col}"""


def ols_by_group(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group simple linear regression ``y = slope·x + intercept``
    → ``(group, n, slope, intercept)``, assembled from exact decimal
    moments (Σx, Σy, Σxy, Σx²) exactly like the Pearson gate — engine
    ``regr_*``/BLAS implementations differ numerically, the moments
    chain does not.  One aggregation pass; the closed form is
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)``."""
    dec = lambda c: c.cast("decimal(30,8)")  # noqa: E731

    def dbl(c):
        # decimal→double floor-split (see corr gate): both halves are
        # exactly convertible, and fl(a+b) matches across engines
        f = F.floor(c)
        return f.cast("double") + (c - f).cast("double")

    x, y = F.col(x_col), F.col(y_col)
    m = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        dbl(F.sum(dec(x))).alias("sx"),
        dbl(F.sum(dec(y))).alias("sy"),
        dbl(F.sum(dec(x * y))).alias("sxy"),
        dbl(F.sum(dec(x * x))).alias("sxx"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        m.withColumn("slope", slope)
        .select(
            group_col,
            "n",
            "slope",
            ((F.col("sy") - F.col("slope") * F.col("sx")) / n).alias("intercept"),
        )
        .orderBy(group_col)
    )


def ols_by_group_sql(table: str, group_col: str, x_col: str, y_col: str) -> str:
    """DuckDB oracle for :func:`ols_by_group` (same moments, same
    floor-split, same expression order)."""

    def s(expr: str, name: str) -> str:
        inner = f"SUM(CAST({expr} AS DECIMAL(30,8)))"
        return (
            f"(CAST(FLOOR({inner}) AS DOUBLE) + "
            f"CAST(({inner}) - FLOOR({inner}) AS DOUBLE)) AS {name}"
        )

    return f"""
WITH m AS (
  SELECT {group_col}, COUNT(*) AS n,
         {s(x_col, "sx")},
         {s(y_col, "sy")},
         {s(f"{x_col} * {y_col}", "sxy")},
         {s(f"{x_col} * {x_col}", "sxx")}
  FROM {table} GROUP BY {group_col}
), sl AS (
  SELECT {group_col}, n,
         (CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx)
           AS slope,
         sx, sy
  FROM m
)
SELECT {group_col}, n, slope,
       (sy - slope * sx) / CAST(n AS DOUBLE) AS intercept
FROM sl ORDER BY {group_col}"""


# Cramer's-rule expression TEXT for the 2-regressor normal equations —
# shared VERBATIM by the Spark side (F.expr) and the DuckDB oracle, so
# both engines parse the same tree and execute the same IEEE op order.
# A = [[n_d, sx1, sx2], [sx1, s11, s12], [sx2, s12, s22]],
# b = (sy, s1y, s2y); dets expanded along the first row.
OLS2_DET = (
    "n_d*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) "
    "+ sx2*(sx1*s12 - s11*sx2)"
)
OLS2_DET_B0 = (
    "sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) "
    "+ sx2*(s1y*s12 - s11*s2y)"
)
OLS2_DET_B1 = (
    "n_d*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) "
    "+ sx2*(sx1*s2y - s1y*sx2)"
)
OLS2_DET_B2 = (
    "n_d*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) "
    "+ sy*(sx1*s12 - s11*sx2)"
)


def ols2_by_group(
    df: DataFrame, group_col: str, x1_col: str, x2_col: str, y_col: str
) -> DataFrame:
    """Per-group TWO-regressor least squares ``y = b1·x1 + b2·x2 + b0``
    → ``(group, n, b1, b2, intercept)`` — the normal equations solved
    by Cramer's rule over exact decimal moments (n, Σx1, Σx2, Σy,
    Σx1², Σx1x2, Σx2², Σx1y, Σx2y: ONE aggregation pass, floor-split
    to doubles like :func:`ols_by_group`).  The determinant expressions
    are shared as TEXT with the oracle (``OLS2_DET*`` constants parsed
    by both engines), so the closed-form doubles hash-match.  Groups
    with a singular system (collinear regressors) yield NULLs — same
    0/0 → NULL semantics both engines.

    Scale: one shuffle carrying 9 decimal partial moments per group —
    the same cost as the 1-regressor form; no iteration, no BLAS."""
    dec = lambda c: c.cast("decimal(30,8)")  # noqa: E731

    def dbl(c):
        f = F.floor(c)
        return f.cast("double") + (c - f).cast("double")

    x1, x2, y = F.col(x1_col), F.col(x2_col), F.col(y_col)
    m = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        dbl(F.sum(dec(x1))).alias("sx1"),
        dbl(F.sum(dec(x2))).alias("sx2"),
        dbl(F.sum(dec(y))).alias("sy"),
        dbl(F.sum(dec(x1 * x1))).alias("s11"),
        dbl(F.sum(dec(x1 * x2))).alias("s12"),
        dbl(F.sum(dec(x2 * x2))).alias("s22"),
        dbl(F.sum(dec(x1 * y))).alias("s1y"),
        dbl(F.sum(dec(x2 * y))).alias("s2y"),
    )
    m = m.withColumn("n_d", F.col("n").cast("double")).withColumn(
        "det", F.expr(OLS2_DET)
    )
    return m.select(
        group_col,
        "n",
        (F.expr(OLS2_DET_B1) / F.col("det")).alias("b1"),
        (F.expr(OLS2_DET_B2) / F.col("det")).alias("b2"),
        (F.expr(OLS2_DET_B0) / F.col("det")).alias("intercept"),
    ).orderBy(group_col)


def ols2_by_group_sql(
    table: str, group_col: str, x1_col: str, x2_col: str, y_col: str
) -> str:
    """DuckDB oracle for :func:`ols2_by_group` — the same moment
    aggregation and the VERBATIM ``OLS2_DET*`` expression text."""

    def s(expr: str, name: str) -> str:
        inner = f"SUM(CAST({expr} AS DECIMAL(30,8)))"
        return (
            f"(CAST(FLOOR({inner}) AS DOUBLE) + "
            f"CAST(({inner}) - FLOOR({inner}) AS DOUBLE)) AS {name}"
        )

    return f"""
WITH m AS (
  SELECT {group_col}, COUNT(*) AS n,
         {s(x1_col, "sx1")},
         {s(x2_col, "sx2")},
         {s(y_col, "sy")},
         {s(f"{x1_col} * {x1_col}", "s11")},
         {s(f"{x1_col} * {x2_col}", "s12")},
         {s(f"{x2_col} * {x2_col}", "s22")},
         {s(f"{x1_col} * {y_col}", "s1y")},
         {s(f"{x2_col} * {y_col}", "s2y")}
  FROM {table} GROUP BY {group_col}
), d AS (
  SELECT *, CAST(n AS DOUBLE) AS n_d FROM m
), dd AS (
  SELECT *, {OLS2_DET} AS det FROM d
)
SELECT {group_col}, n,
       ({OLS2_DET_B1}) / det AS b1,
       ({OLS2_DET_B2}) / det AS b2,
       ({OLS2_DET_B0}) / det AS intercept
FROM dd ORDER BY {group_col}"""
