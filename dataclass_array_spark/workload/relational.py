"""Relational-layer coverage (SURVEY.md §2.B): window functions, rollup/
cube, set ops, pivot, semi/anti joins, range (non-equi) join, scalar
function passthrough, top-k per group, distinct aggregation.

Every query carries a DuckDB oracle.  Window sums use ROWS frames with
fully tie-broken ORDER BY + exact decimal accumulators so both engines
produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataclass_array_spark.operators.topk import topk_per_group
from dataclass_array_spark.workload.base import dsum, load_tables, sql_dsum
from dataclass_array_spark.workload.catalog import Query

_DEC = "decimal(25,6)"


# ------------------------------------------------ window: running total
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total + sequence number.  One shuffle
    on o_custkey; both window functions share the sort."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum(F.col("o_totalprice").cast(_DEC))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("price_delta"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS rn,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total,
       LAG(o_totalprice) OVER w AS prev_price,
       o_totalprice - LAG(o_totalprice) OVER w AS price_delta
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# ------------------------------------------------ window: moving average
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order moving average per customer (ROWS frame -2..0)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
            / F.count("o_totalprice").over(w)
        ).alias("moving_avg3"),
    )


WINDOW_MAVG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE)
         / COUNT(o_totalprice) OVER w AS moving_avg3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# ------------------------------------------------ top-k per group
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per market segment (WindowGroupLimit keeps
    per-partition state at K rows — no global sort)."""
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    j = t["orders"].join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
    return topk_per_group(
        j,
        ["c_mktsegment"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    ).select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")


TOPK_SQL = """
SELECT c_mktsegment, rn, o_orderkey, o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
"""


# ------------------------------------------------ rollup
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — Catalyst expands to
    grouping sets in a single aggregate pass."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum(F.col("l_quantity"), "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n",
            "sum_qty",
        )
    )


ROLLUP_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       COUNT(*) AS n,
       {sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ------------------------------------------------ cube
def cube_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    j = t["customer"].join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        j.cube("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_cust"), dsum(F.col("c_acctbal"), "sum_bal"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n_cust",
            "sum_bal",
        )
    )


CUBE_SQL = f"""
SELECT COALESCE(n_name, 'ALL') AS nation,
       COALESCE(c_mktsegment, 'ALL') AS segment,
       COUNT(*) AS n_cust,
       {sql_dsum('c_acctbal', 'sum_bal')}
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (n_name, c_mktsegment)
"""


# ------------------------------------------------ set ops
def setops_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both 1996 and 1997 (INTERSECT) minus those
    who ordered in 1998 (EXCEPT) — distinct set semantics."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]

    def year(y):
        return o.filter(F.year("o_orderdate") == y).select("o_custkey")

    return year(1996).intersect(year(1997)).subtract(year(1998)).orderBy("o_custkey")


SETOPS_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
ORDER BY o_custkey
"""


# ------------------------------------------------ semi / anti join
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT EXISTS as left_semi/left_anti; labels which customers
    have high-value orders vs none at all."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    big = t["orders"].filter(F.col("o_totalprice") > 100000)
    with_big = (
        t["customer"].join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey")
        .withColumn("kind", F.lit("has_big_order"))
    )
    none = (
        t["customer"].join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey")
        .withColumn("kind", F.lit("no_orders"))
    )
    return with_big.unionByName(none).orderBy("kind", "c_custkey")


SEMI_ANTI_SQL = """
SELECT c_custkey, 'has_big_order' AS kind FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
UNION ALL
SELECT c_custkey, 'no_orders' AS kind FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY kind, c_custkey
"""


# ------------------------------------------------ pivot
_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def pivot_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user over the (fixed) event-type domain.
    Fixed pivot values → single-pass aggregate, no value-discovery job."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    p = (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0)
    )
    return p.select(
        "user_id", *[F.col(c).cast("long").alias(f"n_{c}") for c in _EVENT_TYPES]
    )


PIVOT_SQL = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
FROM events GROUP BY user_id
"""


# ------------------------------------------------ range (non-equi) join
_BUCKETS = [(0, 0.0, 500.0), (1, 500.0, 1000.0), (2, 1000.0, 1500.0), (3, 1500.0, 1e18)]


def range_join_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi interval join: parts → price buckets.  The bucket side is
    tiny → broadcast nested-loop, the scalable plan for interval joins
    with a small dimension."""
    p = load_tables(spark, sf_dir, ["part"])["part"]
    b = spark.createDataFrame(
        _BUCKETS,
        T.StructType(
            [
                T.StructField("bucket_id", T.IntegerType(), False),
                T.StructField("lo", T.DoubleType(), False),
                T.StructField("hi", T.DoubleType(), False),
            ]
        ),
    )
    return (
        p.join(
            F.broadcast(b),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("bucket_id")
        .agg(F.count("*").alias("n_parts"), dsum(F.col("p_retailprice"), "sum_price"))
        .orderBy("bucket_id")
    )


RANGE_JOIN_SQL = f"""
WITH buckets(bucket_id, lo, hi) AS (
  VALUES (0, 0.0, 500.0), (1, 500.0, 1000.0), (2, 1000.0, 1500.0), (3, 1500.0, 1e18)
)
SELECT bucket_id, COUNT(*) AS n_parts, {sql_dsum('p_retailprice', 'sum_price')}
FROM part JOIN buckets ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY bucket_id ORDER BY bucket_id
"""


# ------------------------------------------------ distinct aggregation
def distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_suppkey")
    )


DISTINCT_SQL = """
SELECT l_suppkey,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
"""


# ------------------------------------------------ scalar function passthrough
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math built-ins — all JVM-side codegen, zero UDFs."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return (
        o.filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.upper(F.col("o_orderpriority")).alias("prio_upper"),
            F.substring(F.col("o_orderstatus"), 1, 1).alias("status_c"),
            F.length(F.col("o_orderpriority")).cast("long").alias("prio_len"),
            F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("tag"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dom"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.floor(F.col("o_totalprice")).cast("long").alias("price_floor"),
            F.abs(F.col("o_totalprice") - 1000.0).alias("abs_delta"),
            F.sqrt(F.col("o_totalprice")).alias("price_sqrt"),
        )
        .orderBy("o_orderkey")
    )


SCALAR_SQL = """
SELECT o_orderkey,
       UPPER(o_orderpriority) AS prio_upper,
       SUBSTR(o_orderstatus, 1, 1) AS status_c,
       CAST(LENGTH(o_orderpriority) AS BIGINT) AS prio_len,
       CONCAT_WS('-', o_orderstatus, o_orderpriority) AS tag,
       CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
       CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
       CAST(DAY(o_orderdate) AS BIGINT) AS dom,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       ABS(o_totalprice - 1000.0) AS abs_delta,
       SQRT(o_totalprice) AS price_sqrt
FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
"""


QUERIES = {
    "window_running_total": Query(window_running_total, WINDOW_RUNNING_SQL, tags=("window",)),
    "window_moving_avg": Query(window_moving_avg, WINDOW_MAVG_SQL, tags=("window",)),
    "topk_orders_per_segment": Query(topk_orders_per_segment, TOPK_SQL, tags=("window", "topk")),
    "rollup_flag_status": Query(rollup_flag_status, ROLLUP_SQL, tags=("agg",)),
    "cube_nation_segment": Query(cube_nation_segment, CUBE_SQL, tags=("agg",)),
    "setops_repeat_customers": Query(setops_repeat_customers, SETOPS_SQL, tags=("setop",)),
    "semi_anti_customers": Query(semi_anti_customers, SEMI_ANTI_SQL, tags=("join",)),
    "pivot_user_event_counts": Query(pivot_user_event_counts, PIVOT_SQL, tags=("agg",)),
    "range_join_price_buckets": Query(range_join_price_buckets, RANGE_JOIN_SQL, tags=("join",)),
    "distinct_parts_per_supplier": Query(distinct_parts_per_supplier, DISTINCT_SQL, tags=("agg",)),
    "scalar_functions": Query(scalar_functions, SCALAR_SQL, tags=("scalar",)),
}


# ------------------------------------------------ RANGE frame + value fns
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric time axis (orders within the 30 days
    before each order) + first/last/nth_value — the window features the
    ROWS-frame queries don't cover."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    days = (
        F.unix_micros(F.col("o_orderdate").cast("timestamp")) / (86400 * 1_000_000)
    ).cast("long")
    base = o.select("o_custkey", "o_orderkey", "o_totalprice", days.alias("day"))
    w_range = (
        Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0)
    )
    w_seq = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    w_full = w_seq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return base.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w_range).cast("double").alias("sum_30d"),
        F.count("*").over(w_range).alias("n_30d"),
        F.first("o_orderkey").over(w_full).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


WINDOW_RANGE_SQL = """
WITH base AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
)
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER
            (PARTITION BY o_custkey ORDER BY day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d,
       FIRST_VALUE(o_orderkey) OVER w_full AS first_order,
       LAST_VALUE(o_orderkey) OVER w_full AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w_full AS second_order
FROM base
WINDOW w_full AS (PARTITION BY o_custkey ORDER BY day, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

QUERIES["window_range_frame"] = Query(window_range_frame, WINDOW_RANGE_SQL, tags=("window",))


# ------------------------------------------------ rank-family completeness
def rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/cume_dist — completes the window
    ranking roster (row_number/ntile live in other queries).  All are
    exact rationals of (rank, n) → identical doubles cross-engine."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
        )
    )


RANK_SQL = """
SELECT o_orderpriority, o_orderkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       PERCENT_RANK() OVER w AS prnk,
       CUME_DIST() OVER w AS cdist
FROM orders WHERE o_orderkey <= 2000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""

QUERIES["rank_functions"] = Query(rank_functions, RANK_SQL, tags=("window",))


# ------------------------------------------------ calendar arithmetic
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic parity: datediff/date_add/last_day/quarter/
    weekday — the classic engine-divergence zone, pinned down exactly
    (Spark dayofweek is 1=Sunday, DuckDB 0=Sunday: normalized to ISO
    1=Monday..7=Sunday in both)."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    d = F.col("o_orderdate").cast("date")
    iso_dow = ((F.dayofweek(d) + 5) % 7) + 1  # 1=Mon .. 7=Sun
    return (
        o.filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch0"),
            F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_date"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.quarter(d).cast("long").alias("qtr"),
            iso_dow.cast("long").alias("iso_dow"),
            F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias("week_start"),
        )
        .orderBy("o_orderkey")
    )


DATE_SQL = """
SELECT o_orderkey,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
         AS days_since_epoch0,
       strftime(CAST(o_orderdate AS DATE) + 90, '%Y-%m-%d') AS due_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       strftime(CAST(date_trunc('week', o_orderdate) AS DATE), '%Y-%m-%d') AS week_start
FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey
"""

QUERIES["date_functions"] = Query(date_functions, DATE_SQL, tags=("scalar", "date"))
