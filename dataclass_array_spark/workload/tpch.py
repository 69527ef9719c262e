"""TPC-H-style relational queries over the driver's star schema.

These exercise the §2.B relational layer: scan → filter → project →
join → aggregate → sort/limit, all pure Catalyst built-ins.  Each query
has a DuckDB oracle string built from the same deterministic aggregation
helpers (see workload.base).

Scale notes per query are inline — broadcast hints for dimension tables,
no repartition calls (AQE owns partition counts at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclass_array_spark.workload.base import (
    davg,
    dsum,
    load_tables,
    sql_davg,
    sql_dsum,
)
from dataclass_array_spark.workload.catalog import Query

_TS = lambda s: F.lit(s).cast("timestamp")


# ---------------------------------------------------------------- q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: wide aggregation, map-side partial aggs do the
    heavy lifting; no join, one shuffle on the 2-value group key."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _TS("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- q3
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join customer⋈orders⋈lineitem + agg + top-10.  customer is a
    dimension → broadcast (no shuffle of the fact side on that join);
    orders⋈lineitem shuffles on orderkey, the natural co-partition key.
    Fully tie-broken ORDER BY so LIMIT is deterministic cross-engine."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < _TS("1995-03-15"))
    li = t["lineitem"].filter(F.col("l_shipdate") > _TS("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------- q5
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way join; all dimension tables broadcast, single fact shuffle."""
    t = load_tables(
        spark, sf_dir, ["customer", "orders", "lineitem", "supplier", "nation", "region"]
    )
    region = t["region"].filter(F.col("r_name") == "ASIA")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("o_orderdate") >= _TS("1996-01-01"))
            & (F.col("o_orderdate") < _TS("1997-01-01"))
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------- q6
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter+agg — every predicate pushes into the parquet scan
    (verify: PushedFilters in .explain)."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= _TS("1996-01-01"))
            & (F.col("l_shipdate") < _TS("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


Q6_SQL = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------- q10
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue from returned items: join + agg + top-20."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= _TS("1995-03-01"))
            & (F.col("o_orderdate") < _TS("1995-09-01"))
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1995-03-01'
  AND o_orderdate <  TIMESTAMP '1995-09-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


QUERIES = {
    "q1_pricing_summary": Query(q1_pricing_summary, Q1_SQL, tags=("agg",)),
    "q3_shipping_priority": Query(q3_shipping_priority, Q3_SQL, tags=("join", "topk")),
    "q5_local_supplier_volume": Query(q5_local_supplier_volume, Q5_SQL, tags=("join",)),
    "q6_forecast_revenue": Query(q6_forecast_revenue, Q6_SQL, tags=("filter",)),
    "q10_returned_items": Query(q10_returned_items, Q10_SQL, tags=("join", "topk")),
}
