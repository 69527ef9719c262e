"""Third TPC-H wave — the four queries whose originals revolve around
``partsupp`` (absent from the testdata), re-based on lineitem as the
part↔supplier relation: q2 (correlated min-cost supplier), q11
(important-stock value share), q16 (supplier-count per part class with
NOT-IN exclusion), q20 (potential-promotion nested semi-joins).  This
completes the 22/22 TPC-H analog coverage.

Scale notes: every dimension side (part/supplier/nation/region and any
filtered derivative) is broadcast, so the only shuffles are the
lineitem aggregations on their natural grouping keys; the correlated
subqueries become per-key windows/aggregations over the already-reduced
pair table, never a second pass over lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataclass_array_spark.workload.base import dsum, load_tables, sql_dsum
from dataclass_array_spark.workload.catalog import Query

_TS = lambda s: F.lit(s).cast("timestamp")


# ---------------------------------------------------------------- q2
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 analog: per (part, supplier) the 'supply cost' is the minimum
    extended price ever charged (exact double MIN — no accumulation);
    return EUROPE suppliers offering each STANDARD size-7 part at that
    part's minimum cost.  The correlated min is a window over the
    dimension-filtered pair table (one shuffle on p_partkey)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier", "nation", "region"])
    ps = t["lineitem"].groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    eu_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t["part"].filter(
        (F.col("p_size") == 7) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    flt = (
        ps.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        flt.withColumn("__min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("__min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
  FROM lineitem GROUP BY 1, 2
),
flt AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
  FROM ps
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  JOIN part ON p_partkey = l_partkey
  WHERE r_name = 'EUROPE' AND p_size = 7 AND p_type = 'STANDARD'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
FROM flt f
WHERE cost = (SELECT MIN(cost) FROM flt f2 WHERE f2.p_partkey = f.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------- q11
_Q11_NATION = "NATION_3"
_Q11_FRAC = 0.002


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 analog: per-part shipped value through suppliers of one
    nation; keep parts whose value exceeds FRAC of the nation total
    (scalar aggregate via a 1-row broadcast cross join — never a second
    lineitem pass)."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    nat_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == _Q11_NATION)
        .select("s_suppkey")
    )
    val = (
        t["lineitem"]
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice"), "val"))
    )
    total = val.agg(dsum(F.col("val"), "__total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.lit(_Q11_FRAC) * F.col("__total"))
        .select("l_partkey", "val")
        .orderBy(F.desc("val"), "l_partkey")
    )


Q11_SQL = f"""
WITH v AS (
  SELECT l_partkey, {sql_dsum('l_extendedprice', 'val')}
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = '{_Q11_NATION}'
  GROUP BY l_partkey
)
SELECT l_partkey, val
FROM v, (SELECT {sql_dsum('val', '__total')} FROM v)
WHERE val > {_Q11_FRAC} * __total
ORDER BY val DESC, l_partkey
"""


# ---------------------------------------------------------------- q16
_Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 analog: distinct suppliers per (brand, type, size) part
    class, excluding one brand, one type, and 'complaint' suppliers
    (negative account balance stands in for the comment scan).  NOT IN
    on a non-null key = broadcast left_anti."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier"])
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*_Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------- q20
_Q20_NATION = "NATION_2"


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 analog: suppliers in one nation who shipped more than half of
    their all-time quantity of some red part during 1997 (the
    availqty-vs-half-shipped predicate re-based on shipment history).
    Nested structure preserved: pair aggregation → part semi-join →
    supplier/nation join, all dimension sides broadcast."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier", "nation"])
    in97 = (F.col("l_shipdate") >= _TS("1997-01-01")) & (
        F.col("l_shipdate") < _TS("1998-01-01")
    )
    pairs = t["lineitem"].groupBy("l_partkey", "l_suppkey").agg(
        dsum(F.when(in97, F.col("l_quantity")).otherwise(F.lit(0.0)), "q97"),
        dsum(F.col("l_quantity"), "qall"),
    )
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    qual = (
        pairs.filter((F.col("q97") > F.lit(0.5) * F.col("qall")) & (F.col("q97") > 0))
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_suppkey")
        .distinct()
    )
    nat = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == _Q20_NATION)
        .select("s_suppkey", "s_name")
    )
    return (
        qual.join(F.broadcast(nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH pairs AS (
  SELECT l_partkey, l_suppkey,
         {sql_dsum("CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' THEN l_quantity ELSE 0.0 END", 'q97')},
         {sql_dsum('l_quantity', 'qall')}
  FROM lineitem GROUP BY 1, 2
),
qual AS (
  SELECT DISTINCT l_suppkey FROM pairs
  WHERE q97 > 0.5 * qall AND q97 > 0
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
)
SELECT s_suppkey, s_name
FROM qual JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = '{_Q20_NATION}'
ORDER BY s_name
"""


QUERIES = {
    "q2_min_cost_supplier": Query(q2_min_cost_supplier, Q2_SQL, tags=("tpch", "join")),
    "q11_important_parts": Query(q11_important_parts, Q11_SQL, tags=("tpch", "agg")),
    "q16_supplier_counts": Query(q16_supplier_counts, Q16_SQL, tags=("tpch", "agg")),
    "q20_promotion_suppliers": Query(
        q20_promotion_suppliers, Q20_SQL, tags=("tpch", "subquery")
    ),
}
