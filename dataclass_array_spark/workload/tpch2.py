"""Second TPC-H wave: EXISTS-driven aggregation (q4), conditional CASE
aggregation (q12), promo revenue ratio (q14), large-order HAVING (q18),
and a correlated-average filter (q17 analog) — deeper §2.B coverage:
subqueries, HAVING, conditional aggregates, scalar-vs-aggregate joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclass_array_spark.workload.base import dec_to_double, dsum, load_tables, sql_dsum
from dataclass_array_spark.workload.catalog import Query

_TS = lambda s: F.lit(s).cast("timestamp")


# ---------------------------------------------------------------- q4
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS (left_semi) + count by priority."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    late = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= _TS("1996-01-01"))
            & (F.col("o_orderdate") < _TS("1996-07-01"))
        )
        .join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------- q12
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional CASE aggregation by linestatus."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("l_shipdate") >= _TS("1997-01-01"))
            & (F.col("l_shipdate") < _TS("1998-01-01"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


# ---------------------------------------------------------------- q14
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share — two decimal-exact sums, double division."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.col("l_shipdate") >= _TS("1997-01-01"))
            & (F.col("l_shipdate") < _TS("1997-07-01"))
        )
        .agg(
            (
                F.lit(100.0)
                * dec_to_double(F.sum(promo.cast("decimal(25,6)")))
                / dec_to_double(F.sum(rev.cast("decimal(25,6)")))
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT 100.0
       * (CAST(FLOOR(SUM(CAST(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(25,6)))) AS DOUBLE) + CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(25,6))) - FLOOR(SUM(CAST(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(25,6)))) AS DOUBLE))
       / (CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))) AS DOUBLE) + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) - FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))) AS DOUBLE))
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
"""


# ---------------------------------------------------------------- q18
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over an aggregated subquery + join back to detail."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
FROM (SELECT l_orderkey, {sql_dsum('l_quantity', 'total_qty')}
      FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


# ---------------------------------------------------------------- q17 analog
def q17_below_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate: items ordered below 50% of their
    part's average quantity — decorrelated as agg + join (what Catalyst
    does to the correlated subquery anyway, stated explicitly)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"]
    avg_q = (
        li.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
                / F.count("l_quantity")
            ).alias("avg_qty")
        )
    )
    return (
        li.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count("*").alias("n_small"),
            dsum(F.col("l_extendedprice"), "small_revenue"),
        )
    )


Q17_SQL = f"""
WITH avg_q AS (
  SELECT l_partkey AS ap_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*) AS n_small, {sql_dsum('l_extendedprice', 'small_revenue')}
FROM lineitem JOIN avg_q ON l_partkey = ap_partkey
WHERE l_quantity < 0.5 * avg_qty
"""


QUERIES = {
    "q4_order_priority": Query(q4_order_priority, Q4_SQL, tags=("join", "exists")),
    "q12_shipmode_priority": Query(q12_shipmode_priority, Q12_SQL, tags=("agg",)),
    "q14_promo_revenue": Query(q14_promo_revenue, Q14_SQL, tags=("join", "agg")),
    "q18_large_orders": Query(q18_large_orders, Q18_SQL, tags=("join", "having")),
    "q17_below_avg_parts": Query(q17_below_avg_parts, Q17_SQL, tags=("join", "subquery")),
}


# ---------------------------------------------------------------- q19 analog
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-branch predicate (OR of AND-groups) — exercises
    Catalyst's BooleanSimplification + OR pushdown into the join."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li, p = t["lineitem"], t["part"]
    cond = (
        ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 20))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") < 15))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


Q19_SQL = f"""
SELECT COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size <= 10 AND l_quantity >= 10)
   OR (p_brand = 'Brand#3' AND p_size <= 20 AND l_quantity >= 20)
   OR (p_type = 'PROMO' AND l_quantity < 15)
"""


# ---------------------------------------------------------------- correlated IN
def q22_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (semi join on a derived aggregate set): customers in
    the top-decile account balance who placed no 1998 orders."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c, o = t["customer"], t["orders"]
    # threshold = average positive balance (scalar subquery)
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        (dec_to_double(F.sum(F.col("c_acctbal").cast("decimal(25,6)"))) / F.count("c_acctbal")).alias("t")
    )
    rich = c.join(F.broadcast(thresh)).filter(F.col("c_acctbal") > F.col("t"))
    o98 = o.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    out = rich.join(o98, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        out.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"), dsum(F.col("c_acctbal"), "sum_bal"))
        .orderBy("c_mktsegment")
    )


Q22_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_cust, {sql_dsum('c_acctbal', 'sum_bal')}
FROM customer
WHERE c_acctbal > (SELECT (CAST(FLOOR(SUM(CAST(c_acctbal AS DECIMAL(25,6)))) AS DOUBLE) + CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) - FLOOR(SUM(CAST(c_acctbal AS DECIMAL(25,6)))) AS DOUBLE)) / COUNT(c_acctbal)
                   FROM customer WHERE c_acctbal > 0)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

QUERIES["q19_disjunctive_revenue"] = Query(q19_disjunctive_revenue, Q19_SQL, tags=("join", "filter"))
QUERIES["q22_in_subquery"] = Query(q22_in_subquery, Q22_SQL, tags=("join", "subquery"))


# ---------------------------------------------------------------- q7 analog
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral shipping volume between two nations by year — double
    role for the nation dim (supplier vs customer side)."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"])
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") < F.col("cust_nation")))
            & (F.year("l_shipdate").isin(1996, 1997))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("yr"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "yr")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS yr,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name AND year(l_shipdate) IN (1996, 1997)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------- q8 analog
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year share of ASIA-region revenue supplied by one nation —
    conditional-sum ratio over a multi-join."""
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation", "region"]
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("r_name") == "ASIA")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "CHINA", rev).otherwise(F.lit(0.0))
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            (
                dec_to_double(F.sum(target.cast("decimal(25,6)")))
                / dec_to_double(F.sum(rev.cast("decimal(25,6)")))
            ).alias("mkt_share")
        )
        .orderBy("yr")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       (CAST(FLOOR(SUM(CAST(CASE WHEN n2.n_name = 'CHINA'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(25,6)))) AS DOUBLE) + CAST(SUM(CAST(CASE WHEN n2.n_name = 'CHINA'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(25,6))) - FLOOR(SUM(CAST(CASE WHEN n2.n_name = 'CHINA'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(25,6)))) AS DOUBLE))
       / (CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))) AS DOUBLE) + CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) - FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))) AS DOUBLE))
         AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------- q9 analog
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and year (cost modeled from retail price
    — the star schema has no partsupp table)."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier", "nation", "part"])
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.08
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("yr"))
        .agg(dsum(profit, "profit"))
        .orderBy("nation", "yr")
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
       {sql_dsum('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.08', 'profit')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["q7_nation_volume"] = Query(q7_nation_volume, Q7_SQL, tags=("join",))
QUERIES["q8_market_share"] = Query(q8_market_share, Q8_SQL, tags=("join", "agg"))
QUERIES["q9_product_profit"] = Query(q9_product_profit, Q9_SQL, tags=("join", "agg"))


# ------------------------------------------- q13/q15/q21 analogs
# (partsupp is absent from the driver schema, so q2/q11/q16/q20 have no
# faithful analog; q13 drops the o_comment filter and q21 substitutes
# the commit/receipt lateness predicate — both columns absent — with
# ship-lag > 60 days.  The plan shapes are the classic ones.)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + two-level aggregation: distribution of order
    counts per customer (customers with no orders count at 0)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + scalar-max filter: supplier(s) with the maximum revenue in
    1996Q1 — the classic q15 view shape (revenue floor-scaled to exact
    integers so the max-equality join is bit-stable)."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.floor(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(25,6)"
                    )
                )
                * 100
            )
            .cast("long")
            .alias("total_rev_c")
        )
    )
    mx = rev.agg(F.max("total_rev_c").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev_c") == F.col("mx"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_c")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) * 100) AS BIGINT) AS total_rev_c
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_c
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM rev)
ORDER BY s_suppkey
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-correlation exists/not-exists: suppliers whose line items
    shipped >60 days after the order date on multi-supplier orders where
    NO other supplier was late — the q21 shape with ship-lag standing in
    for the absent commit/receipt dates."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier", "nation"])
    l = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60).alias("late"),
        )
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    target = l.filter(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    hits = (
        target.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        hits.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


Q21_SQL = """
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         (datediff('day', o_orderdate, CAST(l_shipdate AS TIMESTAMP)) > 60) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_order AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
  FROM l GROUP BY l_orderkey
),
hits AS (
  SELECT DISTINCT t.l_orderkey, t.l_suppkey
  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late) t
  JOIN per_order p ON p.l_orderkey = t.l_orderkey
  WHERE p.n_supp > 1 AND p.n_late_supp = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM hits JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_name ORDER BY numwait DESC, s_name
"""

QUERIES["q13_customer_distribution"] = Query(q13_customer_distribution, Q13_SQL, tags=("join", "agg"))
QUERIES["q15_top_supplier"] = Query(q15_top_supplier, Q15_SQL, tags=("join", "subquery"))
QUERIES["q21_waiting_supplier"] = Query(q21_waiting_supplier, Q21_SQL, tags=("join", "subquery"))
