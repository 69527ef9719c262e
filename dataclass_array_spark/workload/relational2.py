"""Third coverage wave: embedding-cosine near-dup dedup, Python UDTF
(lateral table function), explicit GROUPING SETS, unpivot/melt, and
approximate sketches (gated exactly via in-query tolerance booleans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataclass_array_spark.operators.similarity import cosine, norm2
from dataclass_array_spark.workload.base import dsum, load_tables, spread, sql_dsum, dec_to_double
from dataclass_array_spark.workload.catalog import Query


# ------------------------------------------ embedding cosine near-dup
_ND_THRESH = 0.45
_ND_SLICE = 400


def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, bounded slice).

    The demonstrated plan is all-pairs on a bounded block (the oracle
    mirrors the slice); the 100 TB path swaps the pair generator for the
    SRP-LSH buckets of operators.similarity and keeps the identical
    exact-cosine verify."""
    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    e = spread(e.filter(F.col("vec_id") < _ND_SLICE)).select(
        "vec_id", "embedding", norm2(F.col("embedding")).alias("n2")
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        cosine(
            F.col("a.embedding"), F.col("b.embedding"), F.col("a.n2"), F.col("b.n2")
        ).alias("cos"),
    )
    return (
        pairs.filter(F.col("cos") >= _ND_THRESH)
        .select("id_a", "id_b", F.floor(F.col("cos") * 1e9).cast("long").alias("cos_e9"))
        .orderBy("id_a", "id_b")
    )


NEARDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id < {_ND_SLICE}
), n AS (
  SELECT vec_id,
         list_reduce(list_prepend(0.0, list_transform(list_zip(v, v),
              p -> p[1]*p[2])), (acc, x) -> acc + x) AS n2
  FROM e
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_reduce(list_prepend(0.0, list_transform(list_zip(a.v, b.v),
              p -> p[1]*p[2])), (acc, x) -> acc + x)
           / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  JOIN n na ON na.vec_id = a.vec_id
  JOIN n nb ON nb.vec_id = b.vec_id
)
SELECT id_a, id_b, CAST(FLOOR(cos * 1e9) AS BIGINT) AS cos_e9
FROM pairs WHERE cos >= {_ND_THRESH} ORDER BY id_a, id_b
"""


# ------------------------------------------ Python UDTF (lateral)
def udtf_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding word bigrams, consumed via LATERAL join —
    the UDTF surface of §2.B.  (Row-at-a-time python: demo of the API,
    not the hot path — the equivalent column-expression form is what the
    dedup operators use.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            toks = [t for t in text.lower().strip().split() if t]
            for i in range(len(toks) - 1):
                yield (toks[i] + " " + toks[i + 1],)

    spark.udtf.register("bigrams", Bigrams)
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    d.createOrReplaceTempView("docs_udtf_in")
    return spark.sql(
        """
        SELECT source, COUNT(DISTINCT bigram) AS n_distinct_bigrams,
               COUNT(*) AS n_bigrams
        FROM docs_udtf_in, LATERAL bigrams(text)
        GROUP BY source ORDER BY source
        """
    )


UDTF_SQL = """
WITH b AS (
  SELECT source, unnest(list_transform(
           generate_series(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM (SELECT source,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t != '') AS toks
        FROM documents)
  WHERE len(toks) >= 2
)
SELECT source, COUNT(DISTINCT bigram) AS n_distinct_bigrams, COUNT(*) AS n_bigrams
FROM b GROUP BY source ORDER BY source
"""


# ------------------------------------------ GROUPING SETS
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping sets (not just rollup/cube prefixes)."""
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    j = t["orders"].join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
    j.createOrReplaceTempView("ord_cust_gs")
    return spark.sql(
        """
        SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(25,6)))) AS DOUBLE)
                 + CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(25,6)))) AS DOUBLE)) AS revenue
        FROM ord_cust_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        ORDER BY segment, priority
        """
    )


GROUPING_SETS_SQL = """
SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(25,6)))) AS DOUBLE)
                 + CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(25,6)))) AS DOUBLE)) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
ORDER BY segment, priority
"""


# ------------------------------------------ unpivot / melt
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, ["part"])["part"]
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


UNPIVOT_SQL = """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
ORDER BY p_partkey, metric
"""


# ------------------------------------------ approximate sketches
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct + approximate quantiles, gated EXACTLY: the sketch
    values are engine-private, so the query also computes the exact
    counterparts in-query and emits ``*_ok`` booleans asserting the
    sketch landed within tolerance.  The oracle recomputes the exact
    columns and asserts the booleans are all TRUE — a failing sketch
    (or a broken exact side) turns the gate red.

    Exact percentiles use the discrete inverted-CDF convention (value at
    1-based rank ceil(p*n), integer arithmetic only) so both engines
    pick the same element — located via a BUCKET HISTOGRAM instead of a
    per-flag global sort: counts per (flag, floor(price)) bucket find
    which bucket holds each target rank, and only that bucket's few
    rows are ranked.  The shuffles carry the ~100k-bucket histogram and
    a few hundred candidate rows — no task ever sorts a full flag
    partition (the previous row_number form funneled each flag's 2M
    sf1 rows through one task's sort).  The sketches themselves remain
    the 100 TB production path (single pass, mergeable partials).

    Plan note: ``countDistinct`` lives in its OWN aggregation, joined
    back on the 3-row key.  Mixing it into the sketch aggregate makes
    Catalyst route ALL the aggregates through the multi-phase distinct
    plan, evaluating the t-digest sketches over the expanded/repeated
    stream — measured 21.1s vs 3.5s at sf0.1 (round-4 regression)."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    approx = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.approx_count_distinct("l_partkey").alias("__ap_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("__ap_p50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("__ap_p95"),
    )
    # two-phase exact distinct: partial agg on (flag, partkey) shrinks the
    # shuffle to the distinct pairs; no Expand, no sketch re-evaluation
    exact_parts = (
        li.groupBy("l_returnflag", "l_partkey")
        .agg(F.lit(1))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("exact_parts"))
    )
    # ---- bucket-locate exact percentiles ----
    hist = li.groupBy(
        "l_returnflag", F.floor("l_extendedprice").alias("b")
    ).agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("prev", F.col("cum") - F.col("cnt"))
    )
    # target 1-based ranks: ceil(n/2)=(n+1) div 2, ceil(19n/20)=(19n+19) div 20
    targets = (
        hist.groupBy("l_returnflag")
        .agg(F.sum("cnt").alias("nn"))
        .select(
            "l_returnflag",
            F.expr(
                "stack(2, 'p50', (nn + 1) div 2, 'p95', (19 * nn + 19) div 20)"
                " as (which, r)"
            ),
        )
    )
    loc = (
        targets.join(h, on="l_returnflag")
        .filter((F.col("r") > F.col("prev")) & (F.col("r") <= F.col("cum")))
        .select(
            "l_returnflag", "which", "b", (F.col("r") - F.col("prev")).alias("local_r")
        )
    )
    cand = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.floor("l_extendedprice").alias("b"),
    ).join(F.broadcast(loc), on=["l_returnflag", "b"])
    wr = Window.partitionBy("l_returnflag", "which").orderBy("price")
    picked = cand.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") == F.col("local_r")
    )
    exact = picked.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("which") == "p50", F.col("price"))).alias("exact_p50"),
        F.max(F.when(F.col("which") == "p95", F.col("price"))).alias("exact_p95"),
    )

    def _ok(approx_col: Column, exact_col: Column, tol: float) -> Column:
        a = approx_col.cast("double")
        e = exact_col.cast("double")
        return F.abs(a - e) <= F.lit(tol) * F.abs(e)

    return (
        approx.join(exact_parts, on="l_returnflag")
        .join(exact, on="l_returnflag")
        .select(
            "l_returnflag",
            "n",
            "exact_parts",
            "exact_p50",
            "exact_p95",
            _ok(F.col("__ap_parts"), F.col("exact_parts"), 0.10).alias("parts_ok"),
            _ok(F.col("__ap_p50"), F.col("exact_p50"), 0.02).alias("p50_ok"),
            _ok(F.col("__ap_p95"), F.col("exact_p95"), 0.02).alias("p95_ok"),
        )
        .orderBy("l_returnflag")
    )


APPROX_SKETCHES_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice AS price,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM lineitem
), pct AS (
  SELECT l_returnflag,
         MAX(CASE WHEN rn = (cnt + 1) // 2 THEN price END) AS exact_p50,
         MAX(CASE WHEN rn = (19 * cnt + 19) // 20 THEN price END) AS exact_p95
  FROM ranked GROUP BY l_returnflag
), agg AS (
  SELECT l_returnflag, COUNT(*) AS n, COUNT(DISTINCT l_partkey) AS exact_parts
  FROM lineitem GROUP BY l_returnflag
)
SELECT a.l_returnflag, a.n, a.exact_parts, p.exact_p50, p.exact_p95,
       TRUE AS parts_ok, TRUE AS p50_ok, TRUE AS p95_ok
FROM agg a JOIN pct p USING (l_returnflag)
ORDER BY a.l_returnflag
"""


QUERIES = {
    "dedup_embedding_neardup": Query(dedup_embedding_neardup, NEARDUP_SQL, tags=("dedup", "similarity")),
    "udtf_bigram_counts": Query(udtf_bigram_counts, UDTF_SQL, tags=("udtf",)),
    "grouping_sets_revenue": Query(grouping_sets_revenue, GROUPING_SETS_SQL, tags=("agg",)),
    "unpivot_part_metrics": Query(unpivot_part_metrics, UNPIVOT_SQL, tags=("reshape",)),
    "approx_sketches": Query(approx_sketches, APPROX_SKETCHES_SQL, tags=("agg", "approx")),
}


# ------------------------------------------ salted aggregation (skew path)
def salted_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation — identical results to a plain
    groupBy (decimal sums are association-safe), demonstrated against
    the same single-stage oracle.  The skew tool for hot grouping keys
    (l_returnflag has only 3 values → maximal key skew)."""
    from dataclass_array_spark.operators.skew import salted_sum

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    out = salted_sum(
        li,
        ["l_returnflag"],
        {
            "sum_qty": F.col("l_quantity").cast("decimal(25,6)"),
            "sum_price": F.col("l_extendedprice").cast("decimal(25,6)"),
        },
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        dec_to_double(F.col("sum_qty")).alias("sum_qty"),
        dec_to_double(F.col("sum_price")).alias("sum_price"),
        "n_rows",
    ).orderBy("l_returnflag")


SALTED_SQL = f"""
SELECT l_returnflag,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_price')},
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

QUERIES["salted_revenue_by_flag"] = Query(salted_revenue_by_flag, SALTED_SQL, tags=("agg", "skew"))


# ------------------------------------------ ntile quantile bucketing
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) over order prices per market segment + per-bucket agg."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    j = t["orders"].join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    return (
        j.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("c_mktsegment", "quartile")
        .agg(F.count("*").alias("n"), dsum(F.col("o_totalprice"), "sum_price"))
        .orderBy("c_mktsegment", "quartile")
    )


NTILE_SQL = f"""
SELECT c_mktsegment, quartile, COUNT(*) AS n, {sql_dsum('o_totalprice', 'sum_price')}
FROM (
  SELECT c_mktsegment, o_totalprice,
         NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY o_totalprice, o_orderkey) AS quartile
  FROM orders JOIN customer ON o_custkey = c_custkey
)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------ exact moments: corr / covar
def corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + covariance of price vs quantity per
    returnflag — assembled from exact decimal moments (sums of x, y, xy,
    x², y²) so both engines compute identical doubles; built-in corr()
    implementations differ numerically across engines."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    dec = lambda c: c.cast("decimal(30,8)")

    def dbl(c):
        # decimal→double via floor-split: DuckDB's direct cast double-
        # rounds once the scaled int exceeds 2^53; floor+frac parts are
        # each exactly convertible, and fl(a+b) matches across engines
        f = F.floor(c)
        return f.cast("double") + (c - f).cast("double")

    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dbl(F.sum(dec(x))).alias("sx"),
        dbl(F.sum(dec(y))).alias("sy"),
        dbl(F.sum(dec(x * y))).alias("sxy"),
        dbl(F.sum(dec(x * x))).alias("sxx"),
        dbl(F.sum(dec(y * y))).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "l_returnflag", "n", cov.alias("covar"), corr.alias("pearson")
    ).orderBy("l_returnflag")


CORR_SQL = """
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
         (CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(30,8)))) AS DOUBLE) + CAST((SUM(CAST(l_extendedprice AS DECIMAL(30,8)))) - FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(30,8)))) AS DOUBLE)) AS sx,
         (CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(30,8)))) AS DOUBLE) + CAST((SUM(CAST(l_quantity AS DECIMAL(30,8)))) - FLOOR(SUM(CAST(l_quantity AS DECIMAL(30,8)))) AS DOUBLE)) AS sy,
         (CAST(FLOOR(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,8)))) AS DOUBLE) + CAST((SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,8)))) - FLOOR(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,8)))) AS DOUBLE)) AS sxy,
         (CAST(FLOOR(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8)))) AS DOUBLE) + CAST((SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8)))) - FLOOR(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8)))) AS DOUBLE)) AS sxx,
         (CAST(FLOOR(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,8)))) AS DOUBLE) + CAST((SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,8)))) - FLOOR(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,8)))) AS DOUBLE)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (sxy - sx*sy/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS covar,
       (CAST(n AS DOUBLE)*sxy - sx*sy)
         / (sqrt(CAST(n AS DOUBLE)*sxx - sx*sx) * sqrt(CAST(n AS DOUBLE)*syy - sy*sy)) AS pearson
FROM m ORDER BY l_returnflag
"""


# ------------------------------------------ PII scrub (text pipeline)
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masking pass: digits → '#', long hex tokens → '<HEX>' — the shape
    of a PII/dedup-safe normalization stage; verified by md5 of the
    scrubbed text."""
    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("text"), "[0-9]", "#"),
        "\\b[a-f#]{16,}\\b",
        "<HEX>",
    )
    return d.select(
        "doc_id",
        F.md5(scrub).alias("scrubbed_md5"),
        (F.length(F.col("text")) - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))).cast("long").alias("n_digits"),
    ).orderBy("doc_id")


PII_SQL = """
SELECT doc_id,
       md5(regexp_replace(regexp_replace(text, '[0-9]', '#', 'g'),
                          '\\b[a-f#]{16,}\\b', '<HEX>', 'g')) AS scrubbed_md5,
       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits
FROM documents ORDER BY doc_id
"""

QUERIES["ntile_price_quartiles"] = Query(ntile_price_quartiles, NTILE_SQL, tags=("window",))
QUERIES["corr_price_quantity"] = Query(corr_price_quantity, CORR_SQL, tags=("agg", "stats"))
QUERIES["pii_scrub_docs"] = Query(pii_scrub_docs, PII_SQL, tags=("text",))


# ------------------------------------------ MERGE / upsert emulation
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: recompute acctbal for customers with 1998
    orders (update set) and upsert into the dimension — updates win,
    unmatched rows survive."""
    from dataclass_array_spark.operators.merge import upsert

    t = load_tables(spark, sf_dir, ["customer", "orders"])
    spent = (
        t["orders"]
        .filter(F.year("o_orderdate") == 1998)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("spent98"))
    )
    updates = (
        t["customer"]
        .join(spent, on="c_custkey")
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            (F.col("c_acctbal") - F.col("spent98")).alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    merged = upsert(t["customer"], updates, keys=["c_custkey"])
    return merged.select("c_custkey", "c_acctbal").orderBy("c_custkey")


MERGE_SQL = """
WITH spent AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS spent98
  FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey
), updates AS (
  SELECT c.c_custkey, c.c_acctbal - s.spent98 AS c_acctbal
  FROM customer c JOIN spent s USING (c_custkey)
)
SELECT c_custkey, c_acctbal FROM customer
WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
UNION ALL
SELECT c_custkey, c_acctbal FROM updates
ORDER BY c_custkey
"""


# ------------------------------------------ exact median (portable)
def median_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median via a VALUE HISTOGRAM: aggregate counts per (flag,
    quantity), then locate the two middle positions in the tiny
    cumulative histogram.  Engine median() implementations differ in
    interpolation; the two-middle-rows convention cannot.

    Scale shape: the shuffle carries one row per DISTINCT (flag, value)
    pair — ~50 quantities × 3 flags — with map-side partial counts; the
    windows then run over that tiny histogram.  The naive row_number
    formulation sorts each flag's entire partition in ONE task (2M rows
    per flag at sf1, 12.7 s; this form is ~1 s and is the shape that
    survives 100 TB).  Arithmetic is bit-identical to the oracle's
    middle-rows form: a middle value covered twice gets weight 2, and
    ``double(2v)/2 == double(v)/1`` exactly (scaling by 2 is exact in
    binary; the decimal sum is order-free)."""
    from pyspark.sql import Window

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    hist = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    h = (
        hist.select(
            "l_returnflag",
            "l_quantity",
            "cnt",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt").over(wall).alias("n"),
        )
        .withColumn("prev", F.col("cum") - F.col("cnt"))
        # 1-based middle positions: odd n → both equal (n+1)/2
        .withColumn("p1", F.expr("(n + 1) div 2"))
        .withColumn("p2", F.expr("(n + 2) div 2"))
    )
    in_range = lambda p: (p > F.col("prev")) & (p <= F.col("cum"))  # noqa: E731
    mid = h.withColumn(
        "w",
        F.when(in_range(F.col("p1")), 1).otherwise(0)
        + F.when(in_range(F.col("p2")), 1).otherwise(0),
    ).filter(F.col("w") > 0)
    return (
        mid.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(25,6)") * F.col("w")).cast("double")
                / F.sum("w")
            ).alias("median_qty")
        )
        .orderBy("l_returnflag")
    )


MEDIAN_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
), mid AS (
  SELECT * FROM ranked
  WHERE rn*2 = n OR rn*2 = n + 1 OR rn*2 = n + 2
)
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS median_qty
FROM mid GROUP BY l_returnflag ORDER BY l_returnflag
"""

QUERIES["merge_upsert_customers"] = Query(merge_upsert_customers, MERGE_SQL, tags=("merge", "cdc"))
QUERIES["median_quantity_by_flag"] = Query(median_quantity_by_flag, MEDIAN_SQL, tags=("agg", "stats"))


# ------------------------------------------ array aggregation + functions
def order_quantity_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with deterministic order (collect_list is
    unordered — sort structs then project) + array function passthrough
    (size/slice/contains/reverse).  All array ops run on the real
    ArrayType column inside Catalyst; only the OUTPUT is serialized to a
    CSV string, because the driver's pandas canonicalizer sorts columns
    and ndarray cells are unhashable.  l_quantity is all-whole doubles,
    so the BIGINT element cast is lossless and formatting-stable across
    engines."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    arr = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col("l_linenumber"), F.col("l_quantity")))
        ),
        lambda s: s.getField("l_quantity"),
    )
    g = (
        li.filter(F.col("l_orderkey") <= 200)
        .groupBy("l_orderkey")
        .agg(arr.alias("qtys_arr"))
    )

    def ser(col):
        return F.array_join(F.transform(col, lambda x: x.cast("long").cast("string")), ",")

    return g.select(
        "l_orderkey",
        ser(F.col("qtys_arr")).alias("qtys"),
        F.size("qtys_arr").cast("long").alias("n_items"),
        ser(F.slice("qtys_arr", 1, 2)).alias("first2"),
        ser(F.reverse("qtys_arr")).alias("rev"),
        F.array_contains("qtys_arr", 24.0).alias("has_24"),
    ).orderBy("l_orderkey")


ARRAYS_SQL = """
WITH g AS (
  SELECT l_orderkey, list(l_quantity ORDER BY l_linenumber, l_quantity) AS qtys_arr
  FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey
)
SELECT l_orderkey,
       array_to_string(list_transform(qtys_arr, x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') AS qtys,
       CAST(len(qtys_arr) AS BIGINT) AS n_items,
       array_to_string(list_transform(qtys_arr[1:2], x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') AS first2,
       array_to_string(list_transform(list_reverse(qtys_arr), x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') AS rev,
       list_contains(qtys_arr, 24.0) AS has_24
FROM g ORDER BY l_orderkey
"""

QUERIES["order_quantity_arrays"] = Query(order_quantity_arrays, ARRAYS_SQL, tags=("agg", "array"))


# ------------------------------------------ outer join variants + null handling
def join_variants_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (customers without orders × orphan check) with
    explicit null-handling functions (coalesce/nullif) — the join types
    and null semantics not covered by the inner/semi/anti queries."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    o97 = t["orders"].filter(F.year("o_orderdate") == 1997)
    j = t["customer"].join(o97, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
    return (
        j.select(
            F.coalesce(F.col("c_mktsegment"), F.lit("NO_CUSTOMER")).alias("segment"),
            F.when(F.col("o_orderkey").isNull(), 0).otherwise(1).alias("has_order"),
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_non_open"),
        )
        .groupBy("segment", "has_order")
        .agg(
            F.count("*").alias("n"),
            F.count("status_non_open").alias("n_non_open"),
        )
        .orderBy("segment", "has_order")
    )


JOIN_VARIANTS_SQL = """
SELECT COALESCE(c_mktsegment, 'NO_CUSTOMER') AS segment,
       CASE WHEN o_orderkey IS NULL THEN 0 ELSE 1 END AS has_order,
       COUNT(*) AS n,
       COUNT(NULLIF(o_orderstatus, 'O')) AS n_non_open
FROM customer FULL OUTER JOIN
     (SELECT * FROM orders WHERE year(o_orderdate) = 1997) o
     ON c_custkey = o_custkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------ string function depth
def string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string wave: pad/translate/repeat/left/right/position —
    all JVM codegen, verified portable."""
    p = load_tables(spark, sf_dir, ["part"])["part"]
    n = F.col("p_name")
    return (
        p.filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.lpad(F.col("p_brand"), 12, "*").alias("brand_lpad"),
            F.rpad(F.col("p_type"), 10, ".").alias("type_rpad"),
            F.translate(n, "aeiou", "AEIOU").alias("name_vowels"),
            F.repeat(F.substring(n, 1, 2), 3).alias("rep2x3"),
            F.substring(n, 1, 4).alias("left4"),
            n.substr(F.length(n) - 3, F.lit(4)).alias("right4"),
            F.instr(n, "a").cast("long").alias("first_a"),
        )
        .orderBy("p_partkey")
    )


STRING2_SQL = """
SELECT p_partkey,
       lpad(p_brand, 12, '*') AS brand_lpad,
       rpad(p_type, 10, '.') AS type_rpad,
       translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
       repeat(substr(p_name, 1, 2), 3) AS rep2x3,
       substr(p_name, 1, 4) AS left4,
       substr(p_name, length(p_name) - 3, 4) AS right4,
       CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
FROM part WHERE p_partkey <= 100 ORDER BY p_partkey
"""

QUERIES["join_variants_nulls"] = Query(join_variants_nulls, JOIN_VARIANTS_SQL, tags=("join", "null"))
QUERIES["string_functions2"] = Query(string_functions2, STRING2_SQL, tags=("scalar",))


# ------------------------------------------------ SCD-2 history (round 8)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension maintenance: customers with 1998 orders get a
    NEW current version carrying their recomputed balance; their prior
    version row is kept but CLOSED (is_current = false); untouched
    customers keep version 1 current.  One left-semi/anti split + a
    broadcast max-version join — never a full-dimension rewrite
    shuffle."""
    from dataclass_array_spark.operators.merge import scd2_close

    t = load_tables(spark, sf_dir, ["customer", "orders"])
    target = t["customer"].select(
        "c_custkey", "c_acctbal",
        F.lit(1).cast("long").alias("version"),
        F.lit(True).alias("is_current"),
    )
    spent = (
        t["orders"]
        .filter(F.year("o_orderdate") == 1998)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double").alias("spent98")
        )
    )
    updates = (
        t["customer"]
        .join(spent, on="c_custkey")
        .select(
            "c_custkey",
            (F.col("c_acctbal") - F.col("spent98")).alias("c_acctbal"),
            F.lit(0).cast("long").alias("version"),   # reassigned inside
            F.lit(True).alias("is_current"),
        )
    )
    out = scd2_close(target, updates, keys=["c_custkey"])
    return out.select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 1e6).cast("long").alias("acctbal_e6"),
        "version",
        "is_current",
    ).orderBy("c_custkey", "version")


SCD2_SQL = """
WITH spent AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS spent98
  FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey
), upd AS (
  SELECT c.c_custkey, c.c_acctbal - s.spent98 AS c_acctbal
  FROM customer c JOIN spent s USING (c_custkey)
), untouched AS (
  SELECT c_custkey, c_acctbal, CAST(1 AS BIGINT) AS version, TRUE AS is_current
  FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
), closed AS (
  SELECT c_custkey, c_acctbal, CAST(1 AS BIGINT) AS version, FALSE AS is_current
  FROM customer WHERE c_custkey IN (SELECT c_custkey FROM upd)
), fresh AS (
  SELECT c_custkey, c_acctbal, CAST(2 AS BIGINT) AS version, TRUE AS is_current
  FROM upd
)
SELECT c_custkey, CAST(FLOOR(c_acctbal * 1e6) AS BIGINT) AS acctbal_e6,
       version, is_current
FROM (SELECT * FROM untouched UNION ALL SELECT * FROM closed
      UNION ALL SELECT * FROM fresh)
ORDER BY c_custkey, version
"""

QUERIES["scd2_customer_history"] = Query(
    scd2_customer_history, SCD2_SQL, tags=("merge", "cdc", "scd2")
)


# ------------------------------------------ Z-order layout key
def zorder_orders_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (o_custkey, order day) —
    the multi-dimensional data-layout operator (operators/layout.py):
    files written along this key carry tight min/max parquet stats in
    BOTH dimensions, so selective customer+date scans prune instead of
    reading everything.  The gate verifies the key computation
    (integer bit interleave + mirrored double min-max scaling) value-
    exactly; the file-skipping effect itself is asserted by
    tests/test_layout.py's bounding-box measurement."""
    from dataclass_array_spark.operators.layout import zorder_key

    o = load_tables(spark, sf_dir, ["orders"])["orders"].withColumn(
        "_day",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1992-01-01"))
        ),
    )
    key, _bounds = zorder_key(o, ["o_custkey", "_day"], bits=16)
    # no orderBy: the correctness gate's value hash is order-
    # insensitive, and a total sort of the full orders table would
    # dominate the gate's cost at sf1 (measured 9.7 -> ~2 s)
    return o.select(F.col("o_orderkey"), key.alias("zkey"))


def _zorder_oracle() -> str:
    # scaling built via layout.scale_sql_dyn so the span<=0 guard
    # (constant column -> 0, not NULL) stays mirrored with scale_expr
    from dataclass_array_spark.operators.layout import morton_sql, scale_sql_dyn

    day = "datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    return f"""
WITH b AS (
  SELECT MIN(o_custkey) AS cmn, MAX(o_custkey) AS cmx,
         MIN({day}) AS dmn, MAX({day}) AS dmx
  FROM orders
), s AS (
  SELECT o_orderkey,
         {scale_sql_dyn("o_custkey", "b.cmn", "b.cmx", 16)} AS s0,
         {scale_sql_dyn(day, "b.dmn", "b.dmx", 16)} AS s1
  FROM orders, b
)
SELECT o_orderkey, {morton_sql(["s0", "s1"], 16)} AS zkey
FROM s ORDER BY o_orderkey
"""


QUERIES["zorder_orders_layout"] = Query(
    zorder_orders_layout, _zorder_oracle(), tags=("layout", "zorder")
)


# ------------------------------------------ Hilbert layout key
def hilbert_orders_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over (o_custkey, order day) — the
    better-locality sibling of the Z-order gate (consecutive curve
    positions are adjacent cells, so range-partition files get tighter
    bounding boxes).  Uses the chained-projection form
    (``with_hilbert_key``): each of the 13 levels is a codegen'd
    projection with the state in locals — the nested-expression form's
    per-row HOF allocations cost 3.2 s vs ~1.2 s here at sf0.1
    (PERF.md round 10).  Scaling mirrored into the oracle; the key
    itself is value-exact cross-engine."""
    from dataclass_array_spark.operators.layout import scale_expr, with_hilbert_key

    o = load_tables(spark, sf_dir, ["orders"])["orders"].withColumn(
        "_day",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1992-01-01"))
        ),
    )
    # one bounds aggregate (two BIGINTs per column of driver state),
    # then the scaled coordinates feed the Hilbert fold
    aggs = [
        F.min("o_custkey").cast("long"), F.max("o_custkey").cast("long"),
        F.min("_day").cast("long"), F.max("_day").cast("long"),
    ]
    r = o.agg(*aggs).collect()[0]
    sx = scale_expr(F.col("o_custkey"), r[0], r[1], _HILBERT_BITS)
    sy = scale_expr(F.col("_day"), r[2], r[3], _HILBERT_BITS)
    return with_hilbert_key(o, sx, sy, _HILBERT_BITS).select("o_orderkey", "hkey")


_HILBERT_BITS = 13


def _hilbert_oracle() -> str:
    # scaling built via layout.scale_sql_dyn so the span<=0 guard
    # (constant column -> 0, not NULL) stays mirrored with scale_expr
    from dataclass_array_spark.operators.layout import hilbert_sql, scale_sql_dyn

    day = "datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    sx = scale_sql_dyn("o_custkey", "(SELECT MIN(o_custkey) FROM orders)",
                       "(SELECT MAX(o_custkey) FROM orders)", _HILBERT_BITS)
    sy = scale_sql_dyn(day, f"(SELECT MIN({day}) FROM orders)",
                       f"(SELECT MAX({day}) FROM orders)", _HILBERT_BITS)
    return hilbert_sql(sx, sy, _HILBERT_BITS, "FROM orders", "o_orderkey")


QUERIES["hilbert_orders_layout"] = Query(
    hilbert_orders_layout, _hilbert_oracle(), tags=("layout", "hilbert")
)


def hilbert3d_orders_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-DIMENSIONAL Hilbert clustering key over (o_custkey, order day,
    o_orderkey) — the k>2 case the 2-d walk couldn't cover (it had to
    fall back to Morton before round 11).  Skilling transpose
    construction (``with_hilbert_key_kd``), unrolled into one codegen
    stage of chained projections; 13 bits × 3 dims = 39-bit key.  At
    100 TB this is the layout for a table filtered on any of customer,
    date, or key ranges at once: range-partition files get tight
    3-d bounding boxes, so parquet min/max pruning works per-file for
    every keyed column."""
    from dataclass_array_spark.operators.layout import (
        scale_expr,
        with_hilbert_key_kd,
    )

    o = load_tables(spark, sf_dir, ["orders"])["orders"].withColumn(
        "_day",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1992-01-01"))
        ),
    )
    aggs = []
    for c in ("o_custkey", "_day", "o_orderkey"):
        aggs += [F.min(c).cast("long"), F.max(c).cast("long")]
    r = o.agg(*aggs).collect()[0]
    scaled = [
        scale_expr(F.col(c), r[2 * i], r[2 * i + 1], _HILBERT_BITS)
        for i, c in enumerate(("o_custkey", "_day", "o_orderkey"))
    ]
    return with_hilbert_key_kd(o, scaled, _HILBERT_BITS).select(
        "o_orderkey", "hkey"
    )


def _hilbert3d_oracle() -> str:
    from dataclass_array_spark.operators.layout import (
        hilbert_kd_sql,
        scale_sql_dyn,
    )

    day = "datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    scaled = [
        scale_sql_dyn(e, f"(SELECT MIN({e}) FROM orders)",
                      f"(SELECT MAX({e}) FROM orders)", _HILBERT_BITS)
        for e in ("o_custkey", day, "o_orderkey")
    ]
    return hilbert_kd_sql(scaled, _HILBERT_BITS, "FROM orders", "o_orderkey")


QUERIES["hilbert3d_orders_layout"] = Query(
    hilbert3d_orders_layout, _hilbert3d_oracle(), tags=("layout", "hilbert")
)


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimation via the PORTABLE
    HyperLogLog (operators/sketch.py): md5-derived buckets + integer
    leading-zero ranks + a bucket-ordered harmonic fold, so the oracle
    replays the ESTIMATE bit-for-bit — unlike `approx_sketches`, which
    can only tolerance-check Spark's engine-private HLL.  Exact
    distinct counts ride along for the accuracy story (and make the
    gate's join observable)."""
    from dataclass_array_spark.operators.sketch import hll_distinct

    e = load_tables(spark, sf_dir, ["events"])["events"]
    est = hll_distinct(e, ["event_type"], "user_id", b=8)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return (
        exact.join(est, "event_type")
        .select("event_type", "n_exact", "n_buckets_used", "est")
        .orderBy("event_type")
    )


def _hll_oracle() -> str:
    from dataclass_array_spark.operators.sketch import hll_sql

    inner = hll_sql("events", ["event_type"], "user_id", b=8)
    return f"""
WITH exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
),
hll AS ({inner})
SELECT e.event_type, e.n_exact, h.n_buckets_used, h.est
FROM exact e JOIN hll h USING (event_type)
ORDER BY e.event_type
"""


QUERIES["hll_distinct_users"] = Query(
    hll_distinct_users, _hll_oracle(), tags=("sketch", "approx")
)


_BLOOM_BITS = 1 << 20
_BLOOM_K = 5
_BLOOM_PRICE = 400000.0


def bloom_filter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter of the high-value order keys, probed with
    EVERY order key — per-key ``in_bloom`` / ``actually_in`` / ``is_fp``
    columns, all deterministic (md5-universal bit positions), so the
    oracle replays the filter bit-for-bit and the gate hash-checks the
    no-false-negative guarantee (actually_in → in_bloom) on every row.
    The 100 TB shape: ship the ≤ n_bits-row position table in place of
    a multi-million-key semi-join build side (Spark's runtime bloom
    join injects the same idea automatically; this explicit operator is
    for persisted/shipped/merged filters)."""
    from dataclass_array_spark.operators.sketch import bloom_build, bloom_probe

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    s = o.filter(F.col("o_totalprice") > _BLOOM_PRICE).select(
        F.col("o_orderkey").alias("key")
    )
    bloom = bloom_build(s, "key", n_bits=_BLOOM_BITS, k=_BLOOM_K)
    probes = o.select(F.col("o_orderkey").alias("key")).distinct()
    r = bloom_probe(bloom, probes, "key", n_bits=_BLOOM_BITS, k=_BLOOM_K)
    actual = s.distinct().withColumn("__in", F.lit(True))
    return (
        r.join(actual, "key", "left")
        .select(
            F.col("key").alias("o_orderkey"),
            "in_bloom",
            F.coalesce(F.col("__in"), F.lit(False)).alias("actually_in"),
            (F.col("in_bloom") & ~F.coalesce(F.col("__in"), F.lit(False))).alias(
                "is_fp"
            ),
        )
        .orderBy("o_orderkey")
    )


def _bloom_oracle() -> str:
    from dataclass_array_spark.operators.sketch import _CM_P, _cm_constants

    A, B = _cm_constants(_BLOOM_K)
    cons = ", ".join(f"({j}, {A[j]}, {B[j]})" for j in range(_BLOOM_K))
    h = "CAST(('0x'||substr(md5(CAST(key AS VARCHAR)),1,8)) AS BIGINT)"
    pos = f"(({h} * c.a + c.b) % {_CM_P}) % {_BLOOM_BITS}"
    return f"""
WITH cons AS (SELECT * FROM (VALUES {cons}) v(j, a, b)),
s AS (SELECT o_orderkey AS key FROM orders WHERE o_totalprice > {_BLOOM_PRICE!r}),
bloom AS (SELECT DISTINCT {pos} AS pos FROM s CROSS JOIN cons c),
probes AS (SELECT DISTINCT o_orderkey AS key FROM orders),
pp AS (SELECT DISTINCT key, {pos} AS pos FROM probes CROSS JOIN cons c),
agg AS (
  SELECT key, COUNT(*) = COUNT(b.pos) AS in_bloom
  FROM pp LEFT JOIN bloom b USING (pos) GROUP BY key
),
sd AS (SELECT DISTINCT key FROM s)
SELECT a.key AS o_orderkey, a.in_bloom,
       (sd.key IS NOT NULL) AS actually_in,
       (a.in_bloom AND sd.key IS NULL) AS is_fp
FROM agg a LEFT JOIN sd ON sd.key = a.key
ORDER BY o_orderkey
"""


QUERIES["bloom_filter_orders"] = Query(
    bloom_filter_orders, _bloom_oracle(), tags=("sketch", "filter")
)


_HIST_NB = 4096
_HIST_PS = [0.5, 0.95]


def hist_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag p50/p95 price estimates from the SHIPPABLE
    histogram quantile sketch (fixed-width buckets over one min/max
    bounds pass; shard histograms merge by cell-SUM) — deterministic,
    so the oracle rebuilds the histogram AND the estimates
    bit-for-bit, unlike `approx_sketches`' engine-private t-digest
    which can only be tolerance-checked.  Estimate error is bounded by
    one bucket width; the unit test pins it against exact numpy
    percentiles."""
    from dataclass_array_spark.operators.sketch import hist_build, hist_quantiles

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    r = li.agg(
        F.min(F.col("l_extendedprice").cast("double")),
        F.max(F.col("l_extendedprice").cast("double")),
    ).collect()[0]
    lo, hi = float(r[0]), float(r[1])
    h = hist_build(li, ["l_returnflag"], "l_extendedprice", lo, hi, _HIST_NB)
    return hist_quantiles(
        h, ["l_returnflag"], _HIST_PS, lo, hi, _HIST_NB
    ).orderBy("l_returnflag")


def _hist_quantiles_oracle() -> str:
    nb = _HIST_NB
    x = "CAST(l_extendedprice AS DOUBLE)"
    bucket = (
        f"LEAST({nb - 1}, GREATEST(0, CAST(FLOOR(({x} - b.lo) * {float(nb)!r} "
        f"/ (b.hi - b.lo)) AS BIGINT)))"
    )
    picks = []
    for p in _HIST_PS:
        tag = f"p{int(p * 100)}_est"
        picks.append(f"""
, r{tag} AS (
  SELECT l_returnflag, MIN(bucket) AS bkt
  FROM cumh
  WHERE cum >= CAST(CEIL({float(p)!r} * CAST(n AS DOUBLE)) AS BIGINT)
  GROUP BY l_returnflag
), v{tag} AS (
  SELECT r.l_returnflag,
         b.lo + (CAST(r.bkt AS DOUBLE) + 0.5) * ((b.hi - b.lo) / {float(nb)!r})
           AS {tag}
  FROM r{tag} r CROSS JOIN bnd b
)""")
    sel = ", ".join(f"v{ f'p{int(p*100)}_est' }.p{int(p*100)}_est" for p in _HIST_PS)
    joins = " ".join(
        f"JOIN vp{int(p*100)}_est ON vp{int(p*100)}_est.l_returnflag = t.l_returnflag"
        for p in _HIST_PS
    )
    return f"""
WITH bnd AS (
  SELECT MIN({x}) AS lo, MAX({x}) AS hi FROM lineitem
),
h AS (
  SELECT l_returnflag, {bucket} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem CROSS JOIN bnd b
  GROUP BY l_returnflag, {bucket}
),
tot AS (SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS n FROM h GROUP BY l_returnflag),
cumh AS (
  SELECT h.l_returnflag, h.bucket,
         SUM(h.cnt) OVER (PARTITION BY h.l_returnflag ORDER BY h.bucket) AS cum,
         t.n
  FROM h JOIN tot t ON t.l_returnflag = h.l_returnflag
){"".join(picks)}
SELECT t.l_returnflag, t.n, {sel}
FROM tot t {joins}
ORDER BY t.l_returnflag
"""


QUERIES["hist_quantiles_prices"] = Query(
    hist_quantiles_prices, _hist_quantiles_oracle(), tags=("sketch", "approx")
)


def hll_overlap_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation: distinct users who CLICK vs who
    PURCHASE, their union and intersection — the union estimated from
    the (bucket-MAX) merged sketch (exact at the sketch level:
    HLL(A∪B) == max-merge of the shard sketches), the intersection by
    inclusion-exclusion.  Exact counts ride along.  Everything is the
    portable HLL, so the oracle replays all four estimates
    bit-for-bit — at 100 TB this answers overlap questions from three
    256-row sketches instead of a distinct-join over the corpus."""
    from dataclass_array_spark.operators.sketch import (
        hll_distinct,
        hll_intersect_estimate,
    )

    e = load_tables(spark, sf_dir, ["events"])["events"]

    def side(pred):
        return e.filter(pred).select(
            F.lit("all").alias("tag"), F.col("user_id")
        )

    clicks = side(F.col("event_type") == "click")
    purch = side(F.col("event_type") == "purchase")
    both_src = clicks.unionByName(purch)
    ea = hll_distinct(clicks, ["tag"], "user_id", b=8).select(
        "tag", F.col("est").alias("est_click")
    )
    eb = hll_distinct(purch, ["tag"], "user_id", b=8).select(
        "tag", F.col("est").alias("est_purchase")
    )
    eu = hll_distinct(both_src, ["tag"], "user_id", b=8).select(
        "tag", F.col("est").alias("est_union")
    )
    cu = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    pu = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = spark.createDataFrame([("all",)], "tag string").crossJoin(
        F.broadcast(
            cu.agg(F.count("*").cast("long").alias("n_click")).crossJoin(
                pu.agg(F.count("*").cast("long").alias("n_purchase"))
            ).crossJoin(
                cu.join(pu, "user_id").agg(
                    F.count("*").cast("long").alias("n_both")
                )
            )
        )
    )
    out = exact.join(ea, "tag").join(eb, "tag").join(eu, "tag")
    return out.select(
        "n_click",
        "n_purchase",
        "n_both",
        "est_click",
        "est_purchase",
        "est_union",
        hll_intersect_estimate(
            F.col("est_click"), F.col("est_purchase"), F.col("est_union")
        ).alias("est_intersect"),
    )


def _hll_overlap_oracle() -> str:
    from dataclass_array_spark.operators.sketch import hll_sql

    def src(pred: str) -> str:
        return f"(SELECT 'all' AS tag, user_id FROM events WHERE {pred})"

    a = hll_sql(src("event_type = 'click'"), ["tag"], "user_id", b=8)
    b = hll_sql(src("event_type = 'purchase'"), ["tag"], "user_id", b=8)
    u = hll_sql(
        "(SELECT 'all' AS tag, user_id FROM events WHERE event_type = 'click' "
        "UNION ALL "
        "SELECT 'all' AS tag, user_id FROM events WHERE event_type = 'purchase')",
        ["tag"], "user_id", b=8,
    )
    return f"""
WITH ea AS ({a}), eb AS ({b}), eu AS ({u}),
cu AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
pu AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
exact AS (
  SELECT CAST((SELECT COUNT(*) FROM cu) AS BIGINT) AS n_click,
         CAST((SELECT COUNT(*) FROM pu) AS BIGINT) AS n_purchase,
         CAST((SELECT COUNT(*) FROM cu JOIN pu USING (user_id)) AS BIGINT)
           AS n_both
)
SELECT e.n_click, e.n_purchase, e.n_both,
       ea.est AS est_click, eb.est AS est_purchase, eu.est AS est_union,
       (ea.est + eb.est) - eu.est AS est_intersect
FROM exact e CROSS JOIN ea CROSS JOIN eb CROSS JOIN eu
"""


QUERIES["hll_overlap_users"] = Query(
    hll_overlap_users, _hll_overlap_oracle(), tags=("sketch", "approx", "setops")
)
