"""Similarity search over embedding columns (``array<float>``).

- ``cosine``: cross-engine-deterministic cosine via a SEQUENTIAL double
  fold (Spark's ``aggregate`` and DuckDB's ``list_reduce`` both fold
  left-to-right in index order, so the IEEE sums are bit-identical —
  verified with order-sensitive adversarial inputs).  ~10× faster than
  the decimal-accumulator alternative (no per-element BigDecimal).
- ``brute_force_topk``: broadcast the (small) query set against the full
  corpus — the exact baseline.  At 100 TB the corpus side stays
  partitioned; the only data movement is the broadcast of queries and
  the per-partition top-k combine (WindowGroupLimit / partial top-k).
- ``srp_lsh_topk``: signed-random-projection LSH — hyperplanes derived
  deterministically from md5 so results are reproducible.  Bucketing
  turns the cross join into an equi-join on the signature; the scale
  path when the query set is itself huge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,25)"


def _exact_dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] as a sequential left-to-right double fold — identical
    in DuckDB via ``list_reduce(list_prepend(0.0, products), +)``."""
    prods = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(v: Column) -> Column:
    return _exact_dot(v, v)


def cosine(a: Column, b: Column, na2: Column, nb2: Column) -> Column:
    """cos(a,b) given precomputed squared norms."""
    return _exact_dot(a, b) / (F.sqrt(na2) * F.sqrt(nb2))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × partitioned corpus.

    Norms are computed once per side before the join (column pruning
    keeps the corpus scan at two columns)."""
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qv"),
        norm2(F.col(vec_col)).alias("qn2"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("nid"),
        F.col(vec_col).alias("cv"),
        norm2(F.col(vec_col)).alias("cn2"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            cosine(F.col("qv"), F.col("cv"), F.col("qn2"), F.col("cn2")).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cosine")
        .orderBy("qid", "rank")
    )


def _srp_signs(p: int, dim: int) -> list[float]:
    """±1 hyperplane components from md5 parity — computed ONCE on the
    driver (they are data-independent constants) and inlined as a
    literal array, instead of per-row md5 evaluation."""
    import hashlib

    return [
        float((ord(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0]) % 2) * 2 - 1)
        for d in range(dim)
    ]


def srp_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Signed-random-projection signature: deterministic md5-derived
    hyperplanes, engine-portable and reproducible across runs."""

    def plane_dot(p: int) -> Column:
        signs = F.lit(_srp_signs(p, dim))
        return F.aggregate(
            F.zip_with(vec.cast("array<double>"), signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bits = [
        F.when(plane_dot(p) > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        for p in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def srp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share the SRP bucket (equi-join on
    the signature — a plain hash shuffle instead of a cross join)."""
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qv"),
        norm2(F.col(vec_col)).alias("qn2"),
        srp_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("nid"),
        F.col(vec_col).alias("cv"),
        norm2(F.col(vec_col)).alias("cn2"),
        srp_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            cosine(F.col("qv"), F.col("cv"), F.col("qn2"), F.col("cn2")).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cosine")
        .orderBy("qid", "rank")
    )


def _cell_candidates(vec_double: Column, n2: Column, cents) -> Column:
    """Array of ``struct(negcs, cid)`` — cosine to every literal centroid,
    negated so ascending struct order = best-cosine-first with lower
    centroid id winning ties.  Pure column expression: the centroids are
    driver-collected rows (``cent_id``, ``cent_v`` double array,
    ``cent_n2``), inlined as literals, so evaluating this costs zero
    joins and zero shuffles — the same shape as k-means assignment
    (clustering._argmin_cluster)."""
    return F.array(
        *[
            F.named_struct(
                F.lit("negcs"),
                -(
                    _exact_dot(vec_double, F.lit(list(r["cent_v"])))
                    / (F.sqrt(n2) * F.sqrt(F.lit(float(r["cent_n2"]))))
                ),
                F.lit("cid"),
                F.lit(r["cent_id"]),
            )
            for r in cents
        ]
    )


def assign_cells(
    df: DataFrame, id_col: str, vec_col: str, cents, nprobe: int = 1
) -> DataFrame:
    """IVF cell assignment as a pure expression: ``(id, v, n2, cell)``
    with one row per probed cell.  ``nprobe=1`` is an ``array_min``
    (the common corpus side); ``nprobe>1`` sorts the candidate array and
    explodes the first ``nprobe`` — still expression-only, no Exchange
    anywhere (plan-asserted in tests/test_plans.py)."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm2(F.col(vec_col)).alias("__n2"),
    )
    cands = _cell_candidates(F.col("__v").cast("array<double>"), F.col("__n2"), cents)
    if nprobe <= 1:
        return base.select(
            "__id", "__v", "__n2", F.array_min(cands).cid.alias("cell")
        )
    return (
        base.select(
            "__id", "__v", "__n2",
            F.slice(F.array_sort(cands), 1, nprobe).alias("__cells"),
        )
        .select("__id", "__v", "__n2", F.explode("__cells").alias("__c"))
        .select("__id", "__v", "__n2", F.col("__c.cid").alias("cell"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    n_centroids: int = 16,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """IVF-style ANN: deterministic centroids (the first ``n_centroids``
    corpus vectors — a real deployment would k-means them), every vector
    assigned to its nearest centroid, and each query probes its
    ``nprobe`` nearest cells.

    Scale shape: the centroids (n_centroids × dim doubles) are collected
    once on the driver and inlined as literals, so the billion-vector
    corpus side is assigned with a zero-shuffle column expression inside
    its own scan stage — no corpus-wide window, no cross join (that was
    this operator's weakness through round 3: a corpus×centroids cross
    join followed by a full ``Window.partitionBy(id)`` shuffle).  Search
    is then a broadcast equi-join on cell id, and the only shuffle left
    is the per-query top-k over the candidate set."""
    cents = (
        corpus.orderBy(corpus_id)
        .limit(n_centroids)
        .select(
            F.col(corpus_id).alias("cent_id"),
            F.col(vec_col).cast("array<double>").alias("cent_v"),
            norm2(F.col(vec_col)).alias("cent_n2"),
        )
        .collect()
    )
    c_assigned = (
        assign_cells(corpus, corpus_id, vec_col, cents, nprobe=1)
        .withColumnRenamed("__id", "nid")
        .withColumnRenamed("__v", "cv")
        .withColumnRenamed("__n2", "cn2")
    )
    q_assigned = (
        assign_cells(queries, query_id, vec_col, cents, nprobe=nprobe)
        .withColumnRenamed("__id", "qid")
        .withColumnRenamed("__v", "qv")
        .withColumnRenamed("__n2", "qn2")
    )
    # corpus rows live in exactly one cell and a query's probed cells are
    # distinct, so each (qid, nid) pair appears at most once — no dedup.
    scored = (
        c_assigned.join(F.broadcast(q_assigned), on="cell")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            cosine(F.col("qv"), F.col("cv"), F.col("qn2"), F.col("cn2")).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cosine")
        .orderBy("qid", "rank")
    )
