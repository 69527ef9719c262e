"""Iterative graph algorithms without GraphFrames: connected components
by min-label propagation — the canonical way to turn near-duplicate
PAIRS into duplicate CLUSTERS (transitive closure) for dedup.

Driver-side convergence loop of joins; each iteration is one shuffle on
the node id.  Iteration count is O(log(diameter)) with the large-star
contraction below; dup clusters have tiny diameters, so 3-5 iterations
cover real corpora.  At 100 TB: localCheckpoint each iteration (before
the convergence count, so count + next iteration share one
materialization) to cut the growing lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    pin: str = "local",
) -> DataFrame:
    """→ (node, component) where component = min node id reachable.

    Min-label propagation: every node repeatedly adopts the smallest
    label among itself and its neighbors until no label changes.

    ``pin`` selects how the per-iteration materializations are pinned:
    ``"local"`` (executor-memory localCheckpoint — fast, but an
    executor loss mid-loop kills the job because the truncated lineage
    cannot recompute) vs ``"reliable"`` (checkpoint dir — survives
    executor loss; the right mode for long 100 TB dedup runs).  See
    :func:`~dataclass_array_spark.core.table.pin_materialization`.
    """
    from dataclass_array_spark.core.table import pin_materialization

    sym = pin_materialization(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct(),
        # materialize ONCE: every iteration joins against the edge set,
        # and without this the (possibly expensive) upstream lineage —
        # e.g. a whole MinHash pipeline — re-executes per iteration
        pin,
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for i in range(max_iter):
        neigh_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy(F.col("u").alias("node2"))
            .agg(F.min("comp").alias("neigh_comp"))
        )
        new_labels = (
            labels.join(neigh_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("neigh_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # checkpoint BEFORE the convergence count: the count and the
        # next iteration then share one materialization instead of
        # executing the join/agg pipeline twice per iteration (the
        # count would otherwise materialize it, and the next
        # iteration would recompute it from lineage)
        new_labels = pin_materialization(new_labels, pin)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over an edge list (multi-edges become integer
    weights): fixed ``iters`` power-iteration rounds of
    ``r'(v) = (1-d)/N + d · Σ_{u→v} r(u)·w_uv / W_u``.
    Returns ``(node, r)``.

    Cross-engine exactness: the per-node incoming sum is a SORTED
    left-to-right double fold (``sort_array(collect_list)`` by source
    id → ``F.aggregate``; ``list(c ORDER BY u)`` → ``list_reduce`` in
    the oracle) — deterministic float addition, no decimal casts of
    computed doubles (Spark's double→decimal cast is string-based and
    diverges from DuckDB's on non-representable values — see
    PERF.md).  All literals evaluate as doubles on both sides.

    Scale shape: each iteration is one equi-join of the rank vector to
    the (u, v, w, W) edge frame on ``u`` plus one aggregation shuffled
    on ``v`` — the standard distributed power iteration.  The ordered
    fold gathers a hub's in-contributions into one array; at extreme
    in-degrees a production run would trade this determinism for a
    plain ``sum`` (order-free but run-to-run float-stable only per
    plan) — the fold is the oracle-exactness path.  Dangling nodes
    (no out-edges) leak their mass, the simple standard variant; both
    engines implement the same choice.
    """
    u, v = F.col(src).alias("node"), F.col(dst).alias("node")
    nodes = edges.select(u).union(edges.select(v)).distinct()
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: no edges")
    w = edges.groupBy(F.col(src).alias("u"), F.col(dst).alias("v")).agg(
        F.count("*").alias("w")
    )
    outw = w.groupBy("u").agg(F.sum("w").alias("wtot"))
    wn = w.join(outw, on="u")
    comp = 1.0 - damping
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(n)).alias("r"))
    for _ in range(iters):
        contribs = wn.join(ranks, wn["u"] == ranks["node"]).select(
            "v", "u", ((F.col("r") * F.col("w")) / F.col("wtot")).alias("c")
        )
        sums = contribs.groupBy("v").agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct(F.col("u"), F.col("c")))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("s")
        )
        ranks = nodes.join(sums, nodes["node"] == sums["v"], "left").select(
            "node",
            (
                F.lit(comp) / F.lit(n)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph induced
    by the edge list (multi-edges collapse, self-loops drop).
    Returns ``(node, n_tri)`` for every node in at least one triangle.

    Scale shape: edges are canonically oriented ``u < v`` and each
    triangle is enumerated exactly once as ``u < v < w`` via two
    equi-joins — (u,v)⋈(v,w) builds wedges keyed on the middle vertex,
    (u,w) closes them.  Both joins are hash-partitioned on a vertex
    id; no cross join, no per-node adjacency materialization.  (The
    classic hub-degree refinement — orient by degree instead of id so
    wedge counts are minimized — drops in here by swapping the
    orientation key; id orientation keeps the oracle trivial.)
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
        )
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return (
        nodes.groupBy("node")
        .agg(F.count("*").cast("long").alias("n_tri"))
        .orderBy("node")
    )
