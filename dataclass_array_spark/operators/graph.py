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
