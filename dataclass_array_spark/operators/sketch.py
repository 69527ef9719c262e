"""Count-min sketch: one-pass, fixed-memory, MERGEABLE frequency
estimation — the streaming/100 TB counterpart of an exact
``groupBy(item).count()`` whose shuffle would otherwise carry the full
item-type table (reference semantic context: dataclass_array has no
sketches; this extends the engine's approx family alongside the
HLL/quantile gate `approx_sketches`).

Guarantee: for every item, ``estimate >= true count`` (each of the
``depth`` rows only ever ADDS colliding items), and
``estimate <= true + eps*N`` with probability ``1 - (1/2)^depth`` for
``width = e/eps`` — the classic Cormode-Muthukrishnan bound.

Exactness story (unusual for a sketch): the bucket hashes are
md5-derived universal hashes (the minhash recipe: one portable 32-bit
md5 prefix per item, mixed per row as ``(h*A_j + B_j) mod P mod
width``), so the WHOLE SKETCH is deterministic and the DuckDB oracle
replays it cell-for-cell — the gate hash-checks estimates, not just
tolerances.  ``h < 2^32`` and ``A_j < 2^29`` keep ``h*A_j + B_j``
under 2^62: no BIGINT overflow on either engine.

Scale shape: building the sketch is one aggregation over (row,
bucket) pairs — hash partial aggregation combines map-side, so the
shuffle carries at most ``depth * width`` rows PER TASK regardless of
corpus size, and the finished sketch (``depth * width`` rows total) is
broadcastable by construction.  Merging sketches of two corpora =
summing cells (same constants) — the mergeability that makes this the
production path where exact counting would need a vocabulary-sized
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CM_P = (1 << 61) - 1


def _cm_constants(depth: int) -> "tuple[list[int], list[int]]":
    """Fixed LCG (seed 7 — deliberately distinct from the minhash
    stream) → ``depth`` (A, B) universal-hash pairs, inlined as plan
    literals and into the oracle SQL."""
    a, out_a, out_b = 7, [], []
    for _ in range(depth):
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out_a.append((a % ((1 << 29) - 1)) | 1)  # odd, < 2^29
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out_b.append(a % _CM_P)
    return out_a, out_b


def _hash32(col: Column) -> Column:
    """Portable 32-bit hash: first 8 hex chars of md5 → BIGINT (the
    dedup.py recipe; DuckDB mirror ``CAST(('0x'||substr(md5(x),1,8))
    AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _bucket(h: Column, a: int, b: int, width: int) -> Column:
    return ((h * F.lit(a).cast("long") + F.lit(b).cast("long")) % F.lit(_CM_P)) % F.lit(
        int(width)
    )


def countmin_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Build the sketch: ``(j, bucket, cnt)`` rows, ``j in [0,
    depth)``, ``bucket in [0, width)`` — at most ``depth*width`` rows.
    One posexplode (depth rows per instance, combined map-side) + one
    aggregation."""
    A, B = _cm_constants(depth)
    h = _hash32(F.col(item_col))
    buckets = F.array(*[_bucket(h, A[j], B[j], width) for j in range(depth)])
    inst = df.select(F.posexplode(buckets).alias("j", "bucket"))
    return inst.groupBy("j", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def countmin_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point estimates for ``items``: ``min_j sketch[j][bucket_j(t)]``
    (0 for a never-seen item whose buckets are all empty).  The sketch
    side is broadcast — it is ≤ depth*width rows by construction, at
    ANY corpus size."""
    A, B = _cm_constants(depth)
    h = _hash32(F.col(item_col))
    buckets = F.array(*[_bucket(h, A[j], B[j], width) for j in range(depth)])
    probes = items.select(
        F.col(item_col), F.posexplode(buckets).alias("j", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def countmin_sql_ctes(
    item_src: str, item: str, depth: int, width: int
) -> str:
    """DuckDB mirror: CTEs ``cmcons(j, a, b)``, ``cminst`` and
    ``cmsketch(j, bucket, cnt)`` over item instances ``{item_src}``
    (a FROM-able subquery/table with column ``{item}``) — identical
    integer arithmetic, cell-for-cell equal to :func:`countmin_build`."""
    A, B = _cm_constants(depth)
    cons = ", ".join(f"({j}, {A[j]}, {B[j]})" for j in range(depth))
    return f"""cmcons AS (SELECT * FROM (VALUES {cons}) v(j, a, b)),
cminst AS (
  SELECT c.j,
         ((CAST(('0x'||substr(md5({item}),1,8)) AS BIGINT) * c.a + c.b)
          % {_CM_P}) % {int(width)} AS bucket
  FROM {item_src} CROSS JOIN cmcons c
),
cmsketch AS (
  SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cminst GROUP BY j, bucket
)"""
