"""Oracle-checked queries exercising the DcaTable core (the reference's
own operator surface, SURVEY.md §2.A): boolean-mask filtering, gather,
reshape/einops-transpose rowid arithmetic, stack/concat, map_field, and
vectorize_method — each expressed over the driver's tables with a DuckDB
oracle that recomputes the expected rowid mapping in SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import dataclass_array_spark as das
from dataclass_array_spark.core.schema import f32, i32, i64
from dataclass_array_spark.core.table import ROWID, attach_dense_rowid
from dataclass_array_spark.workload.base import load_tables
from dataclass_array_spark.workload.catalog import Query


@das.dataclass_array(cast_dtype=True)
class Embedding(das.DcaTable):
    """Fixed-inner-shape vector field — the dca model's sweet spot
    (reference FloatArray['*batch 64'] analog)."""

    vec_id: i64
    embedding: f32["*b 64"]
    label: i32


def _load_embeddings(spark: SparkSession, sf_dir: str, n: int | None = None) -> Embedding:
    df = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    if n is not None:
        df = df.filter(F.col("vec_id") < n)
    # rowid follows vec_id order explicitly (engine-side dense reindex)
    df = attach_dense_rowid(df.drop(ROWID) if ROWID in df.columns else df, order_by="vec_id")
    return Embedding.from_df(df, validate=True)


# -------------------------------------------- boolean mask (filter)
def shape_mask_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dc[mask] — the reference's only predicate operator (#14): Column
    mask → filter + dense re-rowid.  Oracle recomputes the dense rowid
    with a window over the kept rows."""
    t = _load_embeddings(spark, sf_dir)
    kept = t[F.col("label") % 2 == 0]
    return kept.df.select(ROWID, "vec_id", "label")


MASK_SQL = """
SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS __rowid, vec_id, label
FROM embeddings WHERE label % 2 = 0
"""


# -------------------------------------------- gather (int-array indexing)
def shape_gather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dc[int_array] (#15) — an equi-join in disguise; stride-7 gather."""
    t = _load_embeddings(spark, sf_dir, n=490)
    idx = np.arange(0, 490, 7)
    g = t[idx]
    return g.df.select(ROWID, "vec_id", "label")


GATHER_SQL = """
SELECT vec_id // 7 AS __rowid, vec_id, label
FROM embeddings WHERE vec_id < 490 AND vec_id % 7 = 0
"""


# -------------------------------------------- reshape + einops transpose
def shape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reshape((50,10)) → 'a b -> b a' → flatten (#9/#10): pure rowid
    arithmetic, no shuffle.  Old row i sits at (a,b)=(i//10, i%10); the
    transpose puts it at linear index b*50 + a — the oracle states
    exactly that."""
    t = _load_embeddings(spark, sf_dir, n=500)
    out = t.reshape((50, 10)).reshape("a b -> b a").flatten()
    return out.df.select(ROWID, "vec_id", "label")


TRANSPOSE_SQL = """
SELECT (vec_id % 10) * 50 + vec_id // 10 AS __rowid, vec_id, label
FROM embeddings WHERE vec_id < 500
"""


# -------------------------------------------- slice (basic indexing)
def shape_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dc[10:400:3] (#13): filter + rowid remap in one select."""
    t = _load_embeddings(spark, sf_dir, n=500)
    out = t[10:400:3]
    return out.df.select(ROWID, "vec_id", "label")


SLICE_SQL = """
SELECT (vec_id - 10) // 3 AS __rowid, vec_id, label
FROM embeddings
WHERE vec_id >= 10 AND vec_id < 400 AND (vec_id - 10) % 3 = 0
"""


# -------------------------------------------- concat + map_field
def shape_concat_mapfield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat(#22) of two slices, the second with map_field label+1000
    (#17) — UNION ALL with rowid offset in the oracle."""
    t = _load_embeddings(spark, sf_dir, n=200)
    a = t[0:100]
    # replace is the idiomatic single-field map (#18)
    b = t[100:200].replace(label=(F.col("label") + 1000).cast("int"))
    out = das.concat([a, b])
    return out.df.select(ROWID, "vec_id", "label")


CONCAT_SQL = """
SELECT vec_id AS __rowid, vec_id, label FROM embeddings WHERE vec_id < 100
UNION ALL
SELECT vec_id AS __rowid, vec_id, label + 1000 AS label
FROM embeddings WHERE vec_id >= 100 AND vec_id < 200
"""


# -------------------------------------------- vectorize_method
class EmbeddingV(Embedding):
    @das.vectorize_method
    def positive_dims(self):
        """Scalar-written method (assumes self.shape == ()); auto-batched
        by the decorator.  Integer output → exact oracle.  The comparison
        + boolean-sum body tier-1-traces to ``size(filter(col, x -> x >
        0))`` — pure Catalyst, no Python worker (np.sum over booleans is
        integer-valued in both tiers)."""
        return {"n_pos": np.sum(np.asarray(self.embedding) > 0)}


def shape_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    df = attach_dense_rowid(df, order_by="vec_id")
    t = EmbeddingV.from_df(df, validate=True)
    out = t.positive_dims()
    joined = out.df.join(t.df.select(ROWID, "vec_id"), on=ROWID)
    return joined.select("vec_id", F.col("n_pos").cast("long").alias("n_pos"))


VECTORIZE_SQL = """
SELECT vec_id, CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
FROM embeddings
"""


# -------------------------------------------- rank-2 vectorize (matrix fields)
@das.dataclass_array(cast_dtype=True)
class IsoLike(das.DcaTable):
    """3×3 matrix + 3-vector fields (reference Isometrie analog,
    `array_dataclass_test.py:78-102`) carved out of the embedding
    vector: R = first 9 dims as rows, t = dims 10-12."""

    vec_id: i64
    R: f32["*b 3 3"]
    t: f32["*b 3"]

    @das.vectorize_method
    def geometry(self):
        """Plain-numpy scalar-written body over a MATRIX field — must
        compile to Catalyst (tier-1 rank-2 tracing): matmul m@v and
        m@m, transpose, axis reduction, element indexing."""
        p = self.R @ self.t + self.t  # apply + translate
        colsum = np.sum(self.R, axis=0)  # column sums (reduce over rows)
        gram01 = (self.R @ self.R.T)[0, 1]  # row0 · row1
        return {
            "p0": p[0], "p1": p[1], "p2": p[2],
            "colsum0": colsum[0],
            "gram01": gram01,
        }


def shape_vectorize_mat(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    e = F.col("embedding")
    df = df.select(
        "vec_id",
        F.array(F.slice(e, 1, 3), F.slice(e, 4, 3), F.slice(e, 7, 3)).alias("R"),
        F.slice(e, 10, 3).alias("t"),
    )
    df = attach_dense_rowid(df, order_by="vec_id")
    t = IsoLike.from_df(df, validate=True)
    out = t.geometry()
    joined = out.df.join(t.df.select(ROWID, "vec_id"), on=ROWID)
    cols = ["p0", "p1", "p2", "colsum0", "gram01"]
    # float32 inputs widen exactly to double; folds are sequential in
    # both engines → bit-identical values → identical floor-scaled ints
    return joined.select(
        "vec_id", *[F.floor(F.col(c) * 1e6).cast("long").alias(f"{c}_e6") for c in cols]
    ).orderBy("vec_id")


_DOT3 = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1,3), "
    "k -> CAST({a}[k] AS DOUBLE) * CAST({b}[k] AS DOUBLE))), (x,y) -> x + y)"
)

VECTORIZE_MAT_SQL = f"""
WITH base AS (
  SELECT vec_id,
         embedding[1:3] AS r0, embedding[4:6] AS r1, embedding[7:9] AS r2,
         embedding[10:12] AS t
  FROM embeddings
), calc AS (
  SELECT vec_id,
         {_DOT3.format(a='r0', b='t')} + CAST(t[1] AS DOUBLE) AS p0,
         {_DOT3.format(a='r1', b='t')} + CAST(t[2] AS DOUBLE) AS p1,
         {_DOT3.format(a='r2', b='t')} + CAST(t[3] AS DOUBLE) AS p2,
         CAST(r0[1] AS DOUBLE) + CAST(r1[1] AS DOUBLE) + CAST(r2[1] AS DOUBLE) AS colsum0,
         {_DOT3.format(a='r0', b='r1')} AS gram01
  FROM base
)
SELECT vec_id,
       CAST(FLOOR(p0 * 1e6) AS BIGINT) AS p0_e6,
       CAST(FLOOR(p1 * 1e6) AS BIGINT) AS p1_e6,
       CAST(FLOOR(p2 * 1e6) AS BIGINT) AS p2_e6,
       CAST(FLOOR(colsum0 * 1e6) AS BIGINT) AS colsum0_e6,
       CAST(FLOOR(gram01 * 1e6) AS BIGINT) AS gram01_e6
FROM calc ORDER BY vec_id
"""


QUERIES = {
    "shape_vectorize_mat": Query(shape_vectorize_mat, VECTORIZE_MAT_SQL, tags=("shape", "vectorize")),
    "shape_mask_filter": Query(shape_mask_filter, MASK_SQL, tags=("shape",)),
    "shape_gather": Query(shape_gather, GATHER_SQL, tags=("shape",)),
    "shape_transpose": Query(shape_transpose, TRANSPOSE_SQL, tags=("shape",)),
    "shape_slice": Query(shape_slice, SLICE_SQL, tags=("shape",)),
    "shape_concat_mapfield": Query(shape_concat_mapfield, CONCAT_SQL, tags=("shape",)),
    "shape_vectorize": Query(shape_vectorize, VECTORIZE_SQL, tags=("shape", "vectorize")),
}
