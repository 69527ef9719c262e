"""Round-7 query extensions: product-quantization ANN (plain and
IVF-composed), chunk-level exact dedup (the C4 line-dedup rule over
token windows), banded-Hamming SimHash near-dup pairs + apply,
incremental batch-vs-store dedup, fuzzy edit-distance string join,
graph analytics (weighted PageRank, triangle counting), in-engine text
topic clustering, ordered-funnel analysis, time-series gap fill, and
cohort retention.

Same contract as :mod:`workload.llm`: every query binds an operator to
the driver tables and carries a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataclass_array_spark.operators import text as tx
from dataclass_array_spark.workload.base import load_tables
from dataclass_array_spark.workload.catalog import Query

_SQL_TOKS = tx.SQL_TOKENS.format(t="text")

# ------------------------------------------------ PQ / ADC ANN
_N_QUERIES = 10          # same query slice as the other ANN gates
_DIM = 64
_PQ_M = 8                # 8 subspaces x 8 dims: 256 B -> 8 B per vector
_PQ_CODES = 8
_PQ_ITERS = 2
_PQ_TRAIN = 256          # binds even at sf0.01 (256 < 500 rows)
_PQ_K = 5


def embedding_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: per-subspace codebooks trained with
    sampled Lloyd's (one bounded top-m pass), corpus stored as m code
    ids (32× compression — the form a 100 TB embedding store keeps
    resident), queries scored by asymmetric distance against codes
    only.  Codebook training, encoding ties, and the blocked ADC fold
    order are all deterministic, so the DuckDB oracle replays the whole
    pipeline value-exactly (``_pq_sql``)."""
    from dataclass_array_spark.operators.pq import pq_fit, pq_topk

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cbs = pq_fit(
        e, "vec_id", "embedding", dim=_DIM, m=_PQ_M, codes=_PQ_CODES,
        iters=_PQ_ITERS, train_limit=_PQ_TRAIN,
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    out = pq_topk(
        q, e, "vec_id", "vec_id", "embedding", cbs, k=_PQ_K, exclude_self=True
    )
    return out.select(
        "qid",
        F.col("rank").cast("long").alias("rnk"),
        "nid",
        F.floor(F.col("dist") * 1e9).cast("long").alias("dist_e9"),
    )


def _pq_parts():
    """Shared oracle fragments for the PQ gates: one prefixed unrolled-
    k-means CTE chain PER SUBSPACE (``s{j}_…``, each over the DuckDB
    list slice of the embedding), the ``enc`` CTE joining the per-
    subspace ``afinal`` code assignments, the codebook joins, and the
    blocked ADC distance expression (per-subspace folds summed
    left-to-right — the association order `operators/pq.py` uses)."""
    from dataclass_array_spark.operators.clustering import kmeans_sql_ctes

    d = _DIM // _PQ_M
    chains = []
    for j in range(_PQ_M):
        lo, hi = j * d + 1, (j + 1) * d
        c = kmeans_sql_ctes(
            "embeddings", "vec_id", "embedding", dim=d, k=_PQ_CODES,
            iters=_PQ_ITERS, train_limit=_PQ_TRAIN, prefix=f"s{j}_",
            vec_expr=f"CAST(embedding AS DOUBLE[])[{lo}:{hi}]",
        )
        chains.append(c if j == 0 else ", " + c[len("WITH ") :])
    enc_cols = ", ".join(f"s{j}.cid AS c{j}" for j in range(_PQ_M))
    enc_joins = " ".join(
        f"JOIN s{j}_afinal s{j} ON s{j}.vec_id = s0.vec_id"
        for j in range(1, _PQ_M)
    )
    enc_cte = f"""enc AS (
  SELECT s0.vec_id, {enc_cols}
  FROM s0_afinal s0 {enc_joins}
)"""
    cb_joins = "\n  ".join(
        f"JOIN s{j}_c{_PQ_ITERS} cb{j} ON cb{j}.cid = enc.c{j}"
        for j in range(_PQ_M)
    )

    def dist(qalias: str) -> str:
        terms = []
        for j in range(_PQ_M):
            lo, hi = j * d + 1, (j + 1) * d
            terms.append(
                f"list_reduce(list_prepend(0.0, list_transform("
                f"list_zip({qalias}.v[{lo}:{hi}], cb{j}.cv), "
                f"p -> (p[1]-p[2])*(p[1]-p[2]))), (acc, x) -> acc + x)"
            )
        return "\n         + ".join(terms)

    return "".join(chains), enc_cte, cb_joins, dist


def _pq_sql() -> str:
    """Oracle for :func:`embedding_ann_pq` — brute-force ADC."""
    chains, enc_cte, cb_joins, dist = _pq_parts()
    return chains + f"""
, fe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
, {enc_cte}
, q AS (SELECT vec_id AS qid, v FROM fe WHERE vec_id < {_N_QUERIES})
, scored AS (
  SELECT q.qid, enc.vec_id AS nid,
         {dist('q')} AS dist
  FROM q CROSS JOIN enc
  {cb_joins}
  WHERE q.qid != enc.vec_id
), r AS (
  SELECT qid, nid, dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, nid) AS rnk
  FROM scored
)
SELECT qid, rnk, nid, CAST(FLOOR(dist * 1e9) AS BIGINT) AS dist_e9
FROM r WHERE rnk <= {_PQ_K} ORDER BY qid, rnk
"""


# ------------------------------------------------ IVF-PQ (FAISS IVFADC)
_IVFPQ_CELLS = 16
_IVFPQ_NPROBE = 4

_IVF_CELL_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip(fe.v, c.cv), "
    "p -> p[1]*p[2])), (acc, x) -> acc + x)"
)


def embedding_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (the FAISS IVFADC composition): first-n IVF cells
    prune candidates, sampled-trained PQ codebooks score them via ADC.
    One fused corpus pass produces ``(id, cell, codes)`` — the entire
    resident index at scale; cells, codes, and the blocked fold order
    are all deterministic so the oracle replays the pipeline
    value-exactly."""
    from dataclass_array_spark.operators.pq import ivf_pq_topk, pq_fit

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cbs = pq_fit(
        e, "vec_id", "embedding", dim=_DIM, m=_PQ_M, codes=_PQ_CODES,
        iters=_PQ_ITERS, train_limit=_PQ_TRAIN,
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    out = ivf_pq_topk(
        q, e, "vec_id", "vec_id", "embedding", cbs,
        n_centroids=_IVFPQ_CELLS, nprobe=_IVFPQ_NPROBE, k=_PQ_K,
    )
    return out.select(
        "qid",
        F.col("rank").cast("long").alias("rnk"),
        "nid",
        F.floor(F.col("dist") * 1e9).cast("long").alias("dist_e9"),
    )


def _ivf_pq_sql() -> str:
    """Oracle for :func:`embedding_ann_ivf_pq`: the IVF cell CTEs of
    ``workload.llm.IVF_SQL`` (first-n centroids, cosine cell ranking,
    corpus rn=1 / queries rn<=nprobe) over the PQ chains, candidates
    scored by the blocked ADC distance."""
    chains, enc_cte, cb_joins, dist = _pq_parts()
    return chains + f"""
, fe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
, fn AS (
  SELECT vec_id,
         list_reduce(list_prepend(0.0, list_transform(list_zip(v, v),
              p -> p[1]*p[2])), (acc, x) -> acc + x) AS n2
  FROM fe
), c AS (
  SELECT fe.vec_id AS cent_id, fe.v AS cv, fn.n2 AS cn2
  FROM fe JOIN fn USING (vec_id) ORDER BY vec_id LIMIT {_IVFPQ_CELLS}
), cells AS (
  SELECT vec_id, cell, rn FROM (
    SELECT fe.vec_id, c.cent_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY fe.vec_id ORDER BY
             {_IVF_CELL_DOT} / (sqrt(fn.n2) * sqrt(c.cn2)) DESC, c.cent_id) AS rn
    FROM fe JOIN fn USING (vec_id) CROSS JOIN c
  )
), ca AS (
  SELECT vec_id AS nid, cell FROM cells WHERE rn = 1
), qa AS (
  SELECT vec_id AS qid, cell FROM cells WHERE rn <= {_IVFPQ_NPROBE}
    AND vec_id < {_N_QUERIES}
), {enc_cte}
, scored AS (
  SELECT qa.qid, ca.nid,
         {dist('qq')} AS dist
  FROM qa JOIN ca USING (cell)
  JOIN enc ON enc.vec_id = ca.nid
  JOIN fe qq ON qq.vec_id = qa.qid
  {cb_joins}
  WHERE qa.qid != ca.nid
), r AS (
  SELECT qid, nid, dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, nid) AS rnk
  FROM scored
)
SELECT qid, rnk, nid, CAST(FLOOR(dist * 1e9) AS BIGINT) AS dist_e9
FROM r WHERE rnk <= {_PQ_K} ORDER BY qid, rnk
"""


# ------------------------------------------------ chunk-level dedup
_CHUNK_DEDUP_SIZE = 20


def dedup_chunks_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup over the corpus: every 20-token window
    kept only at its globally first occurrence; per-doc survival stats
    + an md5 of the surviving text."""
    from dataclass_array_spark.operators.dedup import dedup_chunks

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    return dedup_chunks(
        d, "doc_id", "text", chunk_size=_CHUNK_DEDUP_SIZE
    ).orderBy("doc_id")


_CS = _CHUNK_DEDUP_SIZE
CHUNK_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), ch AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, CAST(floor((len(toks)-1)/{_CS}) AS INT))) AS chunk_id
  FROM toks WHERE len(toks) > 0
), chunks AS (
  SELECT doc_id, chunk_id,
         array_to_string(toks[(chunk_id*{_CS}+1):(chunk_id*{_CS}+{_CS})], ' ') AS chunk_text
  FROM ch
), flagged AS (
  SELECT doc_id, chunk_id, chunk_text,
         ROW_NUMBER() OVER (PARTITION BY md5(chunk_text)
                            ORDER BY doc_id, chunk_id) AS rn
  FROM chunks
)
, stats AS (
  SELECT doc_id,
         COUNT(*) AS n_chunks,
         CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         md5(COALESCE(
           string_agg(chunk_text, ' ' ORDER BY chunk_id) FILTER (WHERE rn = 1),
           '')) AS kept_md5
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(s.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(s.kept_md5, md5('')) AS kept_md5
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN stats s USING (doc_id) ORDER BY d.doc_id
"""


QUERIES = {
    "embedding_ann_pq": Query(embedding_ann_pq, _pq_sql(), tags=("similarity", "ann", "pq")),
    "embedding_ann_ivf_pq": Query(
        embedding_ann_ivf_pq, _ivf_pq_sql(), tags=("similarity", "ann", "pq")
    ),
    "dedup_chunks_exact": Query(dedup_chunks_docs, CHUNK_DEDUP_SQL, tags=("dedup", "text")),
}


# ------------------------------------------------ SimHash near-dup pairs
_SH_BITS, _SH_BANDS, _SH_HAMMING, _SH_CAP = 48, 4, 3, 64
_SH_W = _SH_BITS // _SH_BANDS


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via banded Hamming-ball candidates
    (pigeonhole: <=3 differing bits across 4 disjoint 12-bit slices
    leaves at least one slice identical) + popcount verify."""
    from dataclass_array_spark.operators.dedup import simhash_pairs

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    return simhash_pairs(
        d, "doc_id", "text", n_bits=_SH_BITS, bands=_SH_BANDS,
        max_hamming=_SH_HAMMING, max_bucket_size=_SH_CAP,
    )


SIMHASH_PAIRS_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
), h AS (
  SELECT doc_id, CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) AS hv FROM tok
), votes AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, generate_series(0,{_SH_BITS - 1}) AS g(j) GROUP BY doc_id, j
), fpr AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS fp
  FROM votes GROUP BY doc_id
), fp2 AS (
  SELECT d.doc_id, COALESCE(fpr.fp, 0) AS fp
  FROM documents d LEFT JOIN fpr ON fpr.doc_id = d.doc_id
), banded AS (
  SELECT doc_id, fp, g.b AS band, (fp >> (g.b * {_SH_W})) & {(1 << _SH_W) - 1} AS key
  FROM fp2, generate_series(0,{_SH_BANDS - 1}) AS g(b)
  QUALIFY COUNT(*) OVER (PARTITION BY g.b, (fp >> (g.b * {_SH_W})) & {(1 << _SH_W) - 1}) <= {_SH_CAP}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS fa, b.fp AS fb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= {_SH_HAMMING}
ORDER BY id_a, id_b
"""

QUERIES["dedup_simhash_pairs"] = Query(
    dedup_simhash_pairs, SIMHASH_PAIRS_SQL, tags=("dedup", "simhash")
)


def dedup_apply_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SimHash dedup: banded-Hamming pairs → drop the
    higher-id member of every pair → surviving corpus (keep-lowest
    needs no transitive closure)."""
    from dataclass_array_spark.operators.dedup import (
        drop_near_duplicates,
        simhash_pairs,
    )

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    pairs = simhash_pairs(
        d, "doc_id", "text", n_bits=_SH_BITS, bands=_SH_BANDS,
        max_hamming=_SH_HAMMING, max_bucket_size=_SH_CAP,
    )
    kept = drop_near_duplicates(d, pairs, "doc_id")
    return kept.select("doc_id", "source", "lang").orderBy("doc_id")


SIMHASH_APPLY_SQL = f"""
WITH pairs AS ({SIMHASH_PAIRS_SQL.replace('ORDER BY id_a, id_b', '')})
SELECT doc_id, source, lang FROM documents
WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs)
ORDER BY doc_id
"""

QUERIES["dedup_apply_simhash"] = Query(
    dedup_apply_simhash, SIMHASH_APPLY_SQL, tags=("dedup", "simhash")
)


# ------------------------------------------------ incremental dedup
_INC_MOD = 3          # doc_id % 3 == 0 is the "new batch", rest the store
_INC_THRESH = 0.3
_INC_CAP = 64


def dedup_incremental_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new batch against the existing corpus:
    every new doc flagged exact-dup (content fingerprint seen in the
    store) and/or near-dup (MinHash band candidate vs the store,
    Jaccard-verified).  The store is never self-joined."""
    from dataclass_array_spark.operators.dedup import dedup_incremental

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    new = d.filter(F.col("doc_id") % _INC_MOD == 0)
    store = d.filter(F.col("doc_id") % _INC_MOD != 0)
    return dedup_incremental(
        new, store, "doc_id", "text",
        n_hashes=16, bands=4, threshold=_INC_THRESH,
        max_bucket_size=_INC_CAP,
    )


def _inc_sql(cap: "int | None" = _INC_CAP) -> str:
    from dataclass_array_spark.workload.llm import _MH_EXPR

    fp_expr = tx.sql_md5_fingerprint("text")
    return f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), fps AS (
  SELECT doc_id, {fp_expr} AS fp FROM documents
), sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN
        list_transform(generate_series(1, len(toks)-2),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [] END) AS sh
    FROM toks)
), sig AS (
  SELECT doc_id, {_MH_EXPR}
  FROM sh GROUP BY doc_id
), bands0 AS (
  SELECT doc_id, band,
         CASE band
           WHEN 0 THEN mh0||':'||mh1||':'||mh2||':'||mh3
           WHEN 1 THEN mh4||':'||mh5||':'||mh6||':'||mh7
           WHEN 2 THEN mh8||':'||mh9||':'||mh10||':'||mh11
           ELSE mh12||':'||mh13||':'||mh14||':'||mh15 END AS sig
  FROM sig, generate_series(0,3) AS g(band)
), bands AS (
  SELECT doc_id, band, sig FROM (
    SELECT doc_id, band, sig, COUNT(*) OVER (PARTITION BY band, sig) AS bn
    FROM bands0)
  WHERE {('bn <= ' + str(cap)) if cap is not None else 'TRUE'}
), cand AS (
  SELECT DISTINCT n.doc_id AS nid, s.doc_id AS sid
  FROM bands n JOIN bands s ON n.band = s.band AND n.sig = s.sig
  WHERE n.doc_id % {_INC_MOD} = 0 AND s.doc_id % {_INC_MOD} != 0
), counts AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT c.nid, c.sid, COUNT(*) AS ni FROM cand c
  JOIN sh sa ON sa.doc_id = c.nid
  JOIN sh sb ON sb.doc_id = c.sid AND sb.sh = sa.sh
  GROUP BY c.nid, c.sid
), near AS (
  SELECT DISTINCT i.nid AS doc_id FROM inter i
  JOIN counts ca ON ca.doc_id = i.nid
  JOIN counts cb ON cb.doc_id = i.sid
  WHERE CAST(i.ni AS DOUBLE)/(ca.n + cb.n - i.ni) >= {_INC_THRESH}
), exact AS (
  SELECT DISTINCT n.doc_id FROM fps n JOIN fps s ON s.fp = n.fp
  WHERE n.doc_id % {_INC_MOD} = 0 AND s.doc_id % {_INC_MOD} != 0
)
SELECT d.doc_id,
       d.doc_id IN (SELECT doc_id FROM exact) AS exact_dup,
       d.doc_id IN (SELECT doc_id FROM near) AS near_dup
FROM documents d WHERE d.doc_id % {_INC_MOD} = 0 ORDER BY d.doc_id
"""


QUERIES["dedup_incremental_docs"] = Query(
    dedup_incremental_docs, _inc_sql(), tags=("dedup", "incremental")
)


# ------------------------------------------------ fuzzy string join
_FJ_K, _FJ_Q, _FJ_CAP = 2, 2, 1000


def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join over the distinct part-name vocabulary:
    all name pairs within Levenshtein distance 2, candidates from a
    q-gram inverted index (never all-pairs), verified by the exact DP
    distance — identical integers in Spark and DuckDB."""
    from dataclass_array_spark.operators.fuzzy import edit_distance_join

    p = load_tables(spark, sf_dir, ["part"])["part"]
    return edit_distance_join(
        p, "p_name", k=_FJ_K, q=_FJ_Q, max_gram_freq=_FJ_CAP
    )


FUZZY_JOIN_SQL = f"""
WITH n AS (
  SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL
), grams AS (
  SELECT s, len(s) AS ln, g FROM (
    SELECT s, len(s) AS len_s,
           unnest(CASE WHEN len(s) >= {_FJ_Q} THEN
             list_distinct(list_transform(generate_series(1, len(s) - {_FJ_Q - 1}),
                           i -> substr(s, i, {_FJ_Q})))
           ELSE [] END) AS g
    FROM n) t(s, ln, g)
), capped AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= {_FJ_CAP}
), gi AS (
  SELECT grams.s, grams.ln, grams.g FROM grams JOIN capped USING (g)
), cand AS (
  SELECT DISTINCT a.s AS name_a, b.s AS name_b
  FROM gi a JOIN gi b
    ON a.g = b.g AND a.s < b.s AND abs(a.ln - b.ln) <= {_FJ_K}
)
SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM cand WHERE levenshtein(name_a, name_b) <= {_FJ_K}
ORDER BY name_a, name_b
"""

QUERIES["fuzzy_join_part_names"] = Query(
    fuzzy_join_part_names, FUZZY_JOIN_SQL, tags=("fuzzy", "join")
)


# ------------------------------------------------ PageRank (event graph)
_PR_ITERS, _PR_D = 3, 0.85
_PR_B = 8  # two-level fold sub-buckets (pmod(u, B)); mirrored in the oracle


def pagerank_event_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the per-user event-transition graph: consecutive
    events by (ts, event_id) induce k→k edges (k = the JSON props key);
    3 damped power-iteration rounds rank the hotspot states.  The
    TWO-LEVEL ordered contribution fold (sub-bucket by ``pmod(u, 8)``,
    fold per bucket by ``u``, then fold the 8 partials in bucket
    order — the hub-safe deterministic mode) is mirrored bucket-for-
    bucket in the oracle, keeping it value-exact."""
    from pyspark.sql import Window

    from dataclass_array_spark.operators.graph import pagerank

    e = load_tables(spark, sf_dir, ["events"])["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select("user_id", "ts_us", "event_id", k.alias("k")).withColumn(
        "pk", F.lag("k").over(w)
    )
    edges = seq.filter(F.col("pk").isNotNull()).select(
        F.col("pk").alias("src"), F.col("k").alias("dst")
    )
    pr = pagerank(
        edges, "src", "dst", iters=_PR_ITERS, damping=_PR_D,
        fold_buckets=_PR_B,
    )
    return pr.select(
        "node", F.floor(F.col("r") * 1e9).cast("long").alias("pr_e9")
    ).orderBy("node")


def _pagerank_sql() -> str:
    comp = repr(1.0 - _PR_D)  # 1-0.85 evaluated in binary, string-exact
    d = repr(_PR_D)
    parts = [f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
), seq AS (
  SELECT user_id, k,
         LAG(k) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS pk
  FROM ev
), edges AS (
  SELECT pk AS u, k AS v FROM seq WHERE pk IS NOT NULL
), nodes AS (
  SELECT u AS node FROM edges UNION SELECT v FROM edges
), w AS (
  SELECT u, v, COUNT(*) AS w FROM edges GROUP BY u, v
), ow AS (
  SELECT u, SUM(w) AS wtot FROM w GROUP BY u
), wn AS (
  SELECT w.u, w.v, w.w, ow.wtot FROM w JOIN ow USING (u)
), nn AS (
  SELECT COUNT(*) AS n FROM nodes
), r0 AS (
  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r FROM nodes
)"""]
    for i in range(_PR_ITERS):
        parts.append(f""", c{i} AS (
  SELECT wn.v, wn.u, (r.r * wn.w) / wn.wtot AS c
  FROM wn JOIN r{i} r ON r.node = wn.u
), p{i} AS (
  SELECT v, ((u % {_PR_B}) + {_PR_B}) % {_PR_B} AS bkt,
         list_reduce(list_prepend(0.0, list(c ORDER BY u)),
                     (acc, x) -> acc + x) AS p
  FROM c{i} GROUP BY v, ((u % {_PR_B}) + {_PR_B}) % {_PR_B}
), s{i} AS (
  SELECT v, list_reduce(list_prepend(0.0, list(p ORDER BY bkt)),
                        (acc, x) -> acc + x) AS s
  FROM p{i} GROUP BY v
), r{i + 1} AS (
  SELECT n.node,
         CAST('{comp}' AS DOUBLE) / (SELECT n FROM nn)
           + CAST('{d}' AS DOUBLE) * COALESCE(s.s, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN s{i} s ON s.v = n.node
)""")
    parts.append(f"""
SELECT node, CAST(FLOOR(r * 1e9) AS BIGINT) AS pr_e9
FROM r{_PR_ITERS} ORDER BY node
""")
    return "".join(parts)


QUERIES["pagerank_event_hotspots"] = Query(
    pagerank_event_hotspots, _pagerank_sql(), tags=("graph", "pagerank")
)


# ------------------------------------------------ text topic clustering
_TC_VOCAB = 32       # feature dims: top-32 corpus words (tf DESC, word)
_TC_K = 4
_TC_ITERS = 2
_TC_TRAIN = 256      # sampled (driver-side) Lloyd training; binds at sf0.01


def text_cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end in-engine text clustering: corpus vocabulary (top-32
    words) → per-doc term-count feature vector → k-means topic
    assignment.  Feature components are integer counts (exactly
    double- and decimal-representable), so the whole composition —
    vocab ranking, vector assembly, sampled Lloyd training, final
    assignment — replays value-exactly in the oracle."""
    from pyspark.sql import Window

    from dataclass_array_spark.operators.clustering import kmeans_assign
    from dataclass_array_spark.operators.text import build_vocab, tokens

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    vocab = build_vocab(d, "text", size=_TC_VOCAB)  # (t, tid)
    tok = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    )
    counts = (
        tok.join(F.broadcast(vocab), on="t")
        .groupBy("doc_id", "tid")
        .agg(F.count("*").alias("c"))
    )
    # dense 32-dim vector per doc (docs with no vocab hits -> zeros)
    filled = (
        d.select("doc_id")
        .join(
            counts.groupBy("doc_id").agg(
                F.map_from_entries(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("tid"), F.col("c")))
                    )
                ).alias("m")
            ),
            on="doc_id",
            how="left",
        )
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(_TC_VOCAB - 1)),
                lambda i: F.coalesce(
                    F.try_element_at("m", i.cast("long")), F.lit(0)
                ).cast("double"),
            ).alias("v"),
        )
    )
    out, _ = kmeans_assign(
        filled, "doc_id", "v", k=_TC_K, iters=_TC_ITERS, train_limit=_TC_TRAIN
    )
    return out.select(
        "doc_id",
        F.col("cluster"),
        F.floor(F.col("dist") * 1e9).cast("long").alias("dist_e9"),
    ).orderBy("doc_id")


def _text_cluster_sql() -> str:
    from dataclass_array_spark.operators.clustering import kmeans_sql_ctes

    km = kmeans_sql_ctes(
        "docvecs", "doc_id", "v", dim=_TC_VOCAB, k=_TC_K, iters=_TC_ITERS,
        train_limit=_TC_TRAIN, vec_expr="v",
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), words AS (
  SELECT doc_id, unnest(toks) AS t FROM toks
), vocab AS (
  SELECT t, row_number() OVER (ORDER BY COUNT(*) DESC, t) - 1 AS tid
  FROM words GROUP BY t
  ORDER BY COUNT(*) DESC, t LIMIT {_TC_VOCAB}
), counts AS (
  SELECT w.doc_id, v.tid, COUNT(*) AS c
  FROM words w JOIN vocab v USING (t)
  GROUP BY w.doc_id, v.tid
), grid AS (
  SELECT d.doc_id, gs.i AS tid
  FROM documents d, generate_series(0, {_TC_VOCAB - 1}) gs(i)
), docvecs AS (
  SELECT g.doc_id, list(CAST(COALESCE(c.c, 0) AS DOUBLE) ORDER BY g.tid) AS v
  FROM grid g LEFT JOIN counts c ON c.doc_id = g.doc_id AND c.tid = g.tid
  GROUP BY g.doc_id
), {km[len("WITH ") :]}
SELECT vec_id AS doc_id, CAST(cid AS BIGINT) AS cluster,
       CAST(FLOOR(dist * 1e9) AS BIGINT) AS dist_e9
FROM afinal ORDER BY vec_id
"""


QUERIES["text_cluster_topics"] = Query(
    text_cluster_topics, _text_cluster_sql(), tags=("text", "clustering", "pipeline")
)


# ------------------------------------------------ triangle counting
def triangle_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected event-transition
    graph (same k→k edges as the PageRank gate): two vertex-keyed
    equi-joins enumerate each triangle once (u<v<w)."""
    from pyspark.sql import Window

    from dataclass_array_spark.operators.graph import triangle_counts

    e = load_tables(spark, sf_dir, ["events"])["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select("user_id", "ts_us", "event_id", k.alias("k")).withColumn(
        "pk", F.lag("k").over(w)
    )
    edges = seq.filter(F.col("pk").isNotNull()).select(
        F.col("pk").alias("src"), F.col("k").alias("dst")
    )
    return triangle_counts(edges, "src", "dst")


TRIANGLES_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
), seq AS (
  SELECT user_id, k,
         LAG(k) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS pk
  FROM ev
), und AS (
  SELECT DISTINCT LEAST(pk, k) AS u, GREATEST(pk, k) AS v
  FROM seq WHERE pk IS NOT NULL AND LEAST(pk, k) < GREATEST(pk, k)
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
), n AS (
  SELECT unnest([a, b, c]) AS node FROM tri
)
SELECT node, COUNT(*) AS n_tri FROM n GROUP BY node ORDER BY node
"""

QUERIES["triangle_counts_events"] = Query(
    triangle_counts_events, TRIANGLES_SQL, tags=("graph",)
)


# ------------------------------------------------ funnel analysis
_FUNNEL = ("view", "click", "purchase")


def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view → click → purchase): per user, the
    timestamp of the first view, the first click strictly after it, and
    the first purchase strictly after that.  Each step is one equi-join
    on the user key + a min aggregation — the co-partitioned funnel
    shape that scales to event streams (no window over the whole event
    history, no per-user sorting beyond the aggregations)."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    ev = e.select("user_id", "ts_us", "event_type")
    users = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == _FUNNEL[1])
        .join(s1, on="user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == _FUNNEL[2])
        .join(s2, on="user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", "t1", "t2", "t3")
        .orderBy("user_id")
    )


FUNNEL_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
), s1 AS (
  SELECT user_id, MIN(ts_us) AS t1 FROM ev
  WHERE event_type = '{_FUNNEL[0]}' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts_us) AS t2
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = '{_FUNNEL[1]}' AND e.ts_us > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts_us) AS t3
  FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = '{_FUNNEL[2]}' AND e.ts_us > s2.t2
  GROUP BY e.user_id
)
SELECT u.user_id, s1.t1, s2.t2, s3.t3
FROM (SELECT DISTINCT user_id FROM ev) u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
ORDER BY u.user_id
"""

QUERIES["funnel_conversion_events"] = Query(
    funnel_conversion_events, FUNNEL_SQL, tags=("events", "funnel")
)


# ------------------------------------------------ time-series gap fill
_HOUR_US = 3_600_000_000


def gap_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly gap fill with last-observation-carried-forward:
    build each user's dense hour grid (min..max event hour), take the
    hour's LAST event value where one exists, carry it forward through
    empty hours.  Carried values are copied, never recomputed — exact
    cross-engine.  Scale shape: one (user, hour) aggregation + one
    per-user sequence explode + one LOCF window over (user, hour) —
    everything partitions on the user key."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir, ["events"])["events"]
    ev = e.select(
        "user_id",
        F.expr(f"ts_us DIV {_HOUR_US}").alias("hour"),
        "ts_us", "event_id", "value",
    )
    w_last = Window.partitionBy("user_id", "hour").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    hourly = (
        ev.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("user_id", "hour", F.col("value").alias("v"))
    )
    span = ev.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    # SPAN-WISE LOCF (round 9): the oracle's dense grid (explode h0..h1,
    # left join, carry-forward window — 13M rows at sf1) only exists to
    # be re-aggregated, and a carried value is CONSTANT between
    # observations, so each observed hour contributes exactly
    # floor(v·1e6) × (next_observed_hour − hour) to the series
    # fingerprint (the last span capped at h1 + 1).  Integer arithmetic
    # is identical to summing the carried value hour-by-hour, the
    # explode and the grid join disappear, and the whole gate runs over
    # the observed (user, hour) rows only — measured 11.1 → ~2 s sf1.
    # Null-valued hours behave exactly like absent hours under
    # ignorenulls-LOCF (the carry passes through), so they drop out of
    # the span rows but still count the same way in n_observed (count
    # of non-null v) and not at all in the fingerprint.
    hourly_nn = hourly.filter(F.col("v").isNotNull())
    w_next = Window.partitionBy("user_id").orderBy("hour")
    sp = hourly_nn.withColumn("next_h", F.lead("hour").over(w_next))
    agg = (
        sp.join(span, on="user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_observed"),
            F.sum(
                F.floor(F.col("v") * 1e6).cast("long")
                * (
                    F.coalesce(F.col("next_h"), F.col("h1") + 1)
                    - F.col("hour")
                )
            ).alias("series_fp"),
        )
    )
    return (
        span.join(agg, on="user_id", how="left")
        .select(
            "user_id",
            (F.col("h1") - F.col("h0") + 1).cast("long").alias("n_hours"),
            F.coalesce(F.col("n_observed"), F.lit(0).cast("long")).alias(
                "n_observed"
            ),
            F.col("series_fp"),
        )
        .orderBy("user_id")
    )


GAP_FILL_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_HOUR_US} AS hour,
         epoch_us(ts) AS ts_us, event_id, value
  FROM events
), hourly AS (
  SELECT user_id, hour, value AS v FROM (
    SELECT user_id, hour, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, hour
                              ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1
), span AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM ev GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM span
)
, filled AS (
  SELECT g.user_id, g.hour, h.v,
         LAST_VALUE(h.v IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
  FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hour = g.hour
)
SELECT user_id, COUNT(*) AS n_hours, COUNT(v) AS n_observed,
       CAST(SUM(CAST(FLOOR(filled_value * 1e6) AS BIGINT)) AS BIGINT) AS series_fp
FROM filled GROUP BY user_id ORDER BY user_id
"""

QUERIES["gap_fill_events"] = Query(
    gap_fill_events, GAP_FILL_SQL, tags=("events", "timeseries")
)


# ------------------------------------------------ cohort retention
_WEEK_US = 7 * 86_400_000_000


def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix: users cohorted by their first
    signup week; per (cohort_week, week_offset) the count of distinct
    cohort members active that week.  Two aggregations + one equi-join
    on the user key."""
    e = load_tables(spark, sf_dir, ["events"])["events"]
    ev = e.select(
        "user_id",
        F.expr(f"ts_us DIV {_WEEK_US}").alias("week"),
        "event_type",
    )
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
    )
    return (
        ev.join(cohort, on="user_id")
        .filter(F.col("week") >= F.col("cohort_week"))
        .select(
            "user_id", "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_WEEK_US} AS week, event_type FROM events
), cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
)
SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM ev e JOIN cohort c USING (user_id)
WHERE e.week >= c.cohort_week
GROUP BY c.cohort_week, week_offset
ORDER BY c.cohort_week, week_offset
"""

QUERIES["cohort_retention_events"] = Query(
    cohort_retention_events, COHORT_SQL, tags=("events", "cohort")
)


# ------------------------------------------------ data-quality checks
def dq_validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality report over orders: row presence,
    key uniqueness, FK completeness, value range, and referential
    integrity against customer — single-table metrics share ONE
    aggregation pass; the referential check is a counted left-anti
    join."""
    from dataclass_array_spark.operators.dq import (
        dq_metrics,
        dq_report,
        referential_violations,
    )

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    o, c = t["orders"], t["customer"]
    metrics = dq_metrics(
        o,
        {
            "row_count": F.count("*"),
            "o_orderkey_dups": F.count("*") - F.countDistinct("o_orderkey"),
            "o_custkey_nulls": F.count("*") - F.count("o_custkey"),
            "o_totalprice_negative": F.count_if(F.col("o_totalprice") < 0),
            "o_orderdate_nulls": F.count("*") - F.count("o_orderdate"),
        },
    )
    ref = referential_violations(
        o, c, "o_custkey", "c_custkey", "orders_customer_orphans"
    )
    return dq_report(metrics, ref, zero_ok=("row_count",))


DQ_ORDERS_SQL = """
WITH m AS (
  SELECT COUNT(*) AS row_count,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS o_orderkey_dups,
         COUNT(*) - COUNT(o_custkey) AS o_custkey_nulls,
         COUNT(CASE WHEN o_totalprice < 0 THEN 1 END) AS o_totalprice_negative,
         COUNT(*) - COUNT(o_orderdate) AS o_orderdate_nulls
  FROM orders
), ref AS (
  SELECT COUNT(*) AS n FROM orders o
  WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
), r AS (
  SELECT 'row_count' AS check, row_count AS observed FROM m
  UNION ALL SELECT 'o_orderkey_dups', o_orderkey_dups FROM m
  UNION ALL SELECT 'o_custkey_nulls', o_custkey_nulls FROM m
  UNION ALL SELECT 'o_totalprice_negative', o_totalprice_negative FROM m
  UNION ALL SELECT 'o_orderdate_nulls', o_orderdate_nulls FROM m
  UNION ALL SELECT 'orders_customer_orphans', n FROM ref
)
SELECT "check", CAST(observed AS BIGINT) AS observed,
       CASE WHEN "check" = 'row_count' THEN observed > 0
            ELSE observed = 0 END AS passed
FROM r ORDER BY "check"
"""

QUERIES["dq_validate_orders"] = Query(
    dq_validate_orders, DQ_ORDERS_SQL, tags=("quality", "validation")
)


# ------------------------------------------------ column profiling
_PROFILE_COLS = (
    "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
    "l_returnflag", "l_shipdate",
)


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of lineitem: row/null/distinct counts
    plus dtype-normalized exact min/max (ints as-is, doubles ×1e6
    floored, timestamps as epoch micros, strings null)."""
    from dataclass_array_spark.operators.dq import profile_columns

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return profile_columns(li, list(_PROFILE_COLS))


def _profile_sql() -> str:
    specs = {
        "l_orderkey": ("MIN(l_orderkey)", "MAX(l_orderkey)"),
        "l_linenumber": ("MIN(l_linenumber)", "MAX(l_linenumber)"),
        "l_quantity": ("FLOOR(MIN(l_quantity) * 1e6)", "FLOOR(MAX(l_quantity) * 1e6)"),
        "l_extendedprice": (
            "FLOOR(MIN(l_extendedprice) * 1e6)",
            "FLOOR(MAX(l_extendedprice) * 1e6)",
        ),
        "l_returnflag": ("NULL", "NULL"),
        "l_shipdate": ("epoch_us(MIN(l_shipdate))", "epoch_us(MAX(l_shipdate))"),
    }
    selects = [
        f"""SELECT '{c}' AS col, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST({mn} AS BIGINT) AS min_v, CAST({mx} AS BIGINT) AS max_v
FROM lineitem"""
        for c, (mn, mx) in specs.items()
    ]
    return "\nUNION ALL\n".join(selects) + "\nORDER BY col"


QUERIES["profile_lineitem"] = Query(
    profile_lineitem, _profile_sql(), tags=("quality", "profiling")
)


# ------------------------------------------------ token-budget curation
_BUDGET_TOKENS = 800  # binds at sf0.01 (sources carry ~1.1-1.6k tokens there)


def budget_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget curation: rank each source's documents
    by the quality heuristic (ties → doc_id), keep documents while the
    source's running token total fits the budget."""
    from dataclass_array_spark.operators.sampling import budget_select

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    return budget_select(
        d, "doc_id", "source",
        score=tx.quality_score(F.col("text")),
        n_tokens=tx.token_count(F.col("text")),
        budget=_BUDGET_TOKENS,
    ).orderBy("doc_id")


def _budget_select_sql() -> str:
    q = tx.sql_quality("text")
    return f"""
WITH t AS (
  SELECT doc_id, source, {q} AS q, len({_SQL_TOKS}) AS n FROM documents
), r AS (
  SELECT doc_id, source, n,
         SUM(n) OVER (PARTITION BY source ORDER BY q DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, source, CAST(n AS BIGINT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens
FROM r WHERE cum <= {_BUDGET_TOKENS} ORDER BY doc_id
"""


QUERIES["budget_select_docs"] = Query(
    budget_select_docs, _budget_select_sql(), tags=("sampling", "curation")
)


# ------------------------------------------------ k-core (round 8)
_KCORE_K = 45


def kcore_user_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the bipartite user↔state interaction graph (user_id on
    one side, the JSON props key offset by 10^6 on the other): peel
    iteratively until every surviving node touches ≥ 45 surviving
    partners.  k=45 peels ~31 nodes through several cascade rounds at
    sf0.01 — real iterative behavior, converged well inside the
    oracle's 12 unrolled rounds."""
    from dataclass_array_spark.operators.graph import k_core

    e = load_tables(spark, sf_dir, ["events"])["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    edges = (
        e.select(F.col("user_id").alias("src"), (F.lit(1000000) + k).alias("dst"))
        .filter(F.col("dst").isNotNull())
    )
    return k_core(edges, k=_KCORE_K, src="src", dst="dst")


def _kcore_sql() -> str:
    from dataclass_array_spark.operators.graph import k_core_sql

    edges = """
  SELECT DISTINCT LEAST(u0, v0) AS u, GREATEST(u0, v0) AS v FROM (
    SELECT user_id AS u0,
           1000000 + CAST(json_extract_string(props, '$.k') AS BIGINT) AS v0
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
  )"""
    return k_core_sql(edges, _KCORE_K, rounds=12)


QUERIES["kcore_user_states"] = Query(
    kcore_user_states, _kcore_sql(), tags=("graph", "kcore")
)


# ------------------------------------------------ MAD outliers (round 8)
_MAD_K = 1.8


def outlier_mad_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag robust outlier screen on l_quantity: exact
    histogram medians (two-middle-rows rule) for both the median and
    the MAD, then count rows beyond 1.8 MADs."""
    from dataclass_array_spark.operators.robust import mad_outliers

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    out = mad_outliers(li, "l_returnflag", "l_quantity", k=_MAD_K)
    return out.select(
        "l_returnflag",
        F.floor(F.col("median") * 1e9).cast("long").alias("median_e9"),
        F.floor(F.col("mad") * 1e9).cast("long").alias("mad_e9"),
        "n_outliers",
        "n_rows",
    )


def _mad_sql() -> str:
    from dataclass_array_spark.operators.robust import mad_outliers_sql

    inner = mad_outliers_sql(
        "lineitem", "l_returnflag", "l_quantity", k=_MAD_K,
        order_cols=["l_orderkey", "l_linenumber"],
    )
    return f"""
SELECT l_returnflag,
       CAST(FLOOR(median * 1e9) AS BIGINT) AS median_e9,
       CAST(FLOOR(mad * 1e9) AS BIGINT) AS mad_e9,
       n_outliers, n_rows
FROM ({inner}) ORDER BY l_returnflag"""


QUERIES["outlier_mad_quantity"] = Query(
    outlier_mad_quantity, _mad_sql(), tags=("stats", "quality")
)


# ------------------------------------------------ record linkage (round 8)
_LK_FIELDS = [
    ("p_name", "token_jaccard", 0.6),
    ("p_type", "exact", 0.25),
    ("p_size", "exact", 0.15),
]
_LK_THRESH = 0.7
_LK_CAP = 120


def linkage_part_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over parts: block on p_brand, score
    0.6·token-jaccard(name) + 0.25·[type equal] + 0.15·[size equal],
    keep pairs ≥ 0.7 — the Fellegi-Sunter-style weighted-comparator
    linkage, never all-pairs."""
    from dataclass_array_spark.operators.linkage import blocked_linkage

    p = load_tables(spark, sf_dir, ["part"])["part"]
    out = blocked_linkage(
        p, "p_partkey", "p_brand", _LK_FIELDS, _LK_THRESH,
        max_block_size=_LK_CAP,
    )
    return out.select(
        "id_a", "id_b",
        F.floor(F.col("score") * 1e9).cast("long").alias("score_e9"),
    )


def _linkage_sql() -> str:
    from dataclass_array_spark.operators.linkage import blocked_linkage_sql

    inner = blocked_linkage_sql(
        "part", "p_partkey", "p_brand", _LK_FIELDS, _LK_THRESH,
        max_block_size=_LK_CAP,
    )
    return f"""
SELECT id_a, id_b, CAST(FLOOR(score * 1e9) AS BIGINT) AS score_e9
FROM ({inner}) ORDER BY id_a, id_b"""


QUERIES["linkage_part_entities"] = Query(
    linkage_part_entities, _linkage_sql(), tags=("linkage", "dedup")
)


# ------------------------------------------------ duplicate spans (round 8)
_SPAN_L = 8


def duplicate_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication report: rolling 8-token windows
    hashed corpus-wide; per-doc tokens covered by a window that occurs
    more than once (overlaps merged into maximal spans).  All-integer
    output — value-exact."""
    from dataclass_array_spark.operators.dedup import duplicate_spans

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    return duplicate_spans(d, "doc_id", "text", span_len=_SPAN_L).orderBy(
        "doc_id"
    )


_SPAN_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), w AS MATERIALIZED (
  SELECT doc_id, i - 1 AS start,
         md5(array_to_string(toks[i:i+{_SPAN_L - 1}], ' ')) AS h
  FROM toks, UNNEST(generate_series(1, len(toks) - {_SPAN_L - 1})) AS g(i)
  WHERE len(toks) >= {_SPAN_L}
), dupkeys AS (
  SELECT h FROM w GROUP BY h HAVING COUNT(*) > 1
), dup AS (
  SELECT w.doc_id, w.start FROM w JOIN dupkeys USING (h)
), flagged AS (
  SELECT doc_id, start,
         CASE WHEN start > COALESCE(
             MAX(start + {_SPAN_L}) OVER (PARTITION BY doc_id ORDER BY start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
           THEN 1 ELSE 0 END AS newg
  FROM dup
), grp AS (
  SELECT doc_id, start,
         SUM(newg) OVER (PARTITION BY doc_id ORDER BY start) AS g
  FROM flagged
), iv AS (
  SELECT doc_id, MAX(start) + {_SPAN_L} - MIN(start) AS len
  FROM grp GROUP BY doc_id, g
), cov AS (
  SELECT doc_id, SUM(len) AS dup_tokens FROM iv GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM toks t LEFT JOIN cov c USING (doc_id) ORDER BY t.doc_id
"""

QUERIES["duplicate_spans_docs"] = Query(
    duplicate_spans_docs, _SPAN_SQL, tags=("dedup", "text", "spans")
)


# ------------------------------------------ entity clusters (round 8)
def linkage_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full entity-resolution pipeline: blocked weighted linkage
    pairs → connected components (transitive closure) → canonical
    entity per cluster (lowest key) with the cluster size.  One
    composition of `blocked_linkage` + `connected_components` — the
    shape a master-data dedup actually ships."""
    from dataclass_array_spark.operators.graph import connected_components
    from dataclass_array_spark.operators.linkage import blocked_linkage

    p = load_tables(spark, sf_dir, ["part"])["part"]
    pairs = blocked_linkage(
        p, "p_partkey", "p_brand", _LK_FIELDS, _LK_THRESH,
        max_block_size=_LK_CAP,
    )
    cc = connected_components(pairs.select("id_a", "id_b"))
    sizes = cc.groupBy("comp").agg(F.count("*").cast("long").alias("n_members"))
    return (
        cc.join(sizes, on="comp")
        .select(
            F.col("node").cast("long").alias("p_partkey"),
            F.col("comp").cast("long").alias("entity_id"),
            "n_members",
        )
        .orderBy("p_partkey")
    )


def _linkage_clusters_sql() -> str:
    from dataclass_array_spark.operators.linkage import blocked_linkage_sql

    inner = blocked_linkage_sql(
        "part", "p_partkey", "p_brand", _LK_FIELDS, _LK_THRESH,
        max_block_size=_LK_CAP,
    ).replace("ORDER BY id_a, id_b", "")
    return f"""
WITH RECURSIVE pairs AS ({inner}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b AS u, id_a AS v FROM pairs
),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (
  SELECT u AS node, LEAST(u, MIN(v)) AS entity_id FROM reach GROUP BY u
),
sizes AS (
  SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM comp GROUP BY entity_id
)
SELECT c.node AS p_partkey, c.entity_id, s.n_members
FROM comp c JOIN sizes s USING (entity_id)
ORDER BY p_partkey
"""


QUERIES["linkage_entity_clusters"] = Query(
    linkage_entity_clusters, _linkage_clusters_sql(),
    tags=("linkage", "graph", "dedup"),
)


# ------------------------------------------------ winsorization (round 8)
_WZ_QLO, _WZ_QHI = 0.05, 0.95


def winsorize_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag winsorized price totals: exact nearest-rank
    p05/p95 via the value histogram, tails clamped, decimal-exact
    winsorized sum — the robust-total screen for heavy-tailed value
    columns."""
    from dataclass_array_spark.operators.robust import winsorize_stats

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    out = winsorize_stats(
        li, "l_returnflag", "l_extendedprice", q_lo=_WZ_QLO, q_hi=_WZ_QHI
    )
    return out.select(
        "l_returnflag",
        F.floor(F.col("lo") * 1e9).cast("long").alias("lo_e9"),
        F.floor(F.col("hi") * 1e9).cast("long").alias("hi_e9"),
        "n_lo", "n_hi",
        F.floor(F.col("sum_winsorized") * 1e6).cast("long").alias("sum_e6"),
    )


def _winsorize_sql() -> str:
    from dataclass_array_spark.operators.robust import winsorize_sql

    inner = winsorize_sql(
        "lineitem", "l_returnflag", "l_extendedprice", _WZ_QLO, _WZ_QHI,
        order_cols=["l_orderkey", "l_linenumber"],
    )
    return f"""
SELECT l_returnflag,
       CAST(FLOOR(lo * 1e9) AS BIGINT) AS lo_e9,
       CAST(FLOOR(hi * 1e9) AS BIGINT) AS hi_e9,
       n_lo, n_hi,
       CAST(FLOOR(sum_winsorized * 1e6) AS BIGINT) AS sum_e6
FROM ({inner}) ORDER BY l_returnflag"""


QUERIES["winsorize_price_stats"] = Query(
    winsorize_price_stats, _winsorize_sql(), tags=("stats", "quality")
)


# ------------------------------------------------ LPA communities (round 8)
_LPA_ROUNDS = 4


def community_user_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic label-propagation communities over the bipartite
    user↔state graph, 4 synchronous rounds (smallest-label ties).  The
    dense synthetic graph collapses to the two bipartition labels —
    the unit suite proves community RECOVERY on planted clusters; this
    gate proves the round arithmetic value-exactly."""
    from dataclass_array_spark.operators.graph import label_propagation

    e = load_tables(spark, sf_dir, ["events"])["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    edges = (
        e.select(F.col("user_id").alias("src"), (F.lit(1000000) + k).alias("dst"))
        .filter(F.col("dst").isNotNull())
    )
    return label_propagation(edges, rounds=_LPA_ROUNDS).select(
        "node", F.col("lbl").cast("long").alias("lbl")
    )


def _lpa_sql() -> str:
    from dataclass_array_spark.operators.graph import label_propagation_sql

    edges = """
  SELECT DISTINCT user_id AS u,
         1000000 + CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
"""
    return label_propagation_sql(edges, rounds=_LPA_ROUNDS)


QUERIES["community_user_states"] = Query(
    community_user_states, _lpa_sql(), tags=("graph", "community")
)


# ------------------------------------------ weighted sampling (round 8)
_WS_N = 200


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A-ES weighted sampling without replacement:
    200 documents drawn proportionally to length (n_chars), via
    portable md5-uniforms and the fixed-order ln series — fully
    oracle-replayable."""
    from dataclass_array_spark.operators.sampling import weighted_sample

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    return weighted_sample(
        d, "doc_id", F.col("n_chars"), n=_WS_N
    ).orderBy("doc_id")


def _weighted_sample_sql() -> str:
    from dataclass_array_spark.operators.sampling import weighted_sample_sql

    inner = weighted_sample_sql("documents", "doc_id", "n_chars", _WS_N)
    return f"SELECT * FROM ({inner}) ORDER BY doc_id"


QUERIES["weighted_sample_docs"] = Query(
    weighted_sample_docs, _weighted_sample_sql(), tags=("sampling",)
)


# ------------------------------------------------ EWMA (round 8)
_EWMA_ALPHA = 0.25


def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values in (ts, event_id) order — the
    recurrence window frames can't express, as an ordered fold
    (bit-identical list_reduce replay in the oracle)."""
    from dataclass_array_spark.operators.timeseries import ewma_last

    e = load_tables(spark, sf_dir, ["events"])["events"]
    out = ewma_last(
        e, "user_id", ["ts_us", "event_id"], "value", alpha=_EWMA_ALPHA
    )
    return out.select(
        "user_id", "n_events",
        F.floor(F.col("ewma") * 1e9).cast("long").alias("ewma_e9"),
    )


def _ewma_sql() -> str:
    from dataclass_array_spark.operators.timeseries import ewma_last_sql

    inner = ewma_last_sql(
        "(SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events)",
        "user_id", ["ts_us", "event_id"], "value", alpha=_EWMA_ALPHA,
    )
    return f"""
SELECT user_id, n_events, CAST(FLOOR(ewma * 1e9) AS BIGINT) AS ewma_e9
FROM ({inner}) ORDER BY user_id"""


QUERIES["ewma_user_values"] = Query(
    ewma_user_values, _ewma_sql(), tags=("timeseries", "window")
)


# ------------------------------------------ nucleus selection (round 8)
_NUC_P = (4, 5)  # keep 80% of the quality mass per source


def nucleus_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-p curation: keep the highest-quality documents
    covering 80% of each source's total quality mass — all-decimal
    arithmetic, bit-free exact."""
    from dataclass_array_spark.operators.sampling import nucleus_select

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    return nucleus_select(
        d, "doc_id", "source",
        score=tx.quality_score(F.col("text")),
        p_num=_NUC_P[0], p_den=_NUC_P[1],
    ).orderBy("doc_id")


def _nucleus_sql() -> str:
    from dataclass_array_spark.operators.sampling import nucleus_select_sql

    return nucleus_select_sql(
        "documents", "doc_id", "source", tx.sql_quality("text"),
        p_num=_NUC_P[0], p_den=_NUC_P[1],
    )


QUERIES["nucleus_select_docs"] = Query(
    nucleus_select_docs, _nucleus_sql(), tags=("sampling", "curation")
)


# ------------------------------------------------ grouped OLS (round 8)
def ols_price_vs_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag least-squares fit of extendedprice against
    quantity — exact decimal moments, identical doubles both engines
    (engine regr_slope implementations differ numerically)."""
    from dataclass_array_spark.operators.robust import ols_by_group

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return ols_by_group(li, "l_returnflag", "l_quantity", "l_extendedprice")


def _ols_sql() -> str:
    from dataclass_array_spark.operators.robust import ols_by_group_sql

    return ols_by_group_sql(
        "lineitem", "l_returnflag", "l_quantity", "l_extendedprice"
    )


QUERIES["ols_price_vs_quantity"] = Query(
    ols_price_vs_quantity, _ols_sql(), tags=("stats", "regression")
)


def ols2_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag TWO-regressor fit: extendedprice against
    (quantity, discount) — normal equations solved by Cramer's rule
    over exact decimal moments, with the determinant expressions shared
    as verbatim text between the plan and the oracle (identical parse →
    identical IEEE op order → hash-exact doubles)."""
    from dataclass_array_spark.operators.robust import ols2_by_group

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return ols2_by_group(
        li, "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    )


def _ols2_sql() -> str:
    from dataclass_array_spark.operators.robust import ols2_by_group_sql

    return ols2_by_group_sql(
        "lineitem", "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    )


QUERIES["ols2_price_model"] = Query(
    ols2_price_model, _ols2_sql(), tags=("stats", "regression")
)


# ------------------------------------------------ SQ8 scalar-quantized ANN
_SQ_K = 5


def embedding_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization ANN (SQ8, the FAISS ScalarQuantizer recipe):
    per-dimension min/max bounds (one aggregate, 128 doubles of driver
    state), corpus stored as 64 uint8 codes (4× smaller than float32 —
    the resident-index form at 100 TB), full-precision queries ranked
    against the DEQUANTIZED codes.  Bounds, clamped floor encoding and
    the index-ordered 64-term distance sum are all deterministic
    doubles mirrored by the oracle — hash-exact like the PQ gates."""
    from dataclass_array_spark.operators.pq import sq8_bounds, sq8_topk

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    bounds = sq8_bounds(e, "embedding", _DIM)
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    out = sq8_topk(
        q, e, "vec_id", "vec_id", "embedding", bounds, k=_SQ_K,
        exclude_self=True,
    )
    return out.select(
        "qid",
        F.col("rank").cast("long").alias("rnk"),
        "nid",
        F.floor(F.col("dist") * 1e9).cast("long").alias("dist_e9"),
    )


def _sq8_sql() -> str:
    d = _DIM
    rec = "(b.mns[i] + (CAST(enc.codes[i] AS DOUBLE) * b.dl[i]) / 255.0)"
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bndt AS (
  SELECT gs.i AS dd, MIN(v[gs.i]) AS mn, MAX(v[gs.i]) AS mx
  FROM e, generate_series(1, {d}) gs(i) GROUP BY gs.i
),
bnd AS (
  SELECT list(mn ORDER BY dd) AS mns, list(mx - mn ORDER BY dd) AS dl
  FROM bndt
),
enc AS (
  SELECT e.vec_id AS nid,
         list_transform(generate_series(1, {d}),
           i -> CASE WHEN b.dl[i] <= 0.0 THEN 0
                     ELSE LEAST(255, GREATEST(0,
                       CAST(FLOOR((e.v[i] - b.mns[i]) * 255.0 / b.dl[i]) AS BIGINT)))
                END) AS codes
  FROM e CROSS JOIN bnd b
),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.qid, enc.nid,
         list_reduce(list_prepend(0.0, list_transform(
           list_transform(generate_series(1, {d}), i -> q.qv[i] - {rec}),
           x -> x * x)), (a, v2) -> a + v2) AS dist
  FROM enc CROSS JOIN bnd b JOIN q ON q.qid != enc.nid
)
SELECT qid, CAST(rn AS BIGINT) AS rnk, nid,
       CAST(FLOOR(dist * 1e9) AS BIGINT) AS dist_e9
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
      FROM scored)
WHERE rn <= {_SQ_K}
ORDER BY qid, rnk
"""


QUERIES["embedding_ann_sq8"] = Query(
    embedding_ann_sq8, _sq8_sql(), tags=("similarity", "ann", "quantization")
)
