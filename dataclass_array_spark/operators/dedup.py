"""Deduplication family for training-data pipelines:

- exact dedup (content-hash groupBy)
- n-gram Jaccard near-dup (shingle inverted index)
- MinHash + LSH banding (the 100 TB scale path)
- SimHash fingerprints

Design for scale:
- Shingling, minhash signatures, and simhash are pure column expressions
  computed inside the scan stage (no explode for signatures — a
  ``transform``/``aggregate`` fold over the token array per row).
- The only shuffles are the band-bucket self-join (MinHash-LSH) or the
  shingle inverted-index join (exact Jaccard), both on well-distributed
  hash keys; hot shingles are capped by document frequency to bound
  fan-out (identically in the oracle).
- All hashes derive from md5 so the DuckDB oracle reproduces them
  bit-for-bit (no engine-private hash functions).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataclass_array_spark.operators.text import md5_fingerprint, tokens


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group by content hash; keep the smallest id as canonical.
    One shuffle on the 128-bit hash — uniformly distributed, skew-free."""
    return (
        df.select(md5_fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_docs"))
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (1-based element_at; empty array when the
    doc has fewer than k tokens).  The token array is let-bound so the
    regex split runs once per row, not once per shingle reference."""
    from dataclass_array_spark.operators.text import let

    def build(toks: Column) -> Column:
        n = F.size(toks)
        mk = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
        return F.when(n >= k, F.array_distinct(mk)).otherwise(
            F.array().cast("array<string>")
        )

    return let(tokens(text), build)


def _hash60(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 → BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# Universal-hash mixing constants (fixed LCG, seed 1): ONE md5 per shingle
# feeds all n minhash functions as (A_s*h + B_s) mod P — 16× fewer md5
# calls than per-seed hashing, identical scheme inlined in the oracle SQL.
_MINHASH_P = (1 << 61) - 1


def _lcg_constants(n: int) -> tuple[list[int], list[int]]:
    a, out_a, out_b = 1, [], []
    for _ in range(n):
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out_a.append((a % ((1 << 29) - 1)) | 1)  # odd, < 2^29 (no bigint overflow)
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out_b.append(a % _MINHASH_P)
    return out_a, out_b


MINHASH_A, MINHASH_B = _lcg_constants(64)


def _hash32(col: Column) -> Column:
    """Portable 32-bit hash: first 8 hex chars of md5 → BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_signature(shingles: Column, n_hashes: int) -> list[Column]:
    """n minhashes as separate columns — computed by array folds in the
    scan stage, no explode, no shuffle.  One md5 per shingle; the n hash
    functions are universal-hash mixes of that base value."""
    base = F.transform(shingles, _hash32)

    def mixer(s: int):
        # single-param lambda: a second param would make Spark pass the
        # array index into it
        return lambda h: (h * MINHASH_A[s] + MINHASH_B[s]) % _MINHASH_P

    return [
        F.array_min(F.transform(base, mixer(s))).alias(f"mh{s}")
        for s in range(n_hashes)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.3,
    shingle_k: int = 3,
    max_bucket_size: "int | str | None" = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Plan shape (the part that must survive 100 TB):
    1. signatures: narrow, in-scan.
    2. band explode: rows × ``bands`` (small constant) — ids and band
       signatures ONLY.  The shingle arrays (≈ the document's own size)
       do NOT ride this explode: through round 6 they did, which
       replicated every document's full shingle set ``bands``× into the
       band shuffle and again on both sides of the candidate join — at
       100 TB that payload dominates the corpus volume.
    3. self-join on (band, signature): shuffle on a uniform hash key —
       this is the ONLY quadratic-risk step and banding keeps buckets
       tiny by construction *for distinct-ish corpora*.  Exchange rows
       are now (doc_id, band, sig) — fixed-width, array-free
       (plan-asserted in tests/test_plans.py).
    4. verify on the DEDUPED candidate set only: join the (id_a, id_b)
       pairs back to the ``doc_id → shingles`` frame once per side —
       two equi-joins on doc_id whose payload is ONE copy of each
       participating document's shingles, instead of ``bands`` copies
       through the band shuffle.  Same pairs, same jaccard.  Measured
       design choices (sf1, round 7): the shingle frame is RECOMPUTED
       per consumer, not pinned — the scan+shingle pipeline is an
       in-scan codegen expression (~1 s per pass at sf1) while
       materializing the fat string arrays costs ~4 s
       (localCheckpoint serialize) and caches corpus-sized state; and
       both verify joins carry explicit ``shuffle_hash`` hints —
       without them AQE broadcast-built the FAT shingle side (8.7 s);
       a broadcast of the id pairs is fastest locally (4.4 s) but a
       candidate list is corpus-scale in the worst case, so the hash
       join with the SMALL/bounded build side (id pairs resp. one
       per-partition slice of the shingle frame) is the 100 TB-safe
       shape (4.9-5.2 s) — no sort of array rows, no driver-sized
       broadcast.

    ``max_bucket_size`` guards step 3 against degenerate corpora: a
    viral document duplicated millions of times puts every copy in the
    same (band, sig) bucket and the self-join goes quadratic in that
    bucket.  With a cap, buckets larger than ``max_bucket_size`` are
    DROPPED before the join (window count over the same (band, sig)
    key the join shuffles on, so AQE reuses the exchange — no extra
    shuffle).  Recall impact: a pair is lost only if *every* band that
    matched it was oversized; for a cap of B docs the skipped work is
    exactly the O(B²)-per-bucket blowup.  Callers who want the members
    of a mega-cluster should exact-dedup first (identical copies
    collapse there for free) and run MinHash on the survivors.

    ``max_bucket_size="auto"`` derives the cap from the corpus's own
    bucket-size histogram instead of a fixed constant, targeting the
    actual scale guarantee: candidate pairs stay LINEAR in corpus size.
    Walking the histogram smallest-bucket-first, the cap is the largest
    size whose cumulative sum(n_b^2) fits a budget of 8 pairs per
    banded row (floor 16) — natural buckets pass, and any bucket big
    enough to push the self-join super-linear (the degenerate-corpus
    case) is dropped regardless of how many such buckets there are.
    Costs one extra tiny job over the aggregated (band, sig) counts —
    histogram rows = distinct bucket sizes, not documents.
    """
    rows_per_band = n_hashes // bands
    # md5 signatures are CPU-bound: spread the corpus across all cores
    # before the narrow compute (a single small parquet file would
    # otherwise pin the whole signature stage to one task)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), shingle_k).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    sig = base.select("doc_id", "shingles", *minhash_signature(F.col("shingles"), n_hashes))
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ":", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("sig"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    if max_bucket_size == "auto":
        hist = (
            banded.groupBy("band", "sig")
            .count()
            .groupBy(F.col("count").alias("bsize"))
            .agg(F.count("*").alias("n_buckets"))
            .collect()
        )
        n_rows = sum(r["bsize"] * r["n_buckets"] for r in hist)
        budget = 8 * n_rows
        cum, cap = 0, 16
        for r in sorted(hist, key=lambda r: r["bsize"]):
            cum += r["bsize"] * r["bsize"] * r["n_buckets"]
            if cum > budget:
                break
            cap = max(cap, int(r["bsize"]))
        max_bucket_size = cap
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "sig")
        banded = banded.withColumn("_bn", F.count("*").over(w)).filter(
            F.col("_bn") <= max_bucket_size
        ).drop("_bn")
    a = banded.alias("a")
    b = banded.alias("b")
    ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify join-back: one shingles copy per participating doc per
    # side.  shuffle_hash hints pin the build sides to the SMALL /
    # bounded frames (see docstring) — AQE otherwise broadcast-builds
    # the fat array side.
    sh_a = base.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = base.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    cand = ids.hint("shuffle_hash").join(sh_a, on="id_a").join(
        sh_b.hint("shuffle_hash"), on="id_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.2,
    shingle_k: int = 3,
    max_doc_freq: Optional[int] = 1000,
    prefix_filter: bool = True,
) -> DataFrame:
    """All-pairs n-gram Jaccard via shingle inverted index.

    ``max_doc_freq`` drops ubiquitous shingles before the self-join —
    the standard fan-out cap (a shingle in f docs creates f² candidate
    rows); applied identically in the oracle so results still match.
    Jaccard is computed over the CAPPED shingle sets.

    ``prefix_filter`` (PPJoin, ON by default — round 8; bound made
    double-comparison-sound in round 9) indexes only each doc's ``|X|
    − floor(pred(t)·|X|)`` RAREST shingles under the global (doc-freq
    asc, shingle asc) order for CANDIDATE generation — ``pred(t)`` is
    the next double below the threshold — then counts intersections by
    joining the candidate pairs back to the full (capped) shingle sets,
    the MinHash join-back-verify shape.  Result-LOSSLESS against the
    verify step's DOUBLE comparison, so the oracle needs no mirror: a
    kept pair has ``round(|A∩B|/|A∪B|) ≥ t`` in doubles, hence real
    jaccard strictly above ``pred(t)``, hence ``|A∩B| ≥
    floor(pred(t)·|X|) + 1`` for each side (union ≥ |X|), and by the
    standard prefix lemma its two prefixes intersect — the pair
    survives candidate generation; sub-threshold pairs may be pruned
    earlier, which is the point.  The bound is evaluated in exact
    integer (DECIMAL) arithmetic — see the inline comment for why the
    naive ``ceil(t·n)`` double form prunes at-threshold pairs.  At
    100 TB this removes the hot-shingle fan-out the doc-freq cap only
    bounds: a shingle shared by f docs appears in few PREFIXES unless
    it is genuinely rare."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(F.col(text_col), shingle_k)).alias("sh"),
        )
    )
    if max_doc_freq is not None:
        freq = sh.groupBy("sh").agg(F.count("*").alias("df_"))
        sh = sh.join(freq.filter(F.col("df_") <= max_doc_freq), "sh").drop("df_")
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if prefix_filter:
        from pyspark.sql import Window

        import math
        from fractions import Fraction

        pfreq = sh.groupBy("sh").agg(F.count("*").alias("pf_"))
        wp = Window.partitionBy("doc_id").orderBy("pf_", "sh")
        wn = Window.partitionBy("doc_id")
        # Prefix rank bound, computed EXACTLY in integers and SOUND
        # against the final DOUBLE comparison (round-9 fix; ADVICE r8).
        # The verify step keeps a pair iff round(i/u) >= t in doubles;
        # correctly-rounded division means any such pair has real
        # jaccard i/u STRICTLY above pred(t), the next double below t
        # (x rounds to >= t ⟹ x >= midpoint(pred(t), t) > pred(t)).
        # With union >= |X| that gives i > pred(t)·|X| ⟹ i >=
        # floor(pred(t)·|X|) + 1 guaranteed intersection per side, so
        # prefix length |X| − floor(pred(t)·|X|) suffices.  As integers
        # with the EXACT dyadic rational pred(t) = p/q (``Fraction(
        # float)`` is exact): ``rn <= n - floor(p·n/q)`` ⇔ ``p·n <
        # q·(n - rn + 1)`` (``floor(x) <= m ⇔ x < m+1``).  The round-8
        # float form ``ceil(lit(t)·n)`` was unsound at boundaries —
        # t=0.07, n=100: double(0.07) > 7/100, so even exact ceil gives
        # 8 and prunes a pair whose double jaccard 7.0/100.0 == the
        # t literal; pred(t)·100 = 6.9999… floors to 6, prefix 94,
        # pair kept.  DECIMAL(38,0) products: p,q <= ~2^53 and n is a
        # per-doc shingle count, so p·n <= ~1e25 ≪ 1e38.
        _t = Fraction(max(math.nextafter(float(threshold), 0.0), 0.0))
        _p = F.lit(_t.numerator).cast("decimal(38,0)")
        _q = F.lit(_t.denominator).cast("decimal(38,0)")
        pref = (
            sh.join(pfreq, on="sh")
            .withColumn("_n", F.count("*").over(wn))
            .withColumn("_rn", F.row_number().over(wp))
            .filter(
                _p * F.col("_n") < _q * (F.col("_n") - F.col("_rn") + 1)
            )
            .select("doc_id", "sh")
        )
        pa, pb = pref.alias("pa"), pref.alias("pb")
        cand = (
            pa.join(
                pb,
                (F.col("pa.sh") == F.col("pb.sh"))
                & (F.col("pa.doc_id") < F.col("pb.doc_id")),
            )
            .select(
                F.col("pa.doc_id").alias("id_a"),
                F.col("pb.doc_id").alias("id_b"),
            )
            .distinct()
        )
        sa = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
        sb = sh.select(F.col("doc_id").alias("_idb"), F.col("sh").alias("sh_b"))
        inter = (
            cand.join(sa, on="id_a")
            .join(
                sb,
                (F.col("id_b") == F.col("_idb"))
                & (F.col("sh_a") == F.col("sh_b")),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
            .agg(F.count("*").alias("n_inter"))
        )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    return (
        inter.join(ca, F.col("id_a") == F.col("ca.doc_id"))
        .join(cb, F.col("id_b") == F.col("cb.doc_id"))
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (
                F.col("n_inter").cast("double")
                / (F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def simhash(text: Column, n_bits: int = 32) -> Column:
    """SimHash fingerprint over whitespace tokens (with multiplicity).

    Element-wise ±1 vote fold over the token array — one expression, no
    explode: bit j of token hash votes +1/−1; fingerprint bit j set iff
    the vote sum is positive."""
    # hash each token ONCE (md5 is the expensive part), then fold ±1
    # bit-votes over the hash array; shift amounts are Python ints
    hashes = F.transform(tokens(text), _hash60)

    def bit_votes(h):
        return F.array(
            *[
                (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
                for j in range(n_bits)
            ]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), n_bits),
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda x, y: x + y),
    )

    def assemble(v: Column) -> Column:
        # v is let-bound: the whole vote fold runs once, not n_bits times
        out = F.lit(0).cast("long")
        for j in range(n_bits):
            out = out + F.when(
                F.element_at(v, j + 1) > 0, F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return out

    from dataclass_array_spark.operators.text import let

    return let(votes, assemble)


def drop_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Apply near-dup pairs: keep the lower id of every pair (the
    standard keep-first policy — drop every doc that appears as the
    higher side).  One left_anti join against the (small) drop set;
    no transitive closure needed under keep-lowest since any doc paired
    with a lower-id doc is dropped regardless of chains."""
    drops = pairs.select(F.col(id_b).alias(id_col)).distinct()
    return df.join(drops, on=id_col, how="left_anti")


def dedup_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 20,
) -> DataFrame:
    """Chunk-level exact dedup — the C4 "deduplicate at the line level"
    rule generalized to fixed token windows: split every document into
    non-overlapping ``chunk_size``-token chunks, keep only the globally
    FIRST occurrence (lowest ``(id, chunk_idx)``) of each distinct
    chunk, and report per document how much survived.

    Returns ``(id, n_chunks, n_kept, kept_md5)`` where ``kept_md5``
    fingerprints the document's surviving text (kept chunks re-joined
    in order; empty string when everything was seen before).  EVERY
    distinct input id gets a row: token-less documents (empty/
    whitespace/NULL text) report ``(id, 0, 0, md5(''))`` instead of
    silently vanishing from corpus-wide survival stats (the explode
    would otherwise drop them — round-7 ADVICE).

    Scale shape: chunking is an in-scan expression; the ONLY shuffle of
    chunk text is the first-occurrence window on ``chunk_md5`` — a
    uniformly distributed 128-bit key (no skew, no self-join, never
    all-pairs), exactly the hash-partition a 100 TB line-dedup needs.
    The per-doc reassembly groups on ``id``, carrying one row per chunk
    with a boolean instead of the chunk text (the md5 and kept flag are
    enough to rebuild counts; text rides only for kept chunks).
    """
    from dataclass_array_spark.operators.text import chunk_tokens
    from pyspark.sql import Window

    ch = df.select(
        F.col(id_col),
        F.explode(chunk_tokens(F.col(text_col), chunk_size, 0)).alias("c"),
    ).select(
        F.col(id_col),
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.md5(F.col("c.chunk_text")).alias("chunk_md5"),
    )
    w = Window.partitionBy("chunk_md5").orderBy(F.col(id_col), F.col("chunk_id"))
    flagged = ch.withColumn("rn", F.row_number().over(w)).select(
        F.col(id_col),
        "chunk_id",
        (F.col("rn") == 1).alias("kept"),
        F.when(F.col("rn") == 1, F.col("chunk_text")).alias("kept_text"),
    )
    stats = (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.filter(
                            F.sort_array(
                                F.collect_list(
                                    F.when(
                                        F.col("kept"),
                                        F.struct(
                                            F.col("chunk_id"), F.col("kept_text")
                                        ),
                                    )
                                )
                            ),
                            lambda s: s.isNotNull(),
                        ),
                        lambda s: s["kept_text"],
                    ),
                )
            ).alias("kept_md5"),
        )
    )
    # token-less docs produced no chunk rows — join back so the
    # survival report covers every distinct input id
    return df.select(F.col(id_col)).distinct().join(stats, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("n_chunks"), F.lit(0).cast("long")).alias("n_chunks"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce(F.col("kept_md5"), F.md5(F.lit(""))).alias("kept_md5"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int = 48,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: Optional[int] = None,
) -> DataFrame:
    """SimHash near-duplicate pairs: banded Hamming-ball candidates +
    popcount verify — completes the SimHash family from fingerprints
    (:func:`simhash`) to an actual dedup join.

    Soundness (pigeonhole): two fingerprints within ``max_hamming <
    bands`` bits of each other differ in fewer bits than there are
    disjoint ``n_bits/bands``-bit slices, so at least one slice is
    IDENTICAL — the banded equi-join generates every candidate in the
    Hamming ball, and ``bit_count(xor)`` verifies exactly.

    Scale shape (same discipline as :func:`minhash_lsh_pairs`): the
    fingerprint is one in-scan fold; the band explode carries
    ``(doc_id, fp, band, key)`` — fixed-width, 8-byte fp, no text, no
    arrays — and the ONLY shuffle is the self-join on the uniform
    ``(band, key)`` hash key.  The fp rides the band rows (unlike
    MinHash's shingle arrays it costs nothing), so verification needs
    no join-back.  ``max_bucket_size`` drops oversized (band, key)
    buckets before the join — the degenerate-corpus guard, same window-
    on-the-join-key trick as MinHash (exchange reused, no extra
    shuffle); mirror any cap into the oracle.
    """
    if n_bits % bands:
        raise ValueError(f"n_bits={n_bits} not divisible by bands={bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs < bands={bands} for the "
            "pigeonhole guarantee (some slice must be untouched)"
        )
    w = n_bits // bands
    mask = (1 << w) - 1
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    fp = df.select(
        F.col(id_col).alias("doc_id"),
        simhash(F.col(text_col), n_bits).alias("fp"),
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("fp", b * w).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(bands)
    ]
    banded = fp.select(
        "doc_id", "fp", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "doc_id", "fp",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        wn = Window.partitionBy("band", "key")
        banded = (
            banded.withColumn("_bn", F.count("*").over(wn))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.fp").alias("fa"),
            F.col("b.fp").alias("fb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def dedup_incremental(
    new_df: DataFrame,
    store_df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.3,
    shingle_k: int = 3,
    max_bucket_size: Optional[int] = None,
    pin_base: bool = True,
) -> DataFrame:
    """Incremental (batch-vs-store) dedup — the daily-crawl shape: flag
    every NEW document that duplicates the EXISTING corpus, exactly
    (content fingerprint) or nearly (MinHash bands + Jaccard verify).
    Returns one row per new doc: ``(id, exact_dup, near_dup)``.

    Scale shape: the store is orders of magnitude larger than the batch
    and is NEVER self-joined — both probes are equi-joins on uniform
    hash keys (the content fingerprint, resp. the (band, sig) bucket)
    that a production store would serve from a pre-bucketed,
    incrementally-maintained signature table; batch-internal duplicates
    are deliberately out of scope (that is :func:`minhash_lsh_pairs` /
    :func:`exact_dedup` on the batch).  ``max_bucket_size`` caps
    (band, sig) buckets over the UNION's band rows — a viral doc may
    live on either side — on the same key the join shuffles on.

    ``pin_base`` is the space-time trade on the six-times-referenced
    fingerprint+shingle frame.  True (default, measured faster at every
    bench SF): materialize it ONCE — this stores shingle arrays for
    every store+batch document in executor memory/disk for the
    query's duration, roughly one corpus-sized spill.  False restores
    the recompute shape (each reference re-runs union+md5+shingling,
    and only matched candidates ever carry shingle arrays through a
    shuffle — the :func:`minhash_lsh_pairs` design): the right choice
    when the store is too large to spill a second copy of.
    """
    from dataclass_array_spark.operators.text import md5_fingerprint

    rows_per_band = n_hashes // bands
    par = new_df.sparkSession.sparkContext.defaultParallelism
    tagged = (
        new_df.select(
            F.lit("n").alias("side"),
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__t"),
        )
        .unionByName(
            store_df.select(
                F.lit("s").alias("side"),
                F.col(id_col).alias("doc_id"),
                F.col(text_col).alias("__t"),
            )
        )
        .repartition(par)
    )
    from dataclass_array_spark.core.table import pin_materialization

    # Pin ONCE (round-15): base is referenced SIX times (new-id list,
    # both exact-probe sides, the signature pass, both verify sides) —
    # unpinned, each reference re-ran the union + md5 + shingling of
    # both corpora (18 parquet scans in the gate plan).  This differs
    # from minhash_lsh_pairs' measured keep-recomputing choice (3
    # references there): at six references the recompute bill crosses
    # the materialization cost.  The pin stores per-doc shingle arrays
    # (corpus-sized spill) — gate with pin_base=False on stores too
    # large for that (docstring).
    base = tagged.select(
        "side",
        "doc_id",
        md5_fingerprint(F.col("__t")).alias("fp"),
        word_shingles(F.col("__t"), shingle_k).alias("shingles"),
    )
    if pin_base:
        base = pin_materialization(base, "local")
    new_ids = base.filter(F.col("side") == "n").select("doc_id")
    exact = (
        base.filter(F.col("side") == "n")
        .select("doc_id", "fp")
        .join(
            base.filter(F.col("side") == "s").select("fp").distinct(),
            on="fp",
            how="left_semi",
        )
        .select("doc_id")
        .distinct()
    )
    sig = base.filter(F.size("shingles") > 0).select(
        "side", "doc_id", *minhash_signature(F.col("shingles"), n_hashes)
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ":", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("sig"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "side", "doc_id", F.explode(F.array(*band_cols)).alias("bs")
    ).select(
        "side", "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "sig")
        banded = (
            banded.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    nb = banded.filter(F.col("side") == "n").select(
        F.col("doc_id").alias("nid"), "band", "sig"
    )
    sb = banded.filter(F.col("side") == "s").select(
        F.col("doc_id").alias("sid"), "band", "sig"
    )
    cand = (
        nb.join(sb, on=["band", "sig"])
        .select("nid", "sid")
        .dropDuplicates(["nid", "sid"])
    )
    sh_n = base.filter(F.col("side") == "n").select(
        F.col("doc_id").alias("nid"), F.col("shingles").alias("sh_n")
    )
    sh_s = base.filter(F.col("side") == "s").select(
        F.col("doc_id").alias("sid"), F.col("shingles").alias("sh_s")
    )
    paired = cand.hint("shuffle_hash").join(sh_n, on="nid").join(
        sh_s.hint("shuffle_hash"), on="sid"
    )
    inter = F.size(F.array_intersect("sh_n", "sh_s"))
    union = F.size("sh_n") + F.size("sh_s") - inter
    near = (
        paired.select(
            "nid", (inter.cast("double") / union.cast("double")).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("nid").alias("doc_id"))
        .distinct()
    )
    return (
        new_ids.join(
            exact.withColumn("__e", F.lit(True)), on="doc_id", how="left"
        )
        .join(near.withColumn("__n", F.lit(True)), on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("__e"), F.lit(False)).alias("exact_dup"),
            F.coalesce(F.col("__n"), F.lit(False)).alias("near_dup"),
        )
        .orderBy("doc_id")
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 16,
) -> DataFrame:
    """Exact SUBSTRING-level duplication report (the "Deduplicating
    Training Data Makes Language Models Better" measurement, token
    granularity): hash every ROLLING ``span_len``-token window, find
    windows occurring more than once corpus-wide, and report per
    document how many of its tokens are covered by at least one
    duplicated window (overlapping windows merged into maximal spans).

    Returns ``(id, n_tokens, dup_tokens)`` for every distinct input id
    — token-less and short (< ``span_len`` tokens) documents report
    ``dup_tokens = 0``.  All-integer output, value-exact cross-engine.

    Scale shape: the rolling-window explode emits ~n_tokens rows per
    doc but each row is ONE md5 (the window text never leaves the
    scan); duplicate detection is a count aggregation on the uniform
    128-bit key (no skew, no self-join); only DUPLICATED window
    positions shuffle back per doc for the interval merge — a window
    partitioned by doc id whose running-max-end/new-group flags are
    the classic O(n log n) merge, embarrassingly parallel across docs.
    This measures and localizes duplication; combine with
    :func:`dedup_chunks` (first-occurrence windows) to REMOVE it.
    """
    from dataclass_array_spark.operators.text import tokens
    from pyspark.sql import Window

    L = int(span_len)
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    n = F.size("toks")
    # rolling windows (guarded like chunk_tokens: sequence(1, 0) would
    # be a descending [1, 0] — docs with n < L emit NO windows)
    win = toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                n >= L,
                F.transform(
                    F.sequence(F.lit(1), n - (L - 1)),
                    lambda i: F.struct(
                        (i - 1).alias("start"),
                        F.md5(F.concat_ws(" ", F.slice("toks", i, L))).alias("h"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<start:int,h:string>>"))
        ).alias("w"),
    ).select(F.col(id_col), F.col("w.start").alias("start"), F.col("w.h").alias("h"))
    dup_keys = win.groupBy("h").agg(F.count("*").alias("c")).filter(F.col("c") > 1)
    dup = win.join(dup_keys.select("h"), on="h").select(id_col, "start")
    wprev = (
        Window.partitionBy(id_col)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = Window.partitionBy(id_col).orderBy("start")
    grouped = (
        dup.withColumn(
            "newg",
            F.when(
                F.col("start")
                > F.coalesce(F.max(F.col("start") + L).over(wprev), F.lit(-1)),
                1,
            ).otherwise(0),
        )
        .withColumn("g", F.sum("newg").over(wrun))
    )
    iv = grouped.groupBy(id_col, "g").agg(
        (F.max("start") + L - F.min("start")).alias("len")
    )
    cov = iv.groupBy(id_col).agg(F.sum("len").alias("dup_tokens"))
    return (
        toks.select(F.col(id_col), n.cast("long").alias("n_tokens"))
        .join(cov, on=id_col, how="left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        )
    )
