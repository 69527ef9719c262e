"""Byte-pair-encoding tokenizer TRAINING and ENCODING as Spark ops —
the missing half of the tokenize story (``tokenize_with_vocab``
consumes a vocabulary; nothing built one).  Round-12 VERDICT item 3.

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — the public BPE recipe): represent every
distinct word as a sequence of symbols (initially single characters);
repeatedly (a) count adjacent symbol pairs weighted by word frequency,
(b) pick the most frequent pair, (c) replace its non-overlapping
occurrences (leftmost-greedy) with the concatenated symbol.  Encoding
applies the learned merges in rank order.

Spark-first architecture (NOT a loop over rows):

- The working state is ``(wid, cnt, syms array<string>)`` over the
  DISTINCT-WORD table — vocab-sized (Heaps' law ~ N^0.5), not
  corpus-sized, so 100 TB of text trains over ~10^8 short rows, all
  distributed.
- Each merge round is ONE map-side-combined pair aggregation (pair
  extraction in-scan; shuffle bounded by the pair-type count) + ONE
  NARROW fold applying the replacement (no shuffle, no window); the
  driver collects exactly one (left, right) row per round — the same
  bounded-driver-state ladder as the k-means operators
  (``clustering.py``).
- Lineage is pinned every ``checkpoint_every`` rounds
  (:func:`~dataclass_array_spark.core.table.pin_materialization`) —
  the fold chain nests one level per round, so pinning also resets the
  otherwise O(rounds²) Catalyst re-analysis (the ``graph.py``
  iterative-op discipline).

Exactness: counts are integers, symbols are strings, the argmax
tie-break is total DESC, left ASC, right ASC — every step reproduces
bit-for-bit in DuckDB, so the ENTIRE iterative training run is
oracle-verifiable (:func:`bpe_sql_ctes` unrolls the rounds as
MATERIALIZED CTEs, the ladder pattern of ``kmeans_sql_ctes``).

Replacement semantics (Spark fold ≡ oracle window pass ≡ Sennrich's
regex pass, differential-tested): the fold merges an incoming symbol
into the accumulator tail when (tail, symbol) = (left, right); within
a run of equal symbols (possible only when left = right) the 1st,
3rd, … occurrences merge — leftmost-greedy non-overlapping.  One pass
eliminates every occurrence, because a freshly merged tail is the
strictly longer string ``left||right``, never re-mergeable as
``left``.  The oracle expresses the same pass with window functions —
match flag, run parity for the left=right alternation, a consumed flag
for merged-away positions — since DuckDB's ``list_reduce`` cannot
carry a list accumulator.

Reference parity: the reference repo has no tokenizer (it is an array
library); this extends SURVEY.md §2.B's training-data-pipeline row the
way the LM-quality family did.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataclass_array_spark.operators.text import tokens

__all__ = [
    "bpe_train",
    "bpe_encode",
    "bpe_word_symbols",
    "bpe_sql_ctes",
    "bpe_encode_sql_ctes",
]


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(wid, cnt): distinct whitespace words with corpus frequencies —
    the vocab-sized training table."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("wid"))
        .groupBy("wid")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    """Split each word into its single-character symbol sequence:
    (wid, cnt, syms array<string>).  substring-based (not regex split)
    so the oracle's ``split(wid, '')`` mirrors it character-for-
    character."""
    return words.select(
        "wid",
        "cnt",
        F.transform(
            F.sequence(F.lit(1), F.length("wid")),
            lambda i: F.col("wid").substr(i, F.lit(1)),
        ).alias("syms"),
    )


def _apply_merge(syms_col: Column, left: str, right: str) -> Column:
    """Symbol array after one leftmost-greedy non-overlapping
    replacement pass of (left, right): a left fold that merges the
    incoming symbol into the accumulator's tail when the tail is
    ``left`` and the symbol is ``right``.  A freshly merged tail is the
    strictly longer string left||right, so the fold never re-merges its
    own output — exactly the leftmost-greedy pass (run parity: within a
    run of equal symbols the 1st, 3rd, … occurrences merge).  NARROW:
    no shuffle, no window — the per-round shuffle budget is spent only
    on the pair-count aggregation.  Pure Column helper: the result is a
    function of ``syms_col`` alone."""
    return _apply_merge_batch(syms_col, [(left, right)])


def _occupied(left: str, right: str) -> set:
    """The symbol strings a merge (left, right) touches: its two inputs
    and its output.  Two merges whose occupied sets are disjoint
    commute and never interact (applying one cannot create, destroy, or
    recount any adjacency involving the other's symbols), which is the
    entire batching soundness argument — see :func:`_best_pairs_batch`."""
    return {left, right, left + right}


def _apply_merge_batch(syms_col: Column, pairs) -> Column:
    """ONE leftmost-greedy fold pass applying a set of MUTUALLY
    NON-CONFLICTING merges (pairwise disjoint :func:`_occupied` sets)
    — provably equal to applying them as separate sequential passes in
    any order:

    - disjointness means no pair's symbols appear in another's inputs
      or output, so the merge SITES of each pair (adjacencies tail =
      left, next = right) are identical whether the other pairs have
      been applied or not (a merge replaces two symbols with one
      strictly-longer concat, so it never creates an adjacency between
      symbols it doesn't contain);
    - within the single fold, a freshly merged tail left||right is (by
      disjointness) no other pair's left, so the fold never chains its
      own outputs — each pair's run-parity/leftmost-greedy semantics
      are exactly those of its solo pass (differential-tested against
      the sequential ladder in ``tests/test_bpe.py``).

    Lefts are distinct (disjointness), so the pair set compiles to ONE
    scalar map lookup ``m[tail] = right`` per fold step regardless of
    batch size — the fold cost does not grow with the batch."""
    pairs = list(pairs)
    lefts = [l for l, _ in pairs]
    assert len(set(lefts)) == len(lefts), "batch lefts must be distinct"
    m = F.create_map(
        *[F.lit(s) for l, r in pairs for s in (l, r)]
    )
    tail = lambda acc: F.element_at(acc, -1)
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(m, tail(acc)) == x),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(tail(acc), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _group_nonconflicting(merges) -> List[List[Tuple[str, str]]]:
    """Greedily group an ORDERED merge list into maximal consecutive
    runs of mutually non-conflicting pairs (disjoint :func:`_occupied`
    sets).  Applying each run as one :func:`_apply_merge_batch` pass is
    RESULT-LOSSLESS vs the rank-order sequential passes: disjoint
    merges commute (see there), and a chained merge — e.g. (ab, c)
    after (a, b) — shares the string ``ab`` so it starts a new run.
    Pure driver-side list processing over the ≤ num_merges table."""
    runs: List[List[Tuple[str, str]]] = []
    occ: set = set()
    for left, right in merges:
        o = _occupied(left, right)
        if not runs or (occ & o):
            runs.append([])
            occ = set()
        runs[-1].append((left, right))
        occ |= o
    return runs


# Driver-side training dispatch (round-15): the (wid, cnt) vocab table
# is Heaps-bounded and the gate corpora's vocabularies are tiny, yet
# every merge round paid 2+ distributed jobs over it (~0.3 s/round of
# pure scheduling at sf0.1).  When the vocab fits comfortably on the
# driver AND the vocab×merges product keeps the pure-Python loop
# sub-second, collect it once and run the PROVABLY IDENTICAL greedy
# loop locally (the kmeans _kmeans_fit_driver precedent) — the corpus
# is still scanned exactly once (the word-count aggregation).  Larger
# vocabs keep the distributed ladder untouched.
_DRIVER_VOCAB_MAX = 65536
_DRIVER_WORK_MAX = 4_194_304  # n_words * num_merges cap


def _apply_merge_py(syms: list, left: str, right: str) -> list:
    """Pure-Python replica of :func:`_apply_merge`'s left fold: merge
    the incoming symbol into the accumulator tail when tail == left and
    symbol == right.  A freshly merged tail is the strictly longer
    left||right, so the pass never re-merges its own output — identical
    leftmost-greedy/run-parity semantics (differential-tested)."""
    out: list = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = out[-1] + x
        else:
            out.append(x)
    return out


def _bpe_train_driver(
    words: "list[tuple[list, int]]", num_merges: int, min_count: int
) -> "list[tuple[int, str, str]]":
    """Sequential greedy BPE on a collected vocab: per round, count
    adjacent pairs (overlapping, frequency-weighted — the Sennrich
    convention), pick argmax by (total DESC, l ASC, r ASC), apply one
    leftmost-greedy pass.  This IS the sequential spec the distributed
    batched ladder is proven equal to (:func:`_best_pairs_batch`); the
    tie-break comparison is byte-order-identical because UTF-8 byte
    order equals code-point order, which is Python's ``str`` order."""
    merges: "list[tuple[int, str, str]]" = []
    while len(merges) < int(num_merges):
        pc: dict = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + c
        cands = [(l, r, t) for (l, r), t in pc.items() if t >= int(min_count)]
        if not cands:
            break
        l, r, _t = min(cands, key=lambda x: (-x[2], x[0], x[1]))
        merges.append((len(merges), l, r))
        for i, (syms, c) in enumerate(words):
            words[i] = (_apply_merge_py(syms, l, r), c)
    return merges


def _collect_small_vocab(sym: DataFrame, cap: int):
    """``take(cap+1)`` on the (wid, cnt, syms) frame; returns the rows
    when the vocab fits, else None (distributed path).  Callers pass
    the PINNED frame so the probe and the distributed ladder share one
    corpus-sized word-count materialization — probing the raw aggregate
    executed the full corpus shuffle, discarded it, and the ladder
    recomputed it: one wasted corpus pass exactly on the
    production-scale (large-vocab) path."""
    rows = sym.take(int(cap) + 1)
    if len(rows) > cap:
        return None
    return rows


def _pair_counts(sym: DataFrame, min_count: int) -> DataFrame:
    """Adjacent-pair totals (weighted by word frequency, overlapping
    occurrences counted — the Sennrich convention), filtered to
    ``total >= min_count``.  Pair extraction is in-scan (transform over
    index pairs); the ONE shuffle is the map-side-combined (l, r)
    aggregation."""
    pair_arr = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("l"),
                F.element_at(F.col("syms"), i + F.lit(1)).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        sym.select("cnt", F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("total"))
        .filter(F.col("total") >= F.lit(int(min_count)))
    )


def _best_pairs_batch(
    sym: DataFrame, min_count: int, k: int
) -> List[Tuple[str, str]]:
    """Up to ``k`` pairs from ONE pair count whose greedy sequential
    picks are PROVABLY identical — closing the merge-COUNT scale axis
    (round-12 VERDICT "What's wrong" #1): a production tokenizer's 30-50k
    merges no longer need 30-50k sequential Spark jobs.

    Rule: scan candidates in argmax order (total DESC, l ASC, r ASC);
    accept while mutually non-conflicting (pairwise disjoint
    :func:`_occupied` sets); STOP at the first conflicting candidate —
    call its total C* (also C* := the first candidate past the ``k``
    cap / collect limit; C* := min_count − 1 when the scan exhausts
    ALL candidates) — then drop trailing accepted pairs with total ≤ C*
    (the first accepted pair always survives: it is the round's true
    argmax regardless).

    Equality proof (induction over accepted P_1..P_m, each with total
    strictly > C* except P_1 which is the global argmax):  applying a
    merge only changes counts of pairs sharing one of its
    :func:`_occupied` strings; accepted pairs are mutually disjoint, so
    at sequential round i the count of P_i is untouched and P_1..P_{i-1}
    have vanished (a completed leftmost-greedy pass leaves no (l, r)
    adjacency).  Every pair CREATED by applying an accepted (a, b) —
    (p, a·b), (a·b, q), (a·b, a·b) — occupies ``a·b`` and each of its
    instances was an instance of (p, a), (b, q), (b, a) respectively,
    all of which share a symbol with the accepted set, hence sort at or
    after the stop position: their totals are ≤ C* < total(P_i).
    Unaccepted original candidates also sort after the stop (≤ C*).
    So at round i the strict argmax over the live counts is P_i, with
    the (l, r) tie-break agreeing on equal-total accepted pairs by
    construction of the scan order.  ∎

    Driver state: ≤ k+1 rows per round (the ladder stays bounded)."""
    rows = (
        _pair_counts(sym, min_count)
        .orderBy(F.desc("total"), F.asc("l"), F.asc("r"))
        .limit(int(k) + 1)
        .collect()
    )
    accepted: List[Tuple[str, str, int]] = []
    occ: set = set()
    cstar: Optional[int] = None
    for row in rows:
        l, r, tot = row["l"], row["r"], row["total"]
        o = _occupied(l, r)
        if len(accepted) >= int(k) or (occ & o):
            cstar = tot
            break
        accepted.append((l, r, tot))
        occ |= o
    if cstar is None:
        # exhausted every candidate ≥ min_count: any pair a batch merge
        # creates is bounded by a sub-min_count original (see proof)
        cstar = int(min_count) - 1
    while len(accepted) > 1 and accepted[-1][2] <= cstar:
        accepted.pop()
    return [(l, r) for l, r, _ in accepted]


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_count: int = 2,
    pin: str = "local",
    checkpoint_every: int = 8,
    batch_pairs: int = 1,
) -> DataFrame:
    """Learn a BPE merge table from the corpus: → (rank, left, right),
    rank 0-based in learn order, at most ``num_merges`` rows (training
    stops early when no pair reaches ``min_count`` — mirrored by the
    oracle's HAVING clause, so early exhaustion is oracle-symmetric).

    ``batch_pairs > 1`` accepts up to that many MUTUALLY
    NON-CONFLICTING pairs per pair-count round and applies them in ONE
    fold pass — the merge table is PROVABLY identical to
    ``batch_pairs=1`` (the proof lives on :func:`_best_pairs_batch`;
    differential equality test in ``tests/test_bpe.py``).  This is the
    merge-COUNT scale fix: the number of sequential Spark jobs drops
    from num_merges to the number of batches (16 → 10 on the sf0.01
    gate corpus at ``batch_pairs=16`` — early rounds conflict densely
    over the hot characters; at a production 30-50k-merge vocab,
    orders of magnitude — typically hundreds of pairs are mutually
    disjoint once the vocabulary spreads out).

    Driver state: the merge table itself (≤ num_merges 3-tuples) plus
    ≤ batch_pairs+1 collected rows per round — never corpus- or
    vocab-sized."""
    if num_merges < 1:
        raise ValueError("bpe_train: num_merges must be >= 1")
    if batch_pairs < 1:
        raise ValueError("bpe_train: batch_pairs must be >= 1")
    from dataclass_array_spark.core.table import pin_materialization

    # pin BEFORE the small-vocab probe: probe and ladder then share one
    # word-count materialization (the probe on the raw aggregate ran the
    # corpus shuffle a second time in the large-vocab case); in the
    # small-vocab case the pin holds only the tiny vocab table and is
    # dropped at the next release_pins()
    sym = pin_materialization(_init_symbols(_word_counts(df, text_col)), pin)
    cap = min(_DRIVER_VOCAB_MAX, _DRIVER_WORK_MAX // max(1, int(num_merges)))
    rows = _collect_small_vocab(sym, cap)
    if rows is not None:
        # driver path: one corpus scan, zero per-round jobs — merge
        # table provably identical to the distributed ladder
        got = _bpe_train_driver(
            [(list(r["syms"]), int(r["cnt"])) for r in rows],
            num_merges,
            min_count,
        )
        return df.sparkSession.createDataFrame(
            got, "merge_rank long, left_sym string, right_sym string"
        )
    merges: List[Tuple[int, str, str]] = []
    rounds = 0
    while len(merges) < int(num_merges):
        want = min(int(batch_pairs), int(num_merges) - len(merges))
        batch = _best_pairs_batch(sym, min_count, want)
        if not batch:
            break
        base = len(merges)
        merges.extend((base + i, l, r) for i, (l, r) in enumerate(batch))
        sym = sym.select(
            "wid", "cnt", _apply_merge_batch(F.col("syms"), batch).alias("syms")
        )
        rounds += 1
        # periodic pin: the fold chain nests one level per round —
        # without this Catalyst re-analyzes an O(rounds²) plan
        if rounds % checkpoint_every == 0:
            sym = pin_materialization(sym, pin)
    return df.sparkSession.createDataFrame(
        merges, "merge_rank long, left_sym string, right_sym string"
    )


def bpe_word_symbols(
    words: DataFrame,
    merges: List[Tuple[str, str]],
    pin: str = "local",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply a learned merge list (rank order) to a (wid, cnt) word
    table: → (wid, toks array<string>).  The per-pass replacement is
    the same fold as training, so encode ≡ the training-time
    segmentation for the training corpus (the BPE invariant).

    Consecutive mutually non-conflicting merges are grouped
    (:func:`_group_nonconflicting`, pure driver-side) and each group
    applied in ONE fold pass — RESULT-LOSSLESS vs one pass per merge
    (disjoint merges commute; proof on :func:`_apply_merge_batch`;
    same-results test in ``tests/test_bpe.py``), cutting the fold-chain
    depth from num_merges to the number of groups."""
    from dataclass_array_spark.core.table import pin_materialization

    # pin before the probe — same shared-materialization rationale as
    # bpe_train
    sym = pin_materialization(_init_symbols(words), pin)
    cap = min(
        _DRIVER_VOCAB_MAX, _DRIVER_WORK_MAX // max(1, len(list(merges)) or 1)
    )
    rows = _collect_small_vocab(sym, cap)
    if rows is not None:
        # driver path (round-15): segment the collected vocab locally —
        # the same sequential passes the grouped fold is proven equal
        # to — and hand back a (wid, toks) frame.  The encode join-back
        # then broadcasts this small table.
        segged = []
        for r in rows:
            syms = list(r["syms"])
            for left, right in merges:
                syms = _apply_merge_py(syms, left, right)
            segged.append((r["wid"], syms))
        # wid keeps the INPUT dtype so the driver and distributed paths
        # accept identical inputs (a non-string wid worked distributed
        # but made this createDataFrame raise)
        wid_type = words.schema["wid"].dataType.simpleString()
        return words.sparkSession.createDataFrame(
            segged, f"wid {wid_type}, toks array<string>"
        )
    for i, run in enumerate(_group_nonconflicting(merges)):
        sym = sym.select(
            "wid", "cnt", _apply_merge_batch(F.col("syms"), run).alias("syms")
        )
        if (i + 1) % checkpoint_every == 0:
            sym = pin_materialization(sym, pin)
    return sym.select("wid", F.col("syms").alias("toks"))


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges_df: DataFrame,
    pin: str = "local",
) -> DataFrame:
    """Encode every document with a trained merge table: → (id,
    n_bpe_tokens, toks_json).  Segments the DISTINCT words once
    (vocab-sized work) and joins the segmentation back onto the
    document word sequence — the standard encode-distinct-then-join
    trick that keeps the iterative part off the corpus-sized table.
    The word→segmentation join is corpus-derived on both sides, so it
    carries NO broadcast hint (AQE decides — the round-12 vocab-join
    rule)."""
    rows = merges_df.orderBy("merge_rank").collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in rows]
    seg = bpe_word_symbols(_word_counts(df, text_col), merges, pin=pin)
    tok = df.select(
        F.col(id_col),
        F.posexplode_outer(tokens(F.col(text_col))).alias("wpos", "wid"),
    )
    j = tok.join(seg, "wid", "left")
    entry = F.when(
        F.col("wpos").isNotNull(),
        F.struct(F.col("wpos"), F.col("toks").alias("toks")),
    )
    per_doc = j.groupBy(id_col).agg(
        F.flatten(
            F.transform(F.array_sort(F.collect_list(entry)), lambda e: e.toks)
        ).alias("__t")
    )
    return per_doc.select(
        F.col(id_col),
        F.size("__t").cast("long").alias("n_bpe_tokens"),
        F.to_json(F.col("__t")).alias("toks_json"),
    )


# ----------------------------------------------------------- oracle
# DuckDB mirror: the training rounds unroll as MATERIALIZED CTEs (the
# kmeans_sql_ctes ladder pattern — DuckDB inlines multiply-referenced
# CTEs unless MATERIALIZED, which would compound round over round).


def _apply_ctes(cur: str, best: str, out: str, tag: str) -> str:
    """CTEs applying the (possibly empty) 1-row merge table ``best``
    to symbol table ``cur`` → ``out`` (one leftmost-greedy pass; an
    empty best joins NULL → no matches → pass-through).  ``tag``
    uniquifies the intermediate CTE names."""
    win = "PARTITION BY wid ORDER BY pos"
    run = f"{win} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    return f"""x{tag} AS MATERIALIZED (
  SELECT wid, cnt, pos, s, LEAD(s) OVER ({win}) AS nxt FROM {cur}
),
y{tag} AS MATERIALIZED (
  SELECT x.wid, x.cnt, x.pos, x.s, x.nxt,
         COALESCE(x.s = b.l AND x.nxt = b.r_, FALSE) AS m
  FROM x{tag} x LEFT JOIN {best} b ON TRUE
),
z{tag} AS MATERIALIZED (
  SELECT *, m AND NOT COALESCE(LAG(m) OVER ({win}), FALSE) AS rs FROM y{tag}
),
v{tag} AS MATERIALIZED (
  SELECT *, COALESCE(
      m AND (pos - MAX(CASE WHEN rs THEN pos END) OVER ({run})) % 2 = 0,
      FALSE) AS valid
  FROM z{tag}
),
k{tag} AS MATERIALIZED (
  SELECT *, COALESCE(LAG(valid) OVER ({win}), FALSE) AS consumed FROM v{tag}
),
{out} AS MATERIALIZED (
  SELECT wid, cnt, ROW_NUMBER() OVER ({win}) AS pos,
         CASE WHEN valid THEN s || nxt ELSE s END AS s
  FROM k{tag} WHERE NOT consumed
)"""


def _round_ctes(r: int, min_count: int) -> str:
    """CTEs advancing sym{r} → sym{r+1} and exposing best{r}(rank, l,
    r_).  An exhausted best{r} (no pair ≥ min_count) joins empty and
    passes sym through unchanged — the Spark early-stop mirror."""
    win = "PARTITION BY wid ORDER BY pos"
    return f"""pr{r} AS MATERIALIZED (
  SELECT s AS l, nxt AS r_, SUM(cnt) AS total
  FROM (SELECT *, LEAD(s) OVER ({win}) AS nxt FROM sym{r})
  WHERE nxt IS NOT NULL
  GROUP BY s, nxt
  HAVING SUM(cnt) >= {int(min_count)}
),
best{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS merge_rank, l, r_ FROM pr{r}
  ORDER BY total DESC, l ASC, r_ ASC LIMIT 1
),
{_apply_ctes(f"sym{r}", f"best{r}", f"sym{r + 1}", str(r))}"""


def bpe_sql_ctes(
    toks_expr: str,
    num_merges: int,
    min_count: int = 2,
    src: str = "documents",
) -> Tuple[str, str]:
    """(ctes, merge_select): unrolled DuckDB training over the word
    list produced by ``toks_expr`` (an expression over ``src`` — a
    table name or parenthesized subquery — yielding a VARCHAR[] per
    row, e.g. the shared ``_SQL_TOKS``).  ``merge_select`` yields
    (rank, left, right) — the bpe_train mirror."""
    head = f"""w0 AS MATERIALIZED (
  SELECT t AS wid, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({toks_expr}) AS t FROM {src} __bpe_src)
  GROUP BY t
),
sym0 AS MATERIALIZED (
  SELECT wid, cnt,
         CAST(generate_subscripts(split(wid, ''), 1) AS BIGINT) AS pos,
         unnest(split(wid, '')) AS s
  FROM w0
)"""
    rounds = ",\n".join(_round_ctes(r, min_count) for r in range(num_merges))
    union = "\nUNION ALL\n".join(
        f"SELECT merge_rank, l AS left_sym, r_ AS right_sym FROM best{r}"
        for r in range(num_merges)
    )
    return head + ",\n" + rounds, union


def bpe_encode_sql_ctes(
    toks_expr: str,
    num_merges: int,
    min_count: int = 2,
    train_src: str = "documents",
    score_src: str = None,
) -> str:
    """CTE chain whose final CTE ``encoded(doc_id, n_bpe_tokens,
    toks_json)`` mirrors bpe_train + bpe_encode end-to-end.  With
    ``score_src`` left None the training corpus is also scored (the
    self-encode gate shape); a distinct ``score_src`` mirrors the
    HELD-OUT workflow: the trained best{r} merges are applied to the
    SCORE corpus's own word-symbol table via a second, apply-only
    unrolled ladder (score words whose characters never merged simply
    pass through — BPE has no OOV failure mode at the char level)."""
    held_out = score_src is not None and score_src != train_src
    score_src = score_src or train_src
    ctes, _ = bpe_sql_ctes(toks_expr, num_merges, min_count, src=train_src)
    if held_out:
        seg = f"""ew0 AS MATERIALIZED (
  SELECT t AS wid, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({toks_expr}) AS t FROM {score_src} __bpe_score)
  GROUP BY t
),
esym0 AS MATERIALIZED (
  SELECT wid, cnt,
         CAST(generate_subscripts(split(wid, ''), 1) AS BIGINT) AS pos,
         unnest(split(wid, '')) AS s
  FROM ew0
),
""" + ",\n".join(
            _apply_ctes(f"esym{r}", f"best{r}", f"esym{r + 1}", f"e{r}")
            for r in range(num_merges)
        )
        ctes = ctes + ",\n" + seg
        final_sym = f"esym{num_merges}"
    else:
        final_sym = f"sym{num_merges}"
    return f"""{ctes},
word_toks AS MATERIALIZED (
  SELECT wid, list(s ORDER BY pos) AS toks FROM {final_sym} GROUP BY wid
),
doc_words AS MATERIALIZED (
  SELECT doc_id,
         CAST(generate_subscripts(toks, 1) AS BIGINT) AS wpos,
         unnest(toks) AS wid
  FROM (SELECT doc_id, {toks_expr} AS toks FROM {score_src} __bpe_score2)
),
flat AS MATERIALIZED (
  SELECT doc_id, tok, ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY wpos, j) AS tpos
  FROM (
    SELECT dw.doc_id, dw.wpos,
           CAST(generate_subscripts(wt.toks, 1) AS BIGINT) AS j,
           unnest(wt.toks) AS tok
    FROM doc_words dw JOIN word_toks wt USING (wid)
  )
),
encoded AS MATERIALIZED (
  SELECT d.doc_id,
         CAST(COALESCE(p.n, 0) AS BIGINT) AS n_bpe_tokens,
         COALESCE(p.tj, to_json(CAST([] AS VARCHAR[]))) AS toks_json
  FROM {score_src} d
  LEFT JOIN (
    SELECT doc_id, COUNT(*) AS n, to_json(list(tok ORDER BY tpos)) AS tj
    FROM flat GROUP BY doc_id
  ) p USING (doc_id)
)"""
