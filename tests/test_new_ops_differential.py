"""Differential tests for the round-7 operator family: each operator is
checked against an independent brute-force / pure-Python oracle on
randomized (fixed-seed, derandomized) inputs — the same strategy the
indexing/vectorize fuzz suites use against numpy.
"""

from __future__ import annotations

import itertools
import random

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_join_vs_bruteforce(spark):
    """Random word-ish corpus (every string >= q*(k+1) chars, no gram
    cap): the q-gram candidate join must find EXACTLY the brute-force
    pair set with identical distances."""
    rng = random.Random(17)
    alphabet = "abcdef"
    base = ["".join(rng.choice(alphabet) for _ in range(8)) for _ in range(30)]
    # plant near pairs: single-char mutations and one insertion
    strings = set(base)
    for s in base[:10]:
        strings.add("a" + s[1:])          # substitution at pos 0
        strings.add(s + "x")              # insertion at end
    strings = sorted(strings)
    df = spark.createDataFrame(pd.DataFrame({"s": strings}))

    from dataclass_array_spark.operators.fuzzy import edit_distance_join

    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in edit_distance_join(df, "s", k=2, q=2).collect()
    }
    want = {}
    for a, b in itertools.combinations(strings, 2):
        d = _levenshtein(a, b)
        if d <= 2:
            want[(a, b)] = d
    assert got == want


def test_triangle_counts_vs_bruteforce(spark):
    """Random G(n=18, p=0.3): per-node triangle counts must equal the
    itertools enumeration over the undirected simple graph."""
    rng = random.Random(23)
    nodes = list(range(18))
    und = {
        (u, v)
        for u, v in itertools.combinations(nodes, 2)
        if rng.random() < 0.3
    }
    edges = pd.DataFrame(
        {
            # feed reversed / duplicated / self-loop noise
            "src": [v for _, v in und] + [u for u, _ in und] + [5],
            "dst": [u for u, _ in und] + [v for _, v in und] + [5],
        }
    )
    from dataclass_array_spark.operators.graph import triangle_counts

    got = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(spark.createDataFrame(edges)).collect()
    }
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    assert got == want


def test_pagerank_vs_python_replica(spark):
    """pagerank must match a pure-Python float replica that mirrors the
    exact operation order (contribution (r*w)/W, sums folded in src
    order, comp/n + d*s) bit-for-bit."""
    rng = random.Random(31)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(60)]
    pdf = pd.DataFrame({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})

    from dataclass_array_spark.operators.graph import pagerank

    got = {
        r["node"]: r["r"]
        for r in pagerank(
            spark.createDataFrame(pdf), "src", "dst", iters=3, damping=0.85
        ).collect()
    }
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    w: dict[tuple[int, int], int] = {}
    for a, b in edges:
        w[(a, b)] = w.get((a, b), 0) + 1
    wtot: dict[int, int] = {}
    for (a, _), c in w.items():
        wtot[a] = wtot.get(a, 0) + c
    comp = 1.0 - 0.85
    r = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        incoming: dict[int, list[tuple[int, float]]] = {}
        for (a, b), c in w.items():
            incoming.setdefault(b, []).append((a, (r[a] * c) / wtot[a]))
        nxt = {}
        for v in nodes:
            s = 0.0
            for _, c in sorted(incoming.get(v, [])):
                s = s + c
            nxt[v] = comp / n + 0.85 * s
        r = nxt
    assert got == r


def test_dedup_chunks_vs_python_oracle(spark):
    """Chunk survival counts must equal a pure-Python first-occurrence
    pass over the same non-overlapping token windows."""
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(12)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 25)))
        for i in range(40)
    }
    df = spark.createDataFrame(
        pd.DataFrame({"id": list(texts), "text": list(texts.values())})
    )
    from dataclass_array_spark.operators.dedup import dedup_chunks

    got = {
        r["id"]: (r["n_chunks"], r["n_kept"])
        for r in dedup_chunks(df, "id", "text", chunk_size=4).collect()
    }
    seen: set[str] = set()
    want = {}
    for i in sorted(texts):
        toks = texts[i].split()
        chunks = [
            " ".join(toks[j : j + 4]) for j in range(0, len(toks), 4)
        ]
        kept = 0
        for ch in chunks:
            if ch not in seen:
                seen.add(ch)
                kept += 1
        want[i] = (len(chunks), kept)
    assert got == want


def test_simhash_pairs_complete_within_ball(spark):
    """Banding soundness end-to-end: with no bucket cap, the banded
    join must return EXACTLY the pairs whose fingerprints are within
    max_hamming (computed from the operator's own fingerprints)."""
    rng = random.Random(53)
    vocab = [f"t{i}" for i in range(30)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 15)))
        for i in range(30)
    }
    # plant exact dups so hamming-0 pairs exist
    texts[100] = texts[0]
    texts[101] = texts[1]
    df = spark.createDataFrame(
        pd.DataFrame({"id": list(texts), "text": list(texts.values())})
    )
    from dataclass_array_spark.operators.dedup import simhash, simhash_pairs

    fps = {
        r["id"]: r["fp"]
        for r in df.select(
            "id", simhash(F.col("text"), 48).alias("fp")
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, "id", "text", n_bits=48, bands=4,
                               max_hamming=3).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(fps), 2):
        h = bin(fps[a] ^ fps[b]).count("1")
        if h <= 3:
            want[(a, b)] = h
    assert got == want
    assert (0, 100) in got and got[(0, 100)] == 0


def test_edit_distance_join_gram_cap_subset(spark):
    """A binding gram-frequency cap may only REMOVE pairs (never add or
    change distances), and uncapped results must be unaffected by a
    non-binding cap."""
    rng = random.Random(61)
    strings = sorted(
        {"".join(rng.choice("abc") for _ in range(7)) for _ in range(40)}
    )
    df = spark.createDataFrame(pd.DataFrame({"s": strings}))

    from dataclass_array_spark.operators.fuzzy import edit_distance_join

    def run(cap):
        return {
            (r["name_a"], r["name_b"]): r["dist"]
            for r in edit_distance_join(df, "s", k=2, q=2, max_gram_freq=cap).collect()
        }

    uncapped = run(None)
    loose = run(10**6)
    tight = run(5)
    assert loose == uncapped
    assert set(tight) <= set(uncapped)
    assert all(uncapped[p] == d for p, d in tight.items())


def test_dedup_incremental_vs_python_oracle(spark):
    """Exact-dup flags must match a pure-Python normalized-fingerprint
    pass (near-dup recall is banding-dependent, but near_dup must be
    True for every exact dup — identical shingle sets collide in every
    band)."""
    rng = random.Random(71)
    vocab = [f"v{i}" for i in range(15)]
    store = {
        100 + i: " ".join(rng.choice(vocab) for _ in range(10)) for i in range(20)
    }
    new = {i: " ".join(rng.choice(vocab) for _ in range(10)) for i in range(10)}
    new[50] = store[100]          # planted exact dup
    new[51] = store[101]
    mk = lambda d: spark.createDataFrame(
        pd.DataFrame({"id": list(d), "text": list(d.values())})
    )
    from dataclass_array_spark.operators.dedup import dedup_incremental

    got = {
        r["doc_id"]: (r["exact_dup"], r["near_dup"])
        for r in dedup_incremental(mk(new), mk(store), "id", "text").collect()
    }
    norm = lambda t: " ".join(t.lower().split())
    store_fps = {norm(t) for t in store.values()}
    for i, t in new.items():
        assert got[i][0] == (norm(t) in store_fps), i
        if got[i][0]:
            assert got[i][1], f"exact dup {i} must also be a near dup"


def test_pagerank_fold_modes_agree(spark):
    """The three aggregation modes — flat ordered fold, two-level
    bucketed fold (hub-safe), and plain sum — are different float
    association orders of the same math: they must agree to ~1e-12
    relative on a random graph, and the two deterministic folds must
    each be self-reproducible."""
    from dataclass_array_spark.operators.graph import pagerank

    rng = random.Random(53)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(150)]
    pdf = pd.DataFrame({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})
    df = spark.createDataFrame(pdf)

    def run(**kw):
        return {
            r["node"]: r["r"]
            for r in pagerank(df, "src", "dst", iters=3, **kw).collect()
        }

    flat = run()
    two = run(fold_buckets=4)
    plain = run(exact=False)
    assert set(flat) == set(two) == set(plain)
    for v in flat:
        assert abs(flat[v] - two[v]) <= 1e-12 * max(1.0, abs(flat[v]))
        assert abs(flat[v] - plain[v]) <= 1e-12 * max(1.0, abs(flat[v]))
    # determinism of the bucketed fold: bit-identical on a re-run
    assert run(fold_buckets=4) == two


def test_pagerank_two_level_fold_handles_negative_ids(spark):
    """pmod bucketing must place negative source ids in [0, B) — the
    oracle mirror ((u % B) + B) % B is the contract."""
    from dataclass_array_spark.operators.graph import pagerank

    edges = [(-7, 1), (-3, 1), (2, 1), (5, 1), (1, -7)]
    pdf = pd.DataFrame({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})
    df = spark.createDataFrame(pdf)
    flat = {
        r["node"]: r["r"] for r in pagerank(df, iters=2).collect()
    }
    two = {
        r["node"]: r["r"]
        for r in pagerank(df, iters=2, fold_buckets=3).collect()
    }
    assert set(flat) == set(two)
    for v in flat:
        assert abs(flat[v] - two[v]) <= 1e-14 * max(1.0, abs(flat[v]))


def test_triangle_orientations_agree_and_degree_bounds_wedges(spark):
    """The triangle SET is orientation-invariant (degree vs id modes
    return identical counts), and on a mid-id star hub the degree
    orientation generates ZERO wedges where id orientation generates
    Θ((leaves/2)²) — the hub-safety claim, asserted on actual wedge
    row counts."""
    from dataclass_array_spark.operators.graph import (
        _oriented_edges, _wedges, triangle_counts,
    )

    # star: hub id 50 in the middle of leaf ids 0..39 and 60..99,
    # plus one triangle off to the side so counts are non-trivial
    hub_edges = [(i, 50) for i in range(40)] + [(50, j) for j in range(60, 100)]
    tri_edges = [(200, 201), (201, 202), (200, 202)]
    edges = hub_edges + tri_edges
    pdf = pd.DataFrame({"src": [a for a, _ in edges], "dst": [b for _, b in edges]})
    df = spark.createDataFrame(pdf)

    by_deg = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(df, orient="degree").collect()
    }
    by_id = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(df, orient="id").collect()
    }
    assert by_deg == by_id == {200: 1, 201: 1, 202: 1}

    wedges_id = _wedges(_oriented_edges(df, "src", "dst", "id")).count()
    wedges_deg = _wedges(_oriented_edges(df, "src", "dst", "degree")).count()
    # id orientation points the 40 high-id leaves' edges OUT of the
    # mid-id hub, rooting C(40,2)=780 wedges there (+1 triangle wedge);
    # degree orientation points every star edge AT the hub, so only the
    # triangle wedge remains
    assert wedges_id == 780 + 1
    assert wedges_deg == 1


def test_fuzzy_prefix_filter_same_pairs_fewer_candidates(spark):
    """Prefix filtering must keep the verified pair set identical while
    strictly shrinking the inverted index on a corpus with a shared
    hot gram (the docstring's losslessness proof, asserted)."""
    from dataclass_array_spark.operators.fuzzy import (
        _gram_index, edit_distance_join,
    )

    rng = random.Random(71)
    alphabet = "abcdefgh"
    # every string shares the hot prefix "zz" (a high-frequency gram)
    base = [
        "zz" + "".join(rng.choice(alphabet) for _ in range(10))
        for _ in range(40)
    ]
    strings = set(base)
    for s in base[:15]:
        strings.add(s[:-1] + "q")   # substitution -> distance-1 pair
    strings = sorted(strings)
    df = spark.createDataFrame(pd.DataFrame({"s": strings}))

    def pairs(prefix_filter):
        return {
            (r["name_a"], r["name_b"]): r["dist"]
            for r in edit_distance_join(
                df, "s", k=2, q=2, prefix_filter=prefix_filter
            ).collect()
        }

    got = pairs(True)
    assert got == pairs(False)
    # ground truth
    want = {}
    for a, b in itertools.combinations(strings, 2):
        d = _levenshtein(a, b)
        if d <= 2:
            want[(a, b)] = d
    assert got == want

    full = _gram_index(df, "s", 2, 2, None, False).count()
    pref = _gram_index(df, "s", 2, 2, None, True).count()
    # 12-13 char strings have ~11 distinct grams; prefixes keep k*q+1=5
    assert pref < full
    assert pref <= 5 * len(strings)


def test_k_core_vs_bruteforce(spark):
    """Random G(20, 0.25) + planted clique: k_core must equal the
    classic iterative python peel for several k."""
    from dataclass_array_spark.operators.graph import k_core

    rng = random.Random(97)
    nodes = list(range(20))
    und = {
        (u, v)
        for u, v in itertools.combinations(nodes, 2)
        if rng.random() < 0.25
    }
    und |= set(itertools.combinations([2, 5, 7, 11, 13], 2))  # 5-clique
    pdf = pd.DataFrame(
        {
            "src": [u for u, _ in und] + [9],  # + self-loop noise
            "dst": [v for _, v in und] + [9],
        }
    )
    df = spark.createDataFrame(pdf)

    def peel(k):
        cur = set(und)
        while True:
            deg: dict[int, int] = {}
            for u, v in cur:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            nxt = {(u, v) for u, v in cur if u in keep and v in keep}
            if nxt == cur:
                return deg if cur else {}
            cur = nxt

    for k in (2, 3, 4):
        want_deg = peel(k)
        want = {n: d for n, d in want_deg.items() if d >= k}
        got = {
            r["node"]: r["deg"] for r in k_core(df, k=k).collect()
        }
        assert got == want, (k, got, want)


def test_mad_outliers_vs_numpy(spark):
    """mad_outliers must reproduce the numpy two-middle-rows replica
    (median of sorted values, MAD of deviations, strict > threshold)."""
    from dataclass_array_spark.operators.robust import mad_outliers

    rng = np.random.default_rng(11)
    groups, vals = [], []
    for g, (n, spread) in enumerate([(37, 5), (50, 20), (8, 2)]):
        x = np.round(rng.normal(100 * g, spread, n), 1)
        x[:2] = 100 * g + 40 * spread  # planted outliers
        groups += [f"g{g}"] * n
        vals += list(x)
    pdf = pd.DataFrame({"grp": groups, "val": vals})
    got = {
        r["grp"]: (r["median"], r["mad"], r["n_outliers"], r["n_rows"])
        for r in mad_outliers(
            spark.createDataFrame(pdf), "grp", "val", k=2.5
        ).collect()
    }

    # replica mirrors the engine's (and oracle's) DECIMAL(25,6)
    # middle-sum chain: each middle value is quantized HALF_UP at 1e-6
    # before the sum, the sum converts to double, ONE division follows
    from decimal import ROUND_HALF_UP, Decimal

    q6 = lambda x: Decimal(repr(float(x))).quantize(  # noqa: E731
        Decimal("1e-6"), ROUND_HALF_UP
    )

    def two_mid(xs):
        s = sorted(xs)
        n = len(s)
        return float(q6(s[(n - 1) // 2]) + q6(s[n // 2])) / 2

    for g in ("g0", "g1", "g2"):
        xs = [v for gg, v in zip(groups, vals) if gg == g]
        med = two_mid(xs)
        devs = [abs(x - med) for x in xs]
        mad = two_mid(devs)
        n_out = sum(1 for d in devs if d > 2.5 * mad)
        gm, gmad, gn, gtot = got[g]
        assert gm == med and gmad == mad, (g, got[g], med, mad)
        assert gn == n_out and gtot == len(xs), (g, got[g])


def test_blocked_linkage_vs_bruteforce(spark):
    """blocked_linkage must equal the brute-force python scoring over
    within-block pairs (jaccard over distinct tokens, exact fields,
    left-associated weighted sum)."""
    from dataclass_array_spark.operators.linkage import blocked_linkage

    rng = random.Random(3)
    words = ["red", "blue", "dim", "hot", "cold", "iron", "wool", "silk"]
    rows = []
    for i in range(60):
        rows.append(
            {
                "id": i,
                "blk": f"B{rng.randrange(4)}",
                "name": " ".join(rng.sample(words, 3)),
                "typ": rng.choice(["a", "b"]),
                "size": rng.randrange(3),
            }
        )
    pdf = pd.DataFrame(rows)
    fields = [("name", "token_jaccard", 0.5), ("typ", "exact", 0.3),
              ("size", "exact", 0.2)]
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in blocked_linkage(
            spark.createDataFrame(pdf), "id", "blk", fields, threshold=0.55
        ).collect()
    }
    want = {}
    for a, b in itertools.combinations(rows, 2):
        if a["blk"] != b["blk"]:
            continue
        ta, tb = set(a["name"].split()), set(b["name"].split())
        s = 0.0
        s = s + 0.5 * (len(ta & tb) / len(ta | tb))
        s = s + 0.3 * (1.0 if a["typ"] == b["typ"] else 0.0)
        s = s + 0.2 * (1.0 if a["size"] == b["size"] else 0.0)
        if s >= 0.55:
            want[(a["id"], b["id"])] = s
    assert got == want


def test_duplicate_spans_vs_bruteforce(spark):
    """duplicate_spans must equal a pure-python rolling-window +
    interval-merge replica, including overlap merging, short docs, and
    docs fully covered by duplicated text."""
    from dataclass_array_spark.operators.dedup import duplicate_spans

    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(9)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 30)))
        for i in range(30)
    }
    texts[100] = texts[0]                      # full-document duplicate
    texts[101] = texts[1] + " zz qq " + texts[2]   # spliced duplication
    L = 4
    df = spark.createDataFrame(
        pd.DataFrame({"id": list(texts), "text": list(texts.values())})
    )
    got = {
        r["id"]: (r["n_tokens"], r["dup_tokens"])
        for r in duplicate_spans(df, "id", "text", span_len=L).collect()
    }

    windows: dict[str, int] = {}
    toks = {i: t.split() for i, t in texts.items()}
    for i, ts in toks.items():
        for j in range(len(ts) - L + 1):
            w = " ".join(ts[j : j + L])
            windows[w] = windows.get(w, 0) + 1
    want = {}
    for i, ts in toks.items():
        starts = [
            j
            for j in range(len(ts) - L + 1)
            if windows[" ".join(ts[j : j + L])] > 1
        ]
        covered = 0
        cur_s = cur_e = None
        for s in starts:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, s + L
            else:
                cur_e = max(cur_e, s + L)
        if cur_e is not None:
            covered += cur_e - cur_s
        want[i] = (len(ts), covered)
    assert got == want
    assert got[100][1] == got[100][0]  # full duplicate fully covered


def test_label_propagation_recovers_planted_communities(spark):
    """Two dense 12-cliques joined by ONE bridge edge: LPA must label
    each clique by its minimum node id within 4 rounds, and the result
    must be deterministic across runs."""
    from dataclass_array_spark.operators.graph import label_propagation

    a = list(range(0, 12))
    b = list(range(100, 112))
    edges = (
        list(itertools.combinations(a, 2))
        + list(itertools.combinations(b, 2))
        + [(11, 100)]  # bridge
    )
    pdf = pd.DataFrame({"src": [u for u, _ in edges], "dst": [v for _, v in edges]})
    df = spark.createDataFrame(pdf)
    got = {
        r["node"]: r["lbl"]
        for r in label_propagation(df, rounds=4).collect()
    }
    assert all(got[n] == 0 for n in a), got
    assert all(got[n] == 100 for n in b), got
    again = {
        r["node"]: r["lbl"]
        for r in label_propagation(df, rounds=4).collect()
    }
    assert again == got


def test_winsorize_stats_vs_numpy(spark):
    """winsorize_stats must match the nearest-rank numpy replica:
    lo/hi at ranks ceil(q*n), clamp counts, decimal-exact sum."""
    from decimal import ROUND_HALF_UP, Decimal

    from dataclass_array_spark.operators.robust import winsorize_stats

    rng = np.random.default_rng(5)
    groups, vals = [], []
    for g, n in (("a", 41), ("b", 100), ("c", 7)):
        x = np.round(rng.normal(50, 10, n), 2)
        x[0], x[1] = 500.0, -500.0  # extreme tails
        groups += [g] * n
        vals += list(x)
    pdf = pd.DataFrame({"grp": groups, "val": vals})
    got = {
        r["grp"]: (r["lo"], r["hi"], r["n_lo"], r["n_hi"], r["sum_winsorized"])
        for r in winsorize_stats(
            spark.createDataFrame(pdf), "grp", "val", q_lo=0.1, q_hi=0.9
        ).collect()
    }
    q6 = lambda x: Decimal(repr(float(x))).quantize(  # noqa: E731
        Decimal("1e-6"), ROUND_HALF_UP
    )
    import math

    for g in ("a", "b", "c"):
        xs = sorted(v for gg, v in zip(groups, vals) if gg == g)
        n = len(xs)
        lo = xs[max(1, math.ceil(0.1 * n)) - 1]
        hi = xs[max(1, math.ceil(0.9 * n)) - 1]
        n_lo = sum(1 for v in xs if v < lo)
        n_hi = sum(1 for v in xs if v > hi)
        s = float(
            sum((q6(min(max(v, lo), hi)) for v in xs), Decimal(0))
        )
        glo, ghi, gnlo, gnhi, gsum = got[g]
        assert glo == lo and ghi == hi, (g, got[g], lo, hi)
        assert gnlo == n_lo and gnhi == n_hi
        assert gsum == s, (g, gsum, s)


def test_weighted_sample_vs_python_replica(spark):
    """weighted_sample must match a pure-python replica of the whole
    key chain (md5-uniform, fixed-order ln series, A-ES key, top-n
    with id tie-break) bit-for-bit."""
    import hashlib

    from dataclass_array_spark.operators.sampling import weighted_sample
    from dataclass_array_spark.operators.text import _LN_SERIES_K, LN2_DOUBLE

    rng = random.Random(13)
    rows = [(i, float(rng.choice([1, 2, 5, 40]))) for i in range(60)]
    pdf = pd.DataFrame({"id": [i for i, _ in rows], "wt": [w for _, w in rows]})
    got = [
        (r["id"], r["w"], r["key_e9"])
        for r in weighted_sample(
            spark.createDataFrame(pdf), "id", F.col("wt"), n=15
        ).orderBy("id").collect()
    ]

    def py_ln(n: int) -> float:
        e = n.bit_length() - 1
        m = n / float(1 << e)
        z = (m - 1.0) / (m + 1.0)
        z2 = z * z
        term = z
        acc = z
        for k in range(1, _LN_SERIES_K):
            term = term * z2
            acc = acc + term / float(2 * k + 1)
        return float(e) * LN2_DOUBLE + 2.0 * acc

    ln_u60 = 60.0 * LN2_DOUBLE
    keyed = []
    for i, w in rows:
        h = int(hashlib.md5(f"ws|{i}".encode()).hexdigest()[:15], 16) + 1
        keyed.append((i, w, (py_ln(h) - ln_u60) / w))
    keyed.sort(key=lambda t: (-t[2], t[0]))
    import math

    want = sorted(
        (i, w, math.floor(k * 1e9)) for i, w, k in keyed[:15]
    )
    assert got == want
    # proportionality sanity for THIS deterministic draw: weight-40
    # rows are ~1/8 of the corpus but must dominate the sample
    heavy = sum(1 for _, w, _ in got if w == 40.0)
    assert heavy >= 8, got


def test_ewma_vs_python_replica(spark):
    """ewma_last must match the pure-python recurrence bit-for-bit
    (same order, same alpha arithmetic), excluding NULL values."""
    from dataclass_array_spark.operators.timeseries import ewma_last

    rng = random.Random(59)
    rows = []
    for u in range(6):
        for t in range(rng.randrange(1, 15)):
            rows.append(
                {
                    "u": u,
                    "t": t,
                    "i": 1000 + t,
                    "v": None if rng.random() < 0.1 else round(rng.uniform(-5, 5), 3),
                }
            )
    pdf = pd.DataFrame(rows)
    got = {
        r["u"]: (r["n_events"], r["ewma"])
        for r in ewma_last(
            spark.createDataFrame(pdf), "u", ["t", "i"], "v", alpha=0.25
        ).collect()
    }
    want = {}
    for u in range(6):
        vs = [r["v"] for r in rows if r["u"] == u and r["v"] is not None]
        if not vs:
            continue
        s = vs[0]
        for x in vs[1:]:
            s = 0.25 * x + 0.75 * s
        want[u] = (len(vs), s)
    assert got == want


def test_nucleus_select_vs_python_replica(spark):
    """nucleus_select must match a Decimal-arithmetic python replica
    exactly (rank by quantized score desc/id, inclusive cumulative
    mass, cross-multiplied p test) — including the boundary where one
    more row would cross p."""
    from decimal import ROUND_HALF_UP, Decimal

    from dataclass_array_spark.operators.sampling import nucleus_select

    rng = random.Random(67)
    rows = [
        {"id": i, "g": f"g{i % 3}", "sc": round(rng.uniform(0, 10), 4)}
        for i in range(45)
    ]
    pdf = pd.DataFrame(rows)
    got = {
        (r["id"], r["g"]): r["cum_e6"]
        for r in nucleus_select(
            spark.createDataFrame(pdf), "id", "g", F.col("sc"), 4, 5
        ).collect()
    }
    q6 = lambda x: Decimal(repr(float(x))).quantize(  # noqa: E731
        Decimal("1e-6"), ROUND_HALF_UP
    )
    want = {}
    for g in ("g0", "g1", "g2"):
        grp = sorted(
            (r for r in rows if r["g"] == g),
            key=lambda r: (-q6(r["sc"]), r["id"]),
        )
        tot = sum((q6(r["sc"]) for r in grp), Decimal(0))
        cum = Decimal(0)
        for r in grp:
            cum += q6(r["sc"])
            if cum * 5 <= tot * 4:
                want[(r["id"], g)] = int(cum * 1000000)
    assert got == want


def test_ols_by_group_vs_numpy(spark):
    """ols_by_group must match numpy.polyfit's closed-form answer to
    float precision on random grouped data (the operator's exact
    moments differ from lstsq only in rounding)."""
    from dataclass_array_spark.operators.robust import ols_by_group

    rng = np.random.default_rng(3)
    rows = []
    for g, (a, b, n) in enumerate([(2.5, -1.0, 60), (-0.5, 7.0, 45)]):
        x = np.round(rng.uniform(0, 20, n), 2)
        y = np.round(a * x + b + rng.normal(0, 0.5, n), 2)
        rows += [{"g": f"g{g}", "x": float(xi), "y": float(yi)} for xi, yi in zip(x, y)]
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"])
        for r in ols_by_group(
            spark.createDataFrame(pd.DataFrame(rows)), "g", "x", "y"
        ).collect()
    }
    for g in ("g0", "g1"):
        xs = np.array([r["x"] for r in rows if r["g"] == g])
        ys = np.array([r["y"] for r in rows if r["g"] == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        n, gs, gi = got[g]
        assert n == len(xs)
        assert abs(gs - slope) < 1e-9 and abs(gi - intercept) < 1e-9


def test_ngram_jaccard_prefix_filter_lossless(spark):
    """PPJoin prefix filtering must keep the verified pair set (and
    every n_inter/jaccard value) identical on a corpus with a shared
    hot shingle, while indexing strictly fewer rows."""
    from dataclass_array_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(79)
    vocab = [f"w{i}" for i in range(15)]
    # every doc starts with the same 3 tokens -> one ubiquitous shingle
    texts = {
        i: "hot hot hot " + " ".join(rng.choice(vocab) for _ in range(12))
        for i in range(40)
    }
    texts[100] = texts[0]  # exact dup -> jaccard 1.0 pair
    df = spark.createDataFrame(
        pd.DataFrame({"id": list(texts), "text": list(texts.values())})
    )

    def run(pf):
        return {
            (r["id_a"], r["id_b"]): (r["n_inter"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                df, "text", "id", threshold=0.2, max_doc_freq=None,
                prefix_filter=pf,
            ).collect()
        }

    with_pf = run(True)
    without = run(False)
    assert with_pf == without
    assert (0, 100) in with_pf and with_pf[(0, 100)][1] == 1.0


def test_ngram_jaccard_prefix_exact_integer_boundary(spark):
    """Round-9 regression (ADVICE r8): the prefix rank bound must use
    EXACT rational arithmetic.  threshold=0.07, |A|=100 → t·n is
    mathematically 7, but the float product 0.07*100 =
    7.000000000000001 ceils to 8, shortening A's prefix to 93 — and
    this corpus puts A's 7 shared shingles at ranks 94..100 (93 rarer
    unique tokens precede them), so the buggy bound prunes the pair
    whose jaccard is exactly at threshold (7/100 = 0.07)."""
    from dataclass_array_spark.operators.dedup import ngram_jaccard_pairs

    shared = [f"s{i}" for i in range(7)]        # df=2 → rank AFTER uniques
    unique = [f"u{i:02d}" for i in range(93)]   # df=1 → A's first 93 ranks
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2],
                "text": [" ".join(unique + shared), " ".join(shared)],
            }
        )
    )
    for pf in (True, False):
        rows = ngram_jaccard_pairs(
            df, "text", "id", threshold=0.07, shingle_k=1,
            max_doc_freq=None, prefix_filter=pf,
        ).collect()
        assert len(rows) == 1, f"prefix_filter={pf} lost the boundary pair"
        assert rows[0]["n_inter"] == 7
        assert rows[0]["jaccard"] == 7.0 / 100.0
