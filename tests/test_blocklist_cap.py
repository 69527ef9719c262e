"""Unit tests for the C4-style blocklist phrase filter and the
per-key quota sampler (``operators/blocklist.py``,
``sampling.cap_per_key``)."""

import pytest
from pyspark.sql import functions as F

from dataclass_array_spark.operators.blocklist import (
    blocklist_matches,
    normalize_phrases,
    phrase_table,
)
from dataclass_array_spark.operators.sampling import cap_per_key


def test_normalize_phrases_dedup_and_casefold():
    assert normalize_phrases(["Hash  JOIN", "hash join", "dup"]) == [
        ("dup", 1),
        ("hash join", 2),
    ]


def test_normalize_phrases_rejects_empty():
    with pytest.raises(ValueError, match="no tokens"):
        normalize_phrases(["ok", "   "])


def test_phrase_table_shape(spark):
    t = phrase_table(spark, ["a b c", "x"])
    assert [tuple(r) for r in t.collect()] == [("a b c", 3), ("x", 1)]


def test_blocklist_matches_counts(spark):
    df = spark.createDataFrame(
        [
            # "bad word" twice (overlap-free), "bad" alone once more
            (1, "a bad word then bad word again and bad alone"),
            # phrase inside longer text, mixed case + extra whitespace
            (2, "Totally   Bad  WORD here"),
            (3, "clean document with no problems"),
            (4, ""),  # empty text -> 0 tokens, not blocked
            (5, "bad bad bad"),  # unigram occurrences count each
        ],
        "id long, text string",
    )
    out = blocklist_matches(df, "text", "id", ["bad word", "bad"]).orderBy("id")
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["n_matches"] == 5  # 2x "bad word" + 3x "bad"
    assert rows[1]["n_phrases"] == 2 and rows[1]["blocked"]
    assert rows[2]["n_matches"] == 2 and rows[2]["n_phrases"] == 2
    assert rows[3]["n_matches"] == 0 and not rows[3]["blocked"]
    assert rows[4] and rows[4]["n_tokens"] == 0 and not rows[4]["blocked"]
    assert rows[5]["n_matches"] == 3 and rows[5]["n_phrases"] == 1
    assert out.count() == 5  # every input row survives


def test_blocklist_longer_phrase_than_doc(spark):
    df = spark.createDataFrame([(1, "one two")], "id long, text string")
    out = blocklist_matches(df, "text", "id", ["one two three four"])
    r = out.collect()[0]
    assert r["n_matches"] == 0 and r["n_tokens"] == 2


def test_cap_per_key_respects_cap_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(k, i) for k in ("a", "b", "c") for i in range(10)] + [("tiny", 0)],
        "k string, id long",
    )
    kept = cap_per_key(df, ["k"], 3, ["id"])
    counts = {r["k"]: r["c"] for r in
              kept.groupBy("k").agg(F.count("*").alias("c")).collect()}
    assert counts == {"a": 3, "b": 3, "c": 3, "tiny": 1}
    again = cap_per_key(df, ["k"], 3, ["id"])
    assert sorted(map(tuple, kept.collect())) == sorted(
        map(tuple, again.collect())
    )
    # a different salt picks a different (still size-3) subset
    other = cap_per_key(df, ["k"], 3, ["id"], salt="other")
    assert other.count() == 10
    assert sorted(map(tuple, other.collect())) != sorted(
        map(tuple, kept.collect())
    )


def test_cap_per_key_rejects_bad_cap(spark):
    df = spark.createDataFrame([("a", 1)], "k string, id long")
    with pytest.raises(ValueError, match="cap must be >= 1"):
        cap_per_key(df, ["k"], 0, ["id"])


def test_cap_per_key_matches_duckdb(spark):
    """The Spark survivors equal the SQL-mirror survivors row for row
    (same md5 priority, same tie-break)."""
    import duckdb

    from dataclass_array_spark.operators.sampling import sql_cap_per_key_pred

    rows = [(f"k{i % 5}", i) for i in range(57)]
    df = spark.createDataFrame(rows, "k string, id long")
    got = sorted(map(tuple, cap_per_key(df, ["k"], 4, ["id"]).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = sql_cap_per_key_pred(["k"], 4, ["id"])
    want = sorted(
        map(tuple, con.sql(f"SELECT k, id FROM t QUALIFY {pred}").fetchall())
    )
    assert got == want


def test_blocklist_matches_python_reference_fuzz(spark):
    """Randomized differential: occurrence and distinct-phrase counts
    must equal a straightforward Python sliding-window reference on
    random token docs with random multi-length phrase lists."""
    import random

    random.seed(41)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = [
        (i, " ".join(random.choice(vocab) for _ in range(random.randrange(0, 30))))
        for i in range(40)
    ]
    phrases = list({
        " ".join(random.choice(vocab) for _ in range(random.randrange(1, 4)))
        for _ in range(8)
    })
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r["id"]: (r["n_tokens"], r["n_matches"], r["n_phrases"])
        for r in blocklist_matches(df, "text", "id", phrases).collect()
    }
    norm = sorted({tuple(p.split()) for p in phrases})
    for i, t in docs:
        toks = t.split()
        n_match = 0
        hit = set()
        for p in norm:
            occ = sum(
                1
                for j in range(len(toks) - len(p) + 1)
                if tuple(toks[j : j + len(p)]) == p
            )
            n_match += occ
            if occ:
                hit.add(p)
        assert got[i] == (len(toks), n_match, len(hit)), (i, t)


def test_normalize_phrases_rejects_empty_list():
    with pytest.raises(ValueError, match="empty phrase list"):
        normalize_phrases([])


def test_normalize_phrases_ascii_whitespace_only():
    """U+00A0 is NOT a separator for the engines' \\s+ (ASCII-only in
    Java regex and RE2), so the Python-side normalization must keep
    'foo\\xa0bar' as ONE token — str.split() would break the contract."""
    assert normalize_phrases(["foo\xa0bar"]) == [("foo\xa0bar", 1)]



def test_cap_per_key_null_id_raises_loudly(spark):
    """Round-14 ADVICE: the documented non-NULL id contract is now
    ENFORCED — Spark's concat_ws would silently skip a NULL id (while
    the DuckDB mirror's || propagates it), ranking different survivors
    per engine.  Both engines must instead fail loudly."""
    import pytest

    df = spark.createDataFrame(
        [("a", "x1"), ("a", None), ("b", "x3")], "k string, id string"
    )
    with pytest.raises(Exception, match="NULL in id_cols"):
        cap_per_key(df, ["k"], 2, ["id"]).collect()


def test_sql_cap_per_key_pred_null_id_raises_loudly():
    import duckdb
    import pytest

    from dataclass_array_spark.operators.sampling import sql_cap_per_key_pred

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, id VARCHAR)")
    con.execute("INSERT INTO t VALUES ('a', 'x1'), ('a', NULL)")
    pred = sql_cap_per_key_pred(["k"], 1, ["id"])
    with pytest.raises(Exception, match="NULL in id_cols"):
        con.sql(f"SELECT * FROM t QUALIFY {pred}").fetchall()


def test_cap_per_key_non_null_ids_unchanged_by_guard(spark):
    """The guard must be value-transparent for valid inputs (the gate
    relies on identical survivor sets before/after the fix)."""
    rows = [("k%d" % (i % 3), i) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, id long")
    kept = cap_per_key(df, ["k"], 3, ["id"])
    assert kept.count() == 9
    again = sorted(map(tuple, cap_per_key(df, ["k"], 3, ["id"]).collect()))
    assert sorted(map(tuple, kept.collect())) == again
