"""URL canonicalization: expected-value cases (the RFC-3986-subset
contract), Spark↔DuckDB expression parity, and dedup semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

# (input, expected canonical) — the module contract, case by case
CASES = [
    # scheme+host case-fold, default port, tracking param, fragment
    ("HTTP://WWW.Example.COM:80/Path/To?utm_source=x&id=3#frag",
     "http://www.example.com/Path/To?id=3"),
    # already canonical
    ("http://www.example.com/Path/To?id=3",
     "http://www.example.com/Path/To?id=3"),
    # https default port + two tracking params; %-escapes untouched
    ("https://Sub.Example.com:443/a%20b?b=2&utm_campaign=z&gclid=1",
     "https://sub.example.com/a%20b?b=2"),
    # non-default port kept
    ("https://sub.example.com:8443/a%20b?b=2",
     "https://sub.example.com:8443/a%20b?b=2"),
    # userinfo dropped, duplicate keys keep order, whitespace trimmed
    ("  http://user:pw@host.com:8080/x?a=1&a=2&fbclid=q  ",
     "http://host.com:8080/x?a=1&a=2"),
    # empty path -> /
    ("http://example.com", "http://example.com/"),
    # query entirely tracking -> no '?'
    ("http://example.com?utm_source=only#f", "http://example.com/"),
    # non-URL fallback: lower(trim), fragment-stripped, params kept
    ("example.com/no-scheme?utm_source=x", "example.com/no-scheme?utm_source=x"),
    # non-http scheme: port NOT a default, kept
    ("ftp://Files.Example.org:21/pub/", "ftp://files.example.org:21/pub/"),
    # dangling '?'
    ("https://example.com/?", "https://example.com/"),
    # path/query case preserved
    ("HtTpS://MIXED.case/QueryCase?Key=Val", "https://mixed.case/QueryCase?Key=Val"),
    ("http://example.com#justfrag", "http://example.com/"),
    ("", ""),
    ("https://example.com:443", "https://example.com/"),
]


def test_canonicalize_expected_values(spark):
    from dataclass_array_spark.operators.url import canonicalize_url

    df = spark.createDataFrame([(c,) for c, _ in CASES], "u string")
    got = [r["c"] for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    assert got == [w for _, w in CASES]


def test_canonicalize_duckdb_parity(spark):
    """The oracle mirror must agree expression-for-expression — parity
    over the full case table, both engines."""
    from dataclass_array_spark.operators.url import canon_sql, canonicalize_url

    df = spark.createDataFrame([(c,) for c, _ in CASES], "u string")
    got = [r["c"] for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    vals = ", ".join("(" + repr(c).replace('"', "'") + ")" for c, _ in CASES)
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {canon_sql('u')} FROM (VALUES {vals}) t(u)"
        ).fetchall()
    ]
    assert got == want


def test_url_host_and_domain(spark):
    from dataclass_array_spark.operators.url import url_domain, url_host

    df = spark.createDataFrame(
        [
            ("http://a.b.c.co.uk:8080?z=1",),
            ("HTTPS://WWW.Example.COM/x",),
            ("not a url",),
        ],
        "u string",
    )
    rows = df.select(
        url_host(F.col("u")).alias("h"), url_domain(F.col("u")).alias("d")
    ).collect()
    assert [(r["h"], r["d"]) for r in rows] == [
        ("a.b.c.co.uk", "co.uk"),  # last-two-label approximation
        ("www.example.com", "example.com"),
        ("", ""),
    ]


def test_dedup_urls_collapses_variants(spark):
    from dataclass_array_spark.operators.url import dedup_urls

    df = spark.createDataFrame(
        [
            (1, "HTTP://X.com:80/a?utm_source=s"),
            (2, "http://x.com/a"),
            (3, "http://x.com/a#frag"),
            (4, "http://x.com/b"),
        ],
        "id long, url string",
    )
    got = {
        r["canon_url"]: (r["rep_id"], r["n_dups"])
        for r in dedup_urls(df, "url", "id").collect()
    }
    assert got == {"http://x.com/a": (1, 3), "http://x.com/b": (4, 1)}


def test_dedup_urls_plan_is_single_agg_no_python(spark):
    import io
    from contextlib import redirect_stdout

    from dataclass_array_spark.operators.url import dedup_urls

    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("http://h.com/"), F.col("id") % 7).alias("url")
    )
    out = dedup_urls(df, "url", "id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    assert "Join" not in p  # canonical form is in-scan, not a lookup


def test_canonicalize_idempotent_hypothesis(spark):
    """canonicalize(canonicalize(x)) == canonicalize(x) — the defining
    canonicalizer property, fuzzed over URL-shaped and garbage inputs
    (one Spark pass over the whole generated batch)."""
    from hypothesis import given, settings, strategies as st

    from dataclass_array_spark.operators.url import canonicalize_url

    scheme = st.sampled_from(["http", "HTTP", "https", "ftp", "HtTpS"])
    host = st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True)
    port = st.sampled_from(["", ":80", ":443", ":8080", ":0021"])
    path = st.from_regex(r"(/[A-Za-z0-9%._\-]{0,8}){0,3}", fullmatch=True)
    query = st.sampled_from(
        ["", "?a=1", "?utm_source=x", "?a=1&utm_medium=m&b=2", "?", "?&&a=1"]
    )
    frag = st.sampled_from(["", "#f", "#a#b"])
    user = st.sampled_from(["", "u@", "u:p@"])
    url = st.builds(
        lambda s, u, h, po, pa, q, f: f"{s}://{u}{h}{po}{pa}{q}{f}",
        scheme, user, host, port, path, query, frag,
    )
    garbage = st.text(
        alphabet="ab:/?#@&=.% ", min_size=0, max_size=30
    )
    cases = st.lists(st.one_of(url, garbage), min_size=1, max_size=40)

    @settings(max_examples=12, deadline=None)
    @given(cases)
    def run(batch):
        df = spark.createDataFrame([(c,) for c in batch], "u string")
        once = df.select(F.col("u"), canonicalize_url(F.col("u")).alias("c1"))
        twice = once.select(
            "u", "c1", canonicalize_url(F.col("c1")).alias("c2")
        )
        bad = twice.filter(F.col("c1") != F.col("c2")).collect()
        assert not bad, [(r["u"], r["c1"], r["c2"]) for r in bad[:3]]

    run()
