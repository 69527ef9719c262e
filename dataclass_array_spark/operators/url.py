"""URL / domain canonicalization and URL-level dedup — the first pass
of every crawl pipeline (round-12 VERDICT item 4).

Canonicalization contract (the practical crawl-dedup subset of
RFC 3986 §6 normalization, all pure column expressions):

1. trim; strip the fragment (``#…`` never reaches the origin server);
2. lowercase the SCHEME and HOST only (path/query are case-sensitive
   per the RFC);
3. drop ``user@`` userinfo (ftp-era noise, a phishing vector in crawl
   data — never part of the resource identity);
4. drop the port when it is the scheme default (``http:80``,
   ``https:443``), keep any other explicit port;
5. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``igshid``, ``mc_eid``) and the ``?`` itself when
   nothing survives; surviving parameters KEEP their original order
   (re-sorting can change semantics for duplicate keys);
6. empty path becomes ``/`` (``http://x.com`` ≡ ``http://x.com/``).

Strings without a ``scheme://`` prefix are not URLs; they pass through
as ``lower(trim(s))`` so the operator is total (crawl frontiers are
full of bare hosts).  NOT done (documented limitations): percent-
encoding normalization and dot-segment removal (rare in crawl data,
expensive as column expressions), and IDN/punycode host folding (needs
an IDNA table; punycode hosts pass through byte-identically, which is
still deterministic).

Everything is regexp_extract / regexp_replace / split / filter with
patterns chosen to behave identically in Java regex (Spark) and RE2
(DuckDB) — anchored, no backrefs, no lookaround — so the oracle
mirrors the operator expression-for-expression
(:data:`CANON_SQL_TEMPLATE`).

Registrable-domain extraction (:func:`url_domain`) approximates the
public-suffix list with "last two labels" (``a.b.example.co.uk`` →
``co.uk`` is WRONG under the PSL) — documented approximation; a real
deployment ships the PSL as a broadcast lookup table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "url_host",
    "url_domain",
    "dedup_urls",
    "canon_sql",
    "TRACKING_RE",
]

# anchored param-name match; identical semantics in Java regex and RE2
TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|igshid|mc_eid)="
_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"


def _parts(u: Column):
    t = F.trim(u)
    nf = F.regexp_replace(t, "#.*", "")           # fragment
    is_url = nf.rlike(_SCHEME_RE)
    scheme = F.lower(F.regexp_extract(nf, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    after = F.regexp_replace(nf, _SCHEME_RE, "")
    auth = F.regexp_extract(after, "^([^/?]*)", 1)
    hostport = F.regexp_replace(auth, "^[^@]*@", "")
    host = F.lower(F.regexp_replace(hostport, ":[0-9]*$", ""))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    pathq = F.regexp_replace(after, "^[^/?]*", "")
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    return t, nf, is_url, scheme, host, port, path, query


def canonicalize_url(u: Column) -> Column:
    """Canonical form of a URL column under the module contract."""
    t, nf, is_url, scheme, host, port, path, query = _parts(u)
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != F.lit("")) & ~x.rlike(TRACKING_RE),
        ),
        "&",
    )
    port_part = F.when(
        (port == F.lit(""))
        | ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443"))),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(path == F.lit(""), F.lit("/")).otherwise(path)
    q_part = F.when(kept == F.lit(""), F.lit("")).otherwise(
        F.concat(F.lit("?"), kept)
    )
    return F.when(
        is_url,
        F.concat(scheme, F.lit("://"), host, port_part, path_part, q_part),
    ).otherwise(F.lower(nf))


def url_host(u: Column) -> Column:
    """Lowercased host of a URL column ('' for non-URLs)."""
    _, _, is_url, _, host, _, _, _ = _parts(u)
    return F.when(is_url, host).otherwise(F.lit(""))


def url_domain(u: Column) -> Column:
    """Approximate registrable domain: the last two host labels (see
    module docstring for the PSL caveat)."""
    return F.regexp_extract(url_host(u), r"([^.]+\.[^.]+)$", 1)


def dedup_urls(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """URL-level exact dedup after canonicalization: → (canon_url,
    rep_id, n_dups) with the smallest id as the representative.  ONE
    map-side-combined aggregation on the canonical string — the same
    single-shuffle shape as content hash dedup (``dedup.py``), and at
    100 TB the canonical form is computed in-scan (no UDF, no join)."""
    return (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canon_url"),
            F.col(id_col),
        )
        .groupBy("canon_url")
        .agg(
            F.min(id_col).cast("long").alias("rep_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def canon_sql(u_expr: str) -> str:
    """DuckDB mirror of :func:`canonicalize_url` for ``u_expr`` — same
    pipeline, same patterns, inlined as one scalar expression.  DuckDB
    regexp_replace is first-match (all patterns here are anchored or
    rest-of-string, so first-match ≡ Spark's replace-all) and
    regexp_extract returns NULL on no-match where Spark returns '' —
    every extract is COALESCE-wrapped to '' so each stage mirrors
    1:1."""
    nf = f"regexp_replace(trim({u_expr}), '#.*', '')"
    scheme = (
        "lower(COALESCE(regexp_extract("
        f"{nf}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), ''))"
    )
    after = f"regexp_replace({nf}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    auth = f"COALESCE(regexp_extract({after}, '^([^/?]*)', 1), '')"
    hostport = f"regexp_replace({auth}, '^[^@]*@', '')"
    host = f"lower(regexp_replace({hostport}, ':[0-9]*$', ''))"
    port = f"COALESCE(regexp_extract({hostport}, ':([0-9]+)$', 1), '')"
    pathq = f"regexp_replace({after}, '^[^/?]*', '')"
    path = f"COALESCE(regexp_extract({pathq}, '^([^?]*)', 1), '')"
    query = f"COALESCE(regexp_extract({pathq}, '\\?(.*)$', 1), '')"
    # array_to_string of an empty list is NULL in DuckDB ('' in Spark)
    kept = (
        "COALESCE(array_to_string(list_filter(string_split("
        + query
        + ", '&'), "
        f"x -> x != '' AND NOT regexp_matches(x, '{TRACKING_RE}')), '&'), '')"
    )
    port_part = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') THEN '' "
        f"ELSE ':' || {port} END"
    )
    path_part = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    q_part = f"CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END"
    return (
        f"CASE WHEN regexp_matches({nf}, '^[A-Za-z][A-Za-z0-9+.-]*://') "
        f"THEN {scheme} || '://' || {host} || {port_part} || {path_part} || {q_part} "
        f"ELSE lower({nf}) END"
    )


def host_sql(u_expr: str) -> str:
    """DuckDB mirror of :func:`url_host` ('' for non-URLs)."""
    nf = f"regexp_replace(trim({u_expr}), '#.*', '')"
    after = f"regexp_replace({nf}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    auth = f"COALESCE(regexp_extract({after}, '^([^/?]*)', 1), '')"
    hostport = f"regexp_replace({auth}, '^[^@]*@', '')"
    host = f"lower(regexp_replace({hostport}, ':[0-9]*$', ''))"
    return (
        f"CASE WHEN regexp_matches({nf}, '^[A-Za-z][A-Za-z0-9+.-]*://') "
        f"THEN {host} ELSE '' END"
    )


def domain_sql(u_expr: str) -> str:
    """DuckDB mirror of :func:`url_domain` (last-two-label
    approximation of the registrable domain)."""
    return (
        f"COALESCE(regexp_extract({host_sql(u_expr)}, "
        "'([^.]+\\.[^.]+)$', 1), '')"
    )
