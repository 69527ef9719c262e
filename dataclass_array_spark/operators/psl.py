"""Public-suffix-list registrable domains (round-13 VERDICT item 2).

``url.url_domain``'s last-two-label form is WRONG for multi-label
public suffixes (``a.b.example.co.uk`` → ``co.uk``).  This module
implements the publicsuffix.org algorithm as a Spark-first
longest-matching-suffix JOIN against a rules table that is bounded by
construction (the full PSL is ~10k rules; the broadcast hint is legal
— the round-12 no-forced-broadcast rule exempts bounded-by-
construction sides):

1. each host generates ≤ ``2·max_rule_labels − 1`` candidate keys
   in-scan: its label suffixes (``a.b.co.uk`` → ``uk``, ``co.uk``,
   ``b.co.uk``) plus wildcard forms (``*.uk``, ``*.co.uk``) — '*'
   matches exactly one label per the PSL spec;
2. candidates broadcast-join the rules; the winning rule per host is
   the exception rule if any, else the most-labels match, else the
   implicit default rule ``*`` (public suffix = last label) — encoded
   as ``max(is_exc·1000 + nlabels)``, an integer so the pick is
   engine-portable;
3. an exception rule's public suffix is the rule minus its leftmost
   label (``!www.ck`` → suffix ``ck``); registrable domain = public
   suffix plus one preceding host label, or '' when the host IS a
   public suffix.

Intended 100 TB shape: aggregate the corpus per HOST first (one
map-side-combined shuffle), run this map on the host DIMENSION
(≤ ~100 M rows at crawl scale), then roll hosts up to domains —
see ``workload/llm4.url_domain_stats_docs``.

:data:`PSL_SNAPSHOT` is a curated SUBSET of the ICANN section of the
public suffix list (publicsuffix.org, MPL-2.0 data; only rules that
change the answer vs the default single-label suffix are needed —
plain TLDs are covered by the implicit ``*`` rule).  Production
deployments load the full published list file via
:func:`parse_psl_rules`; the algorithm is rule-count-independent.

Oracle mirrors: :func:`psl_rules_values_sql` inlines the SAME rule
table as a VALUES CTE and :func:`registrable_sql_ctes` replays the
candidate/explode/score pipeline stage-for-stage in DuckDB.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "PSL_SNAPSHOT",
    "parse_psl_rules",
    "load_psl_file",
    "psl_rules_df",
    "host_registrable_map",
    "psl_rules_values_sql",
    "registrable_sql_ctes",
]

# Curated ICANN-section snapshot (publicsuffix.org).  Grouped by TLD;
# '*.x' = wildcard (one label), '!y.x' = exception.  Single-label TLD
# rules are omitted on purpose: the PSL's implicit default rule '*'
# (suffix = last label) already covers them.
PSL_SNAPSHOT: Tuple[str, ...] = (
    # ---- uk ----
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # ---- jp (organizational + prefectures + wildcard cities) ----
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "aichi.jp", "akita.jp", "aomori.jp", "chiba.jp", "ehime.jp",
    "fukui.jp", "fukuoka.jp", "fukushima.jp", "gifu.jp", "gunma.jp",
    "hiroshima.jp", "hokkaido.jp", "hyogo.jp", "ibaraki.jp",
    "ishikawa.jp", "iwate.jp", "kagawa.jp", "kagoshima.jp",
    "kanagawa.jp", "kochi.jp", "kumamoto.jp", "kyoto.jp", "mie.jp",
    "miyagi.jp", "miyazaki.jp", "nagano.jp", "nagasaki.jp", "nara.jp",
    "niigata.jp", "oita.jp", "okayama.jp", "okinawa.jp", "osaka.jp",
    "saga.jp", "saitama.jp", "shiga.jp", "shimane.jp", "shizuoka.jp",
    "tochigi.jp", "tokushima.jp", "tokyo.jp", "tottori.jp", "toyama.jp",
    "wakayama.jp", "yamagata.jp", "yamaguchi.jp", "yamanashi.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # ---- au ----
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # ---- nz ----
    "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
    "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
    "org.nz", "parliament.nz", "school.nz",
    # ---- za ----
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    # ---- br ----
    "adv.br", "art.br", "com.br", "eco.br", "edu.br", "emp.br",
    "eng.br", "gov.br", "ind.br", "inf.br", "jus.br", "leg.br",
    "med.br", "mil.br", "net.br", "org.br", "tv.br",
    # ---- in ----
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # ---- cn ----
    "ac.cn", "ah.cn", "bj.cn", "com.cn", "edu.cn", "gd.cn", "gov.cn",
    "mil.cn", "net.cn", "org.cn", "sh.cn", "zj.cn",
    # ---- kr ----
    "ac.kr", "busan.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr",
    "mil.kr", "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    "seoul.kr",
    # ---- mx / ar / co ----
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar", "tur.ar",
    "com.co", "edu.co", "gob.co", "gov.co", "int.co", "mil.co",
    "net.co", "nom.co", "org.co",
    # ---- tr ----
    "av.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr", "gen.tr",
    "gov.tr", "info.tr", "k12.tr", "mil.tr", "name.tr", "net.tr",
    "org.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
    # ---- tw / hk / sg / th / my / ph / vn / id ----
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my",
    "org.my",
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    # ---- il / sa / ae / eg / pk ----
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
    "pub.sa", "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "biz.pk", "com.pk", "edu.pk", "fam.pk", "gob.pk", "gov.pk",
    "net.pk", "org.pk", "web.pk",
    # ---- ng / ke ----
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    # ---- pl / ua / es / fr / it ----
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "net.pl",
    "org.pl", "waw.pl",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua", "kyiv.ua",
    "net.ua", "org.ua",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "edu.it", "gov.it",
    # ---- ca (provinces) ----
    "ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
    "yk.ca",
    # ---- us (state structure; includes 3-label rules) ----
    "ca.us", "fl.us", "ny.us", "tx.us", "wa.us",
    "cc.ca.us", "k12.ca.us", "lib.ca.us",
    "cc.ny.us", "k12.ny.us", "lib.ny.us",
    # ---- all-wildcard ccTLDs ----
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm",
    "*.np", "*.pg",
)


def parse_psl_rules(
    lines: Iterable[str],
) -> List[Tuple[str, int, int]]:
    """Parse PSL-format rule lines → ``(rule_key, nlabels, is_exc)``.
    Accepts the published file format: comments (``//``) and blank
    lines are skipped, ``!`` marks exceptions (stored without the
    ``!``), ``*`` stays literal in the key.  Feed it the full
    https://publicsuffix.org/list/ file in production."""
    out: List[Tuple[str, int, int]] = []
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        is_exc = 1 if line.startswith("!") else 0
        key = line[1:] if is_exc else line
        out.append((key, len(key.split(".")), is_exc))
    return out


def load_psl_file(path: str, section: Optional[str] = "ICANN") -> List[str]:
    """Load rule LINES from a published public_suffix_list.dat file —
    the production path for the full ~15k-rule list (this container
    has no network, so the repo bundles only :data:`PSL_SNAPSHOT`; a
    deployment drops the published file next to its job and passes
    these lines to :func:`psl_rules_df`).  ``section="ICANN"`` keeps
    only the ICANN-managed block (the registrable-domain semantics
    crawl pipelines want); ``section=None`` keeps everything including
    PRIVATE-section entries like ``*.github.io``.  Comment/blank
    filtering itself is :func:`parse_psl_rules`'s job — this returns
    raw lines so the two compose like ``parse_psl_rules(
    load_psl_file(p))``."""
    out: List[str] = []
    keep = section is None
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            s = line.strip()
            if section is not None:
                if s.startswith(f"// ===BEGIN {section}"):
                    keep = True
                    continue
                if s.startswith(f"// ===END {section}"):
                    keep = False
                    continue
            if keep:
                out.append(line)
    if not out:
        raise ValueError(
            f"load_psl_file: no rules found in {path!r}"
            + (f" section {section!r}" if section else "")
        )
    return out


def _max_rule_labels(rules: Sequence[Tuple[str, int, int]]) -> int:
    return max(n for _, n, _ in rules)


# Session-scoped cache for the DEFAULT snapshot's rules frame: the
# rules are a static data asset, but building the frame costs a parse
# + createDataFrame per call, which repeated gates pay over and over
# (round-14 ADVICE/VERDICT item 6 — this was a measurable constant in
# url_domain_stats_docs).  Single entry keyed by session identity; a
# new session naturally evicts the old frame.
_DEFAULT_RULES_CACHE: list = []  # [(SparkSession, DataFrame)]


def psl_rules_df(
    spark: SparkSession, rules: Optional[Iterable[str]] = None
) -> DataFrame:
    """Rules as a DataFrame ``(rule_key, rule_labels, is_exc)`` —
    bounded by construction (≤ ~10k rows for the full PSL), the legal
    broadcast side of the suffix join.  The default-snapshot frame is
    cached per session (the same DataFrame object is returned on
    repeat calls, so its broadcast exchange is reusable); explicit
    ``rules`` always build fresh."""
    if rules is None:
        if _DEFAULT_RULES_CACHE and _DEFAULT_RULES_CACHE[0][0] is spark:
            return _DEFAULT_RULES_CACHE[0][1]
        parsed = parse_psl_rules(PSL_SNAPSHOT)
        df = spark.createDataFrame(
            parsed, "rule_key string, rule_labels int, is_exc int"
        )
        _DEFAULT_RULES_CACHE[:] = [(spark, df)]
        return df
    parsed = parse_psl_rules(rules)
    return spark.createDataFrame(
        parsed, "rule_key string, rule_labels int, is_exc int"
    )


def _candidates(labels: Column, max_l: int) -> Column:
    """All rule keys a host could match: exact label suffixes up to
    ``max_l`` labels plus ``'*.'``-prefixed wildcard forms.  Both
    sequence() calls are guarded against Spark's descending-sequence
    trap (sequence(1, 0) == [1, 0])."""
    k = F.size(labels)
    exact = F.transform(
        F.sequence(F.lit(1), F.least(k, F.lit(max_l))),
        lambda i: F.array_join(F.slice(labels, -i, i), "."),
    )
    wild = F.when(
        (k >= F.lit(2)) & (F.lit(max_l) >= F.lit(2)),
        F.transform(
            F.sequence(F.lit(1), F.least(k - 1, F.lit(max_l - 1))),
            lambda m: F.concat(
                F.lit("*."), F.array_join(F.slice(labels, -m, m), ".")
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(exact, wild)


def host_registrable_map(
    hosts_df: DataFrame,
    host_col: str = "host",
    rules_df: Optional[DataFrame] = None,
    max_rule_labels: Optional[int] = None,
) -> DataFrame:
    """→ ``(host_col, domain)`` for a DISTINCT-host frame: the PSL
    registrable domain per host ('' when the host is itself a public
    suffix, e.g. bare ``co.uk``; also '' for the empty host non-URL
    rows carry).

    Plan shape: in-scan candidate generation (≤ 2·max_l−1 strings per
    host) → explode → BROADCAST hash join against the rules (hint
    legal: bounded by construction) → one max() per host → one narrow
    join back to the host frame.  All shuffles are host-dimension-
    sized, never corpus-sized — callers aggregate the corpus by host
    FIRST (see module docstring)."""
    spark = hosts_df.sparkSession
    custom_rules = rules_df is not None
    if rules_df is None:
        rules_df = psl_rules_df(spark)
    if max_rule_labels is None:
        if custom_rules:
            # derive from the rules ACTUALLY supplied — defaulting from
            # the snapshot silently truncated candidate generation for
            # deeper custom rules (round-13 review fix); the rules
            # table is bounded, so this 1-row agg is free
            max_rule_labels = rules_df.agg(
                F.max("rule_labels")
            ).collect()[0][0]
            if max_rule_labels is None:
                raise ValueError(
                    "host_registrable_map: rules_df is empty; pass "
                    "max_rule_labels or a non-empty rules table"
                )
        else:
            max_rule_labels = _max_rule_labels(parse_psl_rules(PSL_SNAPSHOT))
    labels = F.split(F.col(host_col), r"\.")
    cand = hosts_df.select(
        F.col(host_col),
        F.explode(_candidates(labels, max_rule_labels)).alias("cand"),
    )
    # exception rules trump, then most labels: one portable integer
    best = (
        cand.join(F.broadcast(rules_df), cand.cand == rules_df.rule_key)
        .groupBy(host_col)
        .agg(
            F.max(
                F.col("is_exc") * F.lit(1000) + F.col("rule_labels")
            ).alias("psl_score")
        )
    )
    score = F.col("psl_score")
    ps_n = F.when(score.isNull(), F.lit(1)).otherwise(
        F.when(score >= F.lit(1000), score - F.lit(1001)).otherwise(score)
    )
    k = F.size(labels)
    return (
        hosts_df.join(best, host_col, "left")
        .select(
            F.col(host_col),
            F.when(
                k > ps_n,
                F.array_join(F.slice(labels, -(ps_n + 1), ps_n + 1), "."),
            )
            .otherwise(F.lit(""))
            .alias("domain"),
        )
    )


def psl_rules_values_sql(rules: Optional[Iterable[str]] = None) -> str:
    """The SAME rule table as a DuckDB VALUES body:
    ``('co.uk', 2, 0), ('www.ck', 2, 1), …`` — single source of truth
    with :func:`psl_rules_df`."""
    parsed = parse_psl_rules(rules if rules is not None else PSL_SNAPSHOT)
    return ", ".join(f"('{k}', {n}, {e})" for k, n, e in parsed)


def registrable_sql_ctes(
    hosts_cte: str,
    host_col: str = "host",
    rules: Optional[Iterable[str]] = None,
    prefix: str = "psl",
) -> str:
    """DuckDB CTE chain replaying :func:`host_registrable_map` over
    CTE ``hosts_cte`` (must expose a distinct ``host_col``); the final
    CTE ``{prefix}_map`` has columns ``(host_col, domain)``.  Compose
    as ``WITH …, {this}, … SELECT``."""
    parsed = parse_psl_rules(rules if rules is not None else PSL_SNAPSHOT)
    max_l = _max_rule_labels(parsed)
    values = psl_rules_values_sql(rules)  # single source with psl_rules_df
    h = host_col
    return f"""{prefix}_rules(rule_key, rule_labels, is_exc) AS (VALUES {values}),
{prefix}_hl AS (
  SELECT {h}, string_split({h}, '.') AS labels FROM {hosts_cte}
),
{prefix}_cand AS (
  SELECT {h}, unnest(list_concat(
    list_transform(generate_series(1, least(len(labels), {max_l})),
                   i -> array_to_string(list_slice(labels, -i, -1), '.')),
    CASE WHEN len(labels) >= 2 AND {max_l} >= 2 THEN
      list_transform(generate_series(1, least(len(labels) - 1, {max_l - 1})),
                     m -> '*.' || array_to_string(list_slice(labels, -m, -1), '.'))
    ELSE [] END
  )) AS cand FROM {prefix}_hl
),
{prefix}_best AS (
  SELECT {h}, MAX(is_exc * 1000 + rule_labels) AS psl_score
  FROM {prefix}_cand JOIN {prefix}_rules ON cand = rule_key
  GROUP BY {h}
),
{prefix}_map AS (
  SELECT {h},
         CASE WHEN len(labels) > psn
              THEN array_to_string(list_slice(labels, -(psn + 1), -1), '.')
              ELSE '' END AS domain
  FROM (
    SELECT hl.{h}, hl.labels,
           CASE WHEN b.psl_score IS NULL THEN 1
                WHEN b.psl_score >= 1000 THEN b.psl_score - 1001
                ELSE b.psl_score END AS psn
    FROM {prefix}_hl hl LEFT JOIN {prefix}_best b USING ({h})
  )
)"""
