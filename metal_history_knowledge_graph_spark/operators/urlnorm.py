"""URL canonicalization for crawl dedup.

A crawl sees the same page under many spellings — case-varied hosts,
explicit default ports, tracking query params, fragments, trailing
slashes. Canonicalizing before the url-keyed stages (the chunk stage's
``processed_urls`` seen-set, exact re-crawl dedup via
``temporal.latest_snapshot``, per-domain rollups) is the standard
first pass of every web pipeline (C4/CCNet/RefinedWeb).

Rules applied (in order):

1. scheme and host lowercased (path/query case is preserved —
   paths are case-sensitive, hosts are not)
2. default port stripped (``:80`` for http, ``:443`` for https)
3. fragment dropped
4. tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``)
5. remaining query params sorted bytewise (param order is not
   semantic)
6. one trailing slash stripped from non-root paths; empty path → ``/``

Strings without a ``scheme://`` prefix pass through unchanged (the
caller decides how to treat relative/garbage rows).

Scale shape: a single narrow ``Project`` of regexp/array expressions
in whole-stage codegen — no UDF, no shuffle; at 100 TB it fuses into
the scan that already reads the url column. Every expression is in
the common Java-regex/RE2 subset and avoids replacement
backreferences (``$1`` vs ``\\1`` differ across engines), so the
DuckDB oracle (`__spark_entry__.q_url_canon`) replays the exact
function."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query params dropped before sorting — matched against the full
#: ``key=value`` token (or a bare key).
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
#: anchored: the query starts at the FIRST '?' and only if no '#'
#: precedes it — a '?' inside the fragment is fragment text, not a
#: query ('http://x/p#sec?a=1' has no query).
_QUERY_RE = r"^[^#?]*\?([^#]*)"
#: userinfo = everything up to the LAST '@' of the authority (greedy);
#: it is case-sensitive and must survive the host lowercasing.
_USERINFO_RE = r"^(.*@)"
_HOSTPORT_RE = r"^(?:.*@)?([^@]*)$"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules — one native
    expression tree."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth_raw = F.regexp_extract(url, _AUTHORITY_RE, 1)
    # lowercase the host:port only; preserve userinfo case
    authority = F.concat(
        F.regexp_extract(auth_raw, _USERINFO_RE, 1),
        F.lower(F.regexp_extract(auth_raw, _HOSTPORT_RE, 1)),
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(authority, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(authority, ":443$", ""))
        .otherwise(authority)
    )
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(raw_path) > 1) & raw_path.endswith("/"),
            F.substring(raw_path, F.lit(1), F.length(raw_path) - 1),
        ).otherwise(raw_path)
    )
    params = F.sort_array(
        F.filter(
            F.split(F.regexp_extract(url, _QUERY_RE, 1), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(scheme == "", url).otherwise(
        F.concat(scheme, F.lit("://"), host, path, query)
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Append the canonical form of ``url_col`` as ``out_col``."""
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_dup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl-dedup rollup: canonical url → number of raw spellings
    observed + a deterministic representative (min raw url). One
    partial-agg-friendly aggregation; hot pages collapse map-side."""
    return (
        canonicalize_urls(df, url_col)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct(url_col).alias("n_spellings"),
            F.min(url_col).alias("representative"),
        )
    )


#: embedded public-suffix subset: the high-traffic TWO-LABEL suffixes.
#: The full Mozilla PSL is ~9k rules and updates weekly — in production
#: swap this tuple for a PSL snapshot (it stays a vocabulary-sized CASE
#: expression / broadcast either way). Sorted; shared verbatim with the
#: DuckDB oracle.
PUBLIC_SUFFIXES_2 = (
    "ac.jp", "ac.uk", "co.id", "co.in", "co.jp", "co.kr", "co.nz",
    "co.uk", "co.za", "com.ar", "com.au", "com.br", "com.cn", "com.hk",
    "com.mx", "com.my", "com.sg", "com.tr", "com.tw", "com.ua",
    "com.vn", "edu.au", "gov.au", "gov.uk", "me.uk", "ne.jp", "net.au",
    "net.br", "net.cn", "or.jp", "org.au", "org.br", "org.cn",
    "org.uk",
)

_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def registrable_domain(host: Column) -> Column:
    """eTLD+1 (registrable domain) of a lowercase host: the last THREE
    labels when the trailing two form a listed public suffix
    (``shop.example.co.uk`` → ``example.co.uk``), else the last two
    (``a.b.example.com`` → ``example.com``). IPv4 literals and
    single-label hosts pass through whole; a host that IS a public
    suffix returns itself. This is the key per-domain crawl budgets,
    robots grouping and dedup rollups must use — per-HOST grouping
    splits ``www.example.co.uk`` from ``example.co.uk`` and treats
    every ``*.blogspot``-style subdomain as one site.

    One native expression tree (split + slice + IN-list) in
    whole-stage codegen — no UDF, no join; the suffix list is a
    vocabulary-sized literal set."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, n - 1, 2), ".")
    last3 = F.array_join(F.slice(parts, n - 2, 3), ".")
    is_ps2 = last2.isin(*PUBLIC_SUFFIXES_2)
    return (
        F.when(host.rlike(_IPV4_RE), host)
        .when(n <= 1, host)
        .when(is_ps2 & (n >= 3), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def domain_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registrable-domain rollup of a url table: ``(domain,
    n_urls, n_hosts)`` — the table per-domain crawl budgets and
    politeness quotas key on. One narrow host/domain projection +
    one partial-agg groupBy (count_distinct hosts is per-domain
    bounded)."""
    from metal_history_knowledge_graph_spark.operators.links import _host_of

    h = _host_of(F.col(url_col))
    return (
        df.select(h.alias("_host"))
        .filter(F.col("_host").isNotNull() & (F.length("_host") > 0))
        .select(registrable_domain(F.col("_host")).alias("domain"), "_host")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("_host").alias("n_hosts"),
        )
    )
