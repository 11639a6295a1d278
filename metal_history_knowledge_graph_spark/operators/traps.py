"""Crawl-trap detection: per-host URL-space explosion signals.

A crawl trap is a host whose URL space grows without bound while its
content does not — calendar pages that paginate forever, session-id
or tracking-param mints, recursive path aliases (/a/a/a/…), faceted
search grids. At 100 TB frontier scale traps silently eat crawl
budget; the classic countermeasure (Heydon & Najork's Mercator, the
IRLbot "spam mass" line of work) is per-host bookkeeping of how many
distinct URLs map to how few distinct documents, plus URL-shape
heuristics. The reference's crawl side (single-site scraper,
scripts/scrape/*) never needs this — a web-scale engine does.

``crawl_trap_signals`` aggregates one row per host from a crawl log of
(host, url, text):

* ``n_pages`` / ``n_urls`` / ``n_texts`` — rows, distinct URLs,
  distinct content fingerprints (md5 of text).
* ``dup_ppm`` — 10⁶·(n_urls − n_texts)/n_urls floor-clamped at 0: the
  share of the URL space that yielded no new content (the trap smell).
* ``max_depth`` and ``deep_ppm`` — path-segment depth max, and the
  ppm share of distinct URLs deeper than ``deep_threshold``.
* ``param_ppm`` — ppm share of distinct URLs with ≥ ``param_threshold``
  query parameters (faceted-search / session-mint smell).
* ``repseg_ppm`` — ppm share of distinct URLs with a REPEATED path
  segment (size(segs) > size(distinct segs)): the /a/b/a/ alias loop.
  Deliberately not "adjacent-only" — RE2 engines (DuckDB) have no
  backreferences, and non-adjacent repetition is a trap smell too.
* ``calendar_ppm`` — ppm share of distinct URLs containing a
  /YYYY/MM/ date-path component (infinite-calendar smell).
* ``is_trap`` — the gate: high dup share on a non-trivial URL space,
  or a dominant repeated-segment/calendar shape. Thresholds are
  explicit keyword args; the defaults encode "more than half the URL
  space is redundant or loop-shaped".

All shares are exact BIGINT ppm floor-divides over DISTINCT URLs (URL-
shape signals are URL-space properties; page-level recounts would let
one hot page swamp the shape statistics). Scale shape: one narrow
Project for per-URL flags, a distinct + one host-keyed partial agg, a
second host-keyed agg for the content fingerprints, and a host-sized
(vocabulary) join — no windows, no UDFs, whole-stage-codegen end to
end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAL_RE = r"/(19|20)[0-9]{2}/[0-9]{1,2}(/|$)"


def _path_segs(url: F.Column) -> F.Column:
    """Path segments of ``url`` (scheme+authority stripped, query and
    fragment dropped, empty segments removed)."""
    path = F.regexp_replace(
        F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
        r"[?#].*$",
        "",
    )
    return F.filter(F.split(path, "/"), lambda s: s != F.lit(""))


def _query_param_count(url: F.Column) -> F.Column:
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    return F.size(F.filter(F.split(q, "&"), lambda s: s != F.lit("")))


def crawl_trap_signals(
    crawl: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    text_col: str = "text",
    deep_threshold: int = 6,
    param_threshold: int = 3,
    dup_gate_ppm: int = 500_000,
    shape_gate_ppm: int = 500_000,
    min_urls: int = 20,
) -> DataFrame:
    """One row per host: URL-space trap signals + the ``is_trap`` gate.

    See module docstring. Hosts below ``min_urls`` distinct URLs are
    never flagged (small hosts can't evidence explosion).
    """
    host = F.col(host_col)
    url = F.col(url_col)

    per_url = (
        crawl.select(host.alias("host"), url.alias("url"))
        .distinct()
        .select(
            "host",
            "url",
            F.size(_path_segs(F.col("url"))).cast("long").alias("depth"),
            (_query_param_count(F.col("url")) >= param_threshold)
            .cast("long")
            .alias("param_heavy"),
            (
                F.size(_path_segs(F.col("url")))
                > F.size(F.array_distinct(_path_segs(F.col("url"))))
            )
            .cast("long")
            .alias("rep_seg"),
            F.col("url").rlike(_CAL_RE).cast("long").alias("calendar"),
        )
    )
    url_stats = per_url.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.max("depth").cast("long").alias("max_depth"),
        F.sum((F.col("depth") > deep_threshold).cast("long"))
        .cast("long")
        .alias("n_deep"),
        F.sum("param_heavy").cast("long").alias("n_param"),
        F.sum("rep_seg").cast("long").alias("n_repseg"),
        F.sum("calendar").cast("long").alias("n_calendar"),
    )
    content_stats = crawl.groupBy(host.alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.countDistinct(F.md5(F.col(text_col))).cast("long").alias("n_texts"),
    )

    # exact BIGINT ppm (the textstats `div` convention — no doubles)
    sig = (
        url_stats.join(content_stats, "host")
        .withColumn(
            "dup_ppm",
            F.expr(
                "(1000000 * greatest(0, n_urls - n_texts)) div n_urls"
            ).cast("long"),
        )
        .withColumn(
            "deep_ppm", F.expr("(1000000 * n_deep) div n_urls").cast("long")
        )
        .withColumn(
            "param_ppm", F.expr("(1000000 * n_param) div n_urls").cast("long")
        )
        .withColumn(
            "repseg_ppm",
            F.expr("(1000000 * n_repseg) div n_urls").cast("long"),
        )
        .withColumn(
            "calendar_ppm",
            F.expr("(1000000 * n_calendar) div n_urls").cast("long"),
        )
    )
    big = F.col("n_urls") >= min_urls
    return sig.select(
        "host",
        "n_pages",
        "n_urls",
        "n_texts",
        "max_depth",
        "dup_ppm",
        "deep_ppm",
        "param_ppm",
        "repseg_ppm",
        "calendar_ppm",
        (
            (big & (F.col("dup_ppm") >= dup_gate_ppm))
            | (big & (F.col("repseg_ppm") >= shape_gate_ppm))
            | (big & (F.col("calendar_ppm") >= shape_gate_ppm))
        ).alias("is_trap"),
    )


def trap_filtered_frontier(
    candidates: DataFrame,
    signals: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Drop frontier candidates whose host is trap-flagged — the
    composition point with frontier scheduling: signals are a
    host-vocabulary dim, so this is one broadcastable anti-join."""
    traps = signals.filter(F.col("is_trap")).select(
        F.col("host").alias(host_col)
    )
    return candidates.join(F.broadcast(traps), host_col, "left_anti")
