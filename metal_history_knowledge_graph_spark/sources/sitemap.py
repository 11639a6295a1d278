"""Sitemap XML source — parse sitemaps.org ``urlset`` and
``sitemapindex`` documents into typed URL rows, the discovery-side
companion of the robots.txt admission filter and the crawl frontier
(robots says MAY-fetch, sitemaps say SHOULD-fetch-and-how-often).

Everything is native column work (the ``links.py`` pattern): one
``regexp_extract_all`` pulls the ``<url>``/``<sitemap>`` blocks, one
``regexp_extract`` per field reads ``loc`` / ``lastmod`` /
``changefreq`` / ``priority`` out of each block. The patterns use
``[\\s\\S]*?`` instead of dot-matches-newline flags and avoid
lookarounds, so they run identically under Spark's Java regex and
DuckDB's RE2 — the oracle replays the parse end to end.

``priority`` is surfaced in integer permille (``'0.8'`` → 800):
sitemap priorities have at most one fractional digit by convention
and the frontier's ordering arithmetic stays BIGINT (the repo-wide
fixed-point rule). Malformed or absent priorities fall to the
spec default 0.5 → 500.

Scale shape (100 TB): the block explode is a narrow per-document
fan-out (bounded by the spec's 50k URLs per sitemap); no shuffle at
all until the caller aggregates — parse output feeds
``frontier.schedule_batch`` / ``recrawl`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: one <url>…</url> (or <sitemap>…</sitemap>) block, non-greedy.
URL_BLOCK = r"<url>([\s\S]*?)</url>"
SITEMAP_BLOCK = r"<sitemap>([\s\S]*?)</sitemap>"
#: per-field readers over a block.
LOC = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"
LASTMOD = r"<lastmod>\s*([^<]*?)\s*</lastmod>"
CHANGEFREQ = r"<changefreq>\s*([^<]*?)\s*</changefreq>"
PRIORITY = r"<priority>\s*([0-9.]+)\s*</priority>"

#: spec default priority (0.5) in permille.
DEFAULT_PRIORITY_PERMILLE = 500


def _field(block, pattern):
    """regexp_extract returning NULL (not '') on no-match."""
    v = F.regexp_extract(block, pattern, 1)
    return F.when(v == "", None).otherwise(v)


def _priority_permille(block):
    """'0.8' → 800; absent/malformed → the spec default 500.

    Permille = round(priority · 1000) via DECIMAL(4,3) cast — exact
    for the ≤3-fractional-digit values sitemaps carry, no float."""
    raw = F.regexp_extract(block, PRIORITY, 1)
    dec = F.when(raw != "", raw).otherwise(None).cast("decimal(4,3)")
    return (
        F.coalesce((dec * 1000).cast("long"),
                   F.lit(DEFAULT_PRIORITY_PERMILLE))
    )


def parse_sitemaps(
    df: DataFrame, xml_col: str = "xml", url_col: str = "sitemap_url"
) -> DataFrame:
    """(sitemap_url, kind, loc, lastmod, changefreq,
    priority_permille) — one row per ``<url>`` entry (kind='url') and
    per ``<sitemapindex>`` child (kind='index', lastmod only).
    Entries without a ``<loc>`` are dropped (the spec requires one)."""
    urls = (
        df.select(
            F.col(url_col).alias("sitemap_url"),
            F.explode(
                F.regexp_extract_all(F.col(xml_col), F.lit(URL_BLOCK), 1)
            ).alias("_b"),
        )
        .select(
            "sitemap_url",
            F.lit("url").alias("kind"),
            _field(F.col("_b"), LOC).alias("loc"),
            _field(F.col("_b"), LASTMOD).alias("lastmod"),
            _field(F.col("_b"), CHANGEFREQ).alias("changefreq"),
            _priority_permille(F.col("_b")).alias("priority_permille"),
        )
    )
    children = (
        df.select(
            F.col(url_col).alias("sitemap_url"),
            F.explode(
                F.regexp_extract_all(F.col(xml_col), F.lit(SITEMAP_BLOCK), 1)
            ).alias("_b"),
        )
        .select(
            "sitemap_url",
            F.lit("index").alias("kind"),
            _field(F.col("_b"), LOC).alias("loc"),
            _field(F.col("_b"), LASTMOD).alias("lastmod"),
            F.lit(None).cast("string").alias("changefreq"),
            F.lit(None).cast("long").alias("priority_permille"),
        )
    )
    return urls.unionByName(children).filter(F.col("loc").isNotNull())
