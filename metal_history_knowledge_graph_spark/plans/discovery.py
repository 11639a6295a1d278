"""Composed sitemap-driven discovery plan: sitemap XML documents →
typed URL rows → the full crawl-admission chain (canonicalize →
seen anti-join → robots decision → priority → per-host politeness
budget).

This is the "what should we fetch next, starting from the sitemaps
the robots probes advertised" pipeline — the discovery-side sibling
of ``plans/crawl.crawl_schedule`` (which starts from raw discovered
hyperlinks). The whole plan stays declarative: parse is a narrow
regex explode (``sources/sitemap``), and everything downstream is the
already-proven crawl chain, so Catalyst sees ONE plan end to end —
filters on the parsed rows push into the sitemap scan, and the
politeness cut keeps its two-phase skew-safe shape.

Scale shape (100 TB): sitemap parse is exchange-free fan-out bounded
by the spec's 50k URLs per file; the chain shuffles only canonical
(url) keys. Reference analogue: the reference crawls a fixed seed
list (``scripts/crawl``); this is the standing web-scale replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.sitemap import parse_sitemaps
from .crawl import crawl_schedule


def discovery_schedule(
    sitemaps: DataFrame,
    robots_rules: DataFrame,
    host_scores: DataFrame,
    seen: DataFrame | None = None,
    agent: str = "*",
    per_host_budget: int = 10,
    host_budgets: DataFrame | None = None,
    xml_col: str = "xml",
    url_col: str = "sitemap_url",
) -> DataFrame:
    """(url, host, depth, priority_fixed, fetch_slot): the next fetch
    batch sourced from sitemap documents. ``sitemaps`` carries one
    row per fetched sitemap body; index children (kind='index') are
    surfaced to the CALLER's fetch loop, not scheduled as page URLs —
    only kind='url' entries enter the chain."""
    candidates = (
        parse_sitemaps(sitemaps, xml_col=xml_col, url_col=url_col)
        .filter(F.col("kind") == "url")
        .select(F.col("loc").alias("url"))
    )
    return crawl_schedule(
        candidates,
        robots_rules,
        host_scores,
        seen=seen,
        agent=agent,
        per_host_budget=per_host_budget,
        host_budgets=host_budgets,
    )
