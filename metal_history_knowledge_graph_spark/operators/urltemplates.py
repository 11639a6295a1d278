"""URL template mining — generalize each URL's path+query into a
shape template (digit runs → ``{N}``, long hex runs → ``{H}``, UUIDs →
``{U}``, query values → ``{V}``) and roll up per (host, template).
This is how crawl planners read a site's URL space: a handful of
templates covering millions of URLs (``/article/{N}``,
``/tag/{V}/page/{N}``) tell the scheduler what is enumerable content
versus parameter noise, feed per-template recrawl policies, and give
trap detection (operators/traps.py) a human-readable counterpart —
IRLbot/Mercator-era bookkeeping, not in the single-site reference
(beyond-reference crawl tier, SURVEY §6).

All transformation is a fixed chain of native ``regexp_replace``
calls (RE2-safe patterns — no backreference *matching*, only
replacement groups) so the whole operator is one narrow whole-stage-
codegen projection; the rollup is a single partial-aggregated
group-by on (host, template). A DuckDB oracle replays the same chain.

Generalization order matters and is part of the contract: UUID before
hex (a UUID's groups would otherwise be eaten piecemeal), hex before
digits (digit runs are hex runs), query values last (a ``{N}``
already inside a value is still collapsed to ``{V}``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UUID = "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
_HEX = "[0-9a-fA-F]{8,}"
_NUM = "[0-9]+"


def url_host(url: Column) -> Column:
    """Host of ``url`` (lowercased, port dropped); NULL when no
    authority is present."""
    h = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    h = F.regexp_replace(h, r":[0-9]+$", "")
    return F.when(F.length(h) > 0, h)


def url_template(url: Column) -> Column:
    """The shape template of ``url``'s path+query: ``{U}``/``{H}``/
    ``{N}`` substitutions on the path, then every query value →
    ``{V}`` (param names and order preserved — they ARE the shape).
    Fragments are dropped; an empty path becomes ``/``."""
    rest = F.regexp_replace(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""
    )
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.when(F.length(rest) == 0, F.lit("/")).otherwise(rest)
    rest = F.regexp_replace(rest, _UUID, "{U}")
    rest = F.regexp_replace(rest, _HEX, "{H}")
    rest = F.regexp_replace(rest, _NUM, "{N}")
    # query values: '=...' up to the next '&' or end; names stay
    return F.regexp_replace(rest, r"=[^&]*", "={V}")


def url_template_rollup(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per (host, template): ``n_urls`` (total rows), ``n_distinct``
    (distinct URLs) and the lexicographically-first ``example_url``.
    One partial-aggregated group-by; host+template are both
    vocabulary-sized outputs at web scale."""
    u = F.col(url_col)
    rows = df.filter(u.isNotNull()).select(
        url_host(u).alias("host"),
        url_template(u).alias("template"),
        u.alias("_url"),
    )
    return (
        rows.filter(F.col("host").isNotNull())
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("_url").alias("n_distinct"),
            F.min("_url").alias("example_url"),
        )
    )


def top_templates(
    df: DataFrame, url_col: str = "url", k: int = 20
) -> DataFrame:
    """The ``k`` highest-coverage templates corpus-wide, ties broken
    by (host, template) — a TakeOrdered over the vocabulary-sized
    rollup, never over URLs."""
    return (
        url_template_rollup(df, url_col)
        .orderBy(F.desc("n_urls"), "host", "template")
        .limit(k)
    )
