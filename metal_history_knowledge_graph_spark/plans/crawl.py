"""Composed crawl-scheduling plan — the crawl-side sibling of
plans/webtext.py's prep chain: one declarative pipeline from raw
discovered hrefs to a polite, robots-compliant fetch batch.

    discovered URLs
      → canonicalize (operators/urlnorm — tracking params, ports,
        case, trailing slash) and collapse duplicate spellings
      → drop already-crawled canonicals (left anti vs the seen set)
      → robots.txt admission (operators/robots — RFC 9309 decision
        for the crawling agent)
      → score host-authority-over-depth (operators/frontier)
      → per-host politeness budget cut (two-phase top-k)

Everything stays one lazy DataFrame chain: canonicalization is a
narrow expression tree, the robots-rule and host-budget joins
broadcast their genuinely vocabulary-sized sides, the seen-set
anti-join is left to Catalyst/AQE (``seen`` is the unbounded crawl
history — broadcast while small, shuffled once it outgrows the
threshold), and the only data-sized shuffles are the canonical-dedup
aggregation, the seen anti-join at scale, and the politeness cut's
two window passes. No stage re-reads the corpus.

Oracle: q_crawl_plan replays the ENTIRE chain in DuckDB — URL
synthesis, the canonicalization rules, duplicate collapse, the seen
anti-join, the exported robots rules' longest-prefix decision, depth
parsing, integer priority, and the budget window — one SQL statement
against the same parquet tables, the composed-plan oracle style of
q_training_export / q_webtext_prep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.frontier import frontier_priorities, schedule_batch
from ..operators.robots import robots_decide
from ..operators.urlnorm import canonicalize_urls


def crawl_schedule(
    candidates: DataFrame,
    robots_rules: DataFrame,
    host_scores: DataFrame,
    seen: DataFrame | None = None,
    agent: str = "*",
    per_host_budget: int = 10,
    host_budgets: DataFrame | None = None,
    url_col: str = "url",
) -> DataFrame:
    """(url, host, depth, priority_fixed, fetch_slot): the next fetch
    batch. ``candidates`` carries raw discovered URLs (any spelling);
    ``seen`` carries already-crawled CANONICAL urls in ``url_col``;
    ``robots_rules`` is operators/robots.parse_robots output;
    ``host_scores`` is (host, rank_fixed) from pagerank/hits over the
    host graph. Output urls are canonical forms; only http(s)
    schemes are schedulable (mailto/js candidates drop here, not in
    the fetcher)."""
    canon = (
        canonicalize_urls(candidates, url_col=url_col)
        .filter(F.col("canonical_url").rlike("^https?://"))
        .select(F.col("canonical_url").alias("url"))
        .distinct()
    )
    if seen is not None:
        # No broadcast hint: ``seen`` is the accumulated crawl history
        # (stream_crawl_scheduler appends every scheduled URL forever),
        # NOT a vocabulary-sized dim — forcing a broadcast here would
        # OOM at Common-Crawl scale. Catalyst/AQE picks broadcast when
        # the set is measurably small and a shuffled anti-join once it
        # grows past the threshold.
        canon = canon.join(
            seen.select(F.col(url_col).alias("url")).distinct(),
            "url",
            "left_anti",
        )
    with_path = canon.select(
        "url",
        F.regexp_extract(F.col("url"), r"^[a-z]+://([^/?#]+)", 1).alias("domain"),
        F.regexp_replace(F.col("url"), r"^[a-z]+://[^/]*", "").alias("path"),
    )
    # robots_decide returns one (domain, path, allowed) row per
    # distinct pair; join the verdicts back to recover the url (an
    # http and an https spelling of the same (domain, path) share one
    # verdict by construction)
    decision = robots_decide(
        with_path.select("domain", "path").distinct(),
        robots_rules,
        agent=agent,
    )
    admitted = (
        with_path.join(
            decision.filter(F.col("allowed")), ["domain", "path"]
        ).select("url")
    )
    return schedule_batch(
        frontier_priorities(admitted, host_scores),
        per_host_budget=per_host_budget,
        host_budgets=host_budgets,
    )
