"""Markup-level page statistics — the structural quality signals a
webtext filter reads BEFORE extraction decides anything about the
text: tag density, script/style load, link and paragraph counts, and
the visible-text share of the raw HTML. Boilerplate-heavy chrome,
link farms, and JS-only shells separate from article pages on these
counts alone, which is why CCNet/Gopher-style pipelines gate on them
ahead of the expensive text passes.

All counts are single-pass native regex aggregates inside whole-stage
codegen (``regexp_count``/``regexp_replace`` — no Python, no second
scan); ratios are integer permille (floor-divided), so the DuckDB
oracle (q_markup_stats) replays every value exactly with
``len(regexp_extract_all(...))``.

The text share here is the cheap structural proxy (tag-stripped
length), NOT the byte-identical extraction text — that lives in
functions/html_text.py and is pinned by its own golden tests; a gate
must be computable without running extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: shared with the oracle: a markup tag (open, close, or self-closing)
TAG_PATTERN = r"<[a-zA-Z/][^>]*>"
LINK_PATTERN = r"(?i)<a[\s>]"
SCRIPT_PATTERN = r"(?i)<script[\s>]"
STYLE_PATTERN = r"(?i)<style[\s>]"
PARA_PATTERN = r"(?i)<p[\s>]"
HEADING_PATTERN = r"(?i)<h[1-6][\s>]"


def markup_stats(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, n_tags, n_links, n_scripts, n_styles, n_paras,
    n_headings, html_chars, text_chars, text_permille): one narrow
    projection per page. ``text_permille`` = tag-stripped length ×
    1000 div html length (0 for empty pages)."""
    html = F.col(html_col)
    stripped = F.regexp_replace(html, TAG_PATTERN, "")
    return df.select(
        F.col(url_col).alias("url"),
        F.regexp_count(html, F.lit(TAG_PATTERN)).cast("long").alias("n_tags"),
        F.regexp_count(html, F.lit(LINK_PATTERN)).cast("long").alias("n_links"),
        F.regexp_count(html, F.lit(SCRIPT_PATTERN)).cast("long").alias("n_scripts"),
        F.regexp_count(html, F.lit(STYLE_PATTERN)).cast("long").alias("n_styles"),
        F.regexp_count(html, F.lit(PARA_PATTERN)).cast("long").alias("n_paras"),
        F.regexp_count(html, F.lit(HEADING_PATTERN)).cast("long")
        .alias("n_headings"),
        F.length(html).cast("long").alias("html_chars"),
        F.length(stripped).cast("long").alias("text_chars"),
        F.expr(
            f"(length(regexp_replace({html_col}, '{TAG_PATTERN}', '')) * 1000L)"
            f" div greatest(length({html_col}), 1L)"
        ).cast("long").alias("text_permille"),
    )


def markup_gate(
    stats: DataFrame,
    min_text_permille: int = 250,
    max_link_density_permille: int = 500,
) -> DataFrame:
    """stats + ``keep`` boolean: a page passes when visible text is at
    least ``min_text_permille`` of the raw bytes AND links make up at
    most ``max_link_density_permille`` of its tags (link farms are
    mostly <a> tags). Pure integer comparisons — composes into any
    plan as one narrow Filter when the caller selects ``keep``."""
    link_density = F.expr(
        "(n_links * 1000L) div greatest(n_tags, 1L)"
    )
    return stats.withColumn(
        "keep",
        (F.col("text_permille") >= min_text_permille)
        & (link_density <= max_link_density_permille),
    )
