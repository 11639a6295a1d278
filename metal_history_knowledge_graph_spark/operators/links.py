"""Hyperlink extraction and the host-level link graph — the bridge
from the webtext family to the graph family: crawled HTML → href
edges → (src_host, dst_host) multigraph → feed
``graph_algos.pagerank`` / ``core_numbers`` for host authority and
spam-farm structure, the signals crawl prioritization and corpus
quality weighting consume.

Everything is native column work: ``regexp_extract_all`` pulls
href values (both quote styles), relative links resolve against the
page host, hosts lowercase, and the host graph is one partial-agg
groupBy — the corpus is touched once, the output is
host-vocabulary-sized. No Python anywhere (plan-gated in
test_links).

Oracle: q_host_graph replays extraction → resolution → host
normalization → aggregation in DuckDB over the same deterministic
HTML (regexp_extract_all exists in both engines; the pattern is
shared via HREF_PATTERN so it cannot drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: href values in single or double quotes; captures the URL only.
#: Shared verbatim with the DuckDB oracle (same regex dialect subset:
#: no lookbehind, no named groups).
HREF_PATTERN = r"""href=["']([^"'<>\s]+)["']"""


def _host_of(url: Column) -> Column:
    """Lowercased host of an absolute http(s) URL (port and userinfo
    stripped); NULL for anything else."""
    h = F.regexp_extract(url, r"^[hH][tT][tT][pP][sS]?://([^/?#]+)", 1)
    # strip userinfo, then port
    h = F.regexp_replace(h, r"^.*@", "")
    h = F.regexp_replace(h, r":\d+$", "")
    return F.when(F.length(h) > 0, F.lower(h))


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_url, href, dst_url, dst_host): every href in the page,
    with protocol-relative (``//h/p``) and root-relative (``/p``)
    links resolved against the source host; fragments/mailto/js and
    other non-http(p) schemes yield NULL dst_host and are kept (the
    caller decides whether dead schemes matter). One narrow
    explode."""
    src_host = _host_of(F.col(url_col))
    links = df.select(
        F.col(url_col).alias("src_url"),
        src_host.alias("src_host"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_PATTERN), 1)
        ).alias("href"),
    )
    dst = (
        F.when(
            F.col("href").startswith("//"),
            F.concat(F.lit("http:"), F.col("href")),
        )
        .when(
            F.col("href").startswith("/"),
            F.concat(F.lit("http://"), F.col("src_host"), F.col("href")),
        )
        .otherwise(F.col("href"))
    )
    return links.select(
        "src_url", "src_host", "href",
        dst.alias("dst_url"),
        _host_of(dst).alias("dst_host"),
    )


def host_graph(links: DataFrame, drop_self: bool = True) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level multigraph
    edge list with counts; ``drop_self`` removes intra-host links
    (navigation chrome dominates them). Host-vocabulary-sized output,
    one partial-agg shuffle. Feed (src_host → dst_host) into
    graph_algos.pagerank/core_numbers for authority/structure."""
    e = links.filter(F.col("dst_host").isNotNull()
                     & F.col("src_host").isNotNull())
    if drop_self:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return (
        e.groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
