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

from pyspark.sql import Column, DataFrame, Window
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
    dst = _resolve_dst(F.col("href"), F.col("src_host"))
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


#: a complete anchor element with an href and flat (tag-free) text —
#: group 0 is the whole tag, re-parsed per-tag for href and text.
#: Shared verbatim with the DuckDB oracle (RE2-safe subset).
ANCHOR_TAG_PATTERN = (
    r"""<[aA]\s[^>]*href=["'][^"'<>\s]+["'][^>]*>([^<]*)</[aA]>"""
)

#: anchor-text terms: lowercase word runs (letters/digits), the same
#: tokenization the BM25/vocab family uses.
ANCHOR_TOKEN_PATTERN = r"[a-z0-9]+"


def _resolve_dst(href: Column, src_host: Column) -> Column:
    """Protocol-relative and root-relative hrefs resolved against the
    source host (the same rule extract_links applies)."""
    return (
        F.when(href.startswith("//"), F.concat(F.lit("http:"), href))
        .when(href.startswith("/"),
              F.concat(F.lit("http://"), src_host, href))
        .otherwise(href)
    )


def extract_anchors(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_host, dst_host, anchor_text): every ``<a href=…>text</a>``
    element with its flat anchor text — the description OTHER pages
    give a host, the classic web-search relevance signal (anchor text
    describes the target better than the target's own boilerplate)
    and a cheap entity-alias source for linking.

    Two narrow regex passes, no Python: ``regexp_extract_all`` pulls
    whole anchor elements (one explode), then per-element
    ``regexp_extract`` splits href and text — Spark's extract_all
    returns a single group, so nested capture of (href, text) in one
    pass is not expressible; two JVM regex ops on an already-exploded
    short string cost less than any UDF detour. Nested markup inside
    the anchor is excluded by construction (``[^<]*``) — honest
    limitation, documented: bolded link text is not captured.
    """
    src_host = _host_of(F.col(url_col))
    tags = df.select(
        F.col(url_col).alias("src_url"),
        src_host.alias("src_host"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_TAG_PATTERN), 0)
        ).alias("tag"),
    )
    href = F.regexp_extract(F.col("tag"), HREF_PATTERN, 1)
    text = F.regexp_extract(F.col("tag"), ANCHOR_TAG_PATTERN, 1)
    dst = _resolve_dst(href, F.col("src_host"))
    return tags.select(
        "src_url", "src_host",
        href.alias("href"),
        _host_of(dst).alias("dst_host"),
        text.alias("anchor_text"),
    )


def anchor_terms(
    anchors: DataFrame,
    k: int = 5,
    drop_self: bool = True,
) -> DataFrame:
    """(dst_host, term, n, rank): the top-``k`` anchor-text terms
    pointing AT each host — what the rest of the web calls it.
    Tokenization is ANCHOR_TOKEN_PATTERN runs of lowercased text;
    ``drop_self`` removes a host's own navigation labels so the
    profile reflects external description.

    Scale shape: one narrow explode of the (already link-sized)
    anchor table, one partial-agg groupBy on (dst_host, term), one
    window rank partitioned by dst_host — term-vocabulary-sized
    output, no global ordering anywhere. The hot-host skew case
    (millions of in-links to one host) is exactly what the
    partial-agg count absorbs: map-side combine collapses each
    partition's (host, term) repeats before the shuffle."""
    from pyspark.sql import Window

    a = anchors.filter(F.col("dst_host").isNotNull())
    if drop_self:
        a = a.filter(
            F.col("src_host").isNull()
            | (F.col("src_host") != F.col("dst_host"))
        )
    terms = a.select(
        "dst_host",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("anchor_text")), F.lit(ANCHOR_TOKEN_PATTERN), 0
            )
        ).alias("term"),
    )
    counted = terms.groupBy("dst_host", "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("dst_host").orderBy(F.desc("n"), "term")
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def link_features(links: DataFrame) -> DataFrame:
    """(src_url, n_links, n_resolved, n_internal, n_external,
    n_ext_hosts, ext_permille): per-PAGE outlink profile from the
    extract_links table — the URL-level quality/spam signal next to
    the host-level graph (a page whose links are 95% external
    cross-host is a link farm; one with zero external links is a
    navigation leaf). ``ext_permille`` = external ÷ resolved links in
    integer permille (0 when nothing resolves).

    One partial-agg groupBy on src_url; conditional counts fold
    map-side, distinct host counting is the only expanded state and
    it is bounded by the page's own link count."""
    ext = F.col("dst_host").isNotNull() & (
        F.col("dst_host") != F.col("src_host")
    )
    inte = F.col("dst_host").isNotNull() & (
        F.col("dst_host") == F.col("src_host")
    )
    return (
        links.groupBy("src_url")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.sum(F.col("dst_host").isNotNull().cast("long")).alias("n_resolved"),
            F.sum(inte.cast("long")).alias("n_internal"),
            F.sum(ext.cast("long")).alias("n_external"),
            F.countDistinct(
                F.when(ext, F.col("dst_host"))
            ).cast("long").alias("n_ext_hosts"),
        )
        .withColumn(
            "ext_permille",
            F.expr("(n_external * 1000L) div greatest(n_resolved, 1L)"),
        )
    )


def common_neighbor_pairs(
    items: DataFrame,
    key_col: str,
    item_col: str,
    min_common: int = 1,
    max_fanout: int | None = None,
) -> DataFrame:
    """Pairs of items sharing keys — the shared kernel of co-citation
    (items = linked hosts, keys = citing pages) and bibliographic
    coupling (items = citing hosts, keys = shared link targets).
    Returns ``(item_a, item_b, n_common, jaccard_permille)`` with
    item_a < item_b, n_common = |keys(a) ∩ keys(b)| and the integer-‰
    Jaccard ``1000·c div (deg_a + deg_b − c)`` over the (capped)
    per-item key degrees — all-BIGINT, cross-engine exact.

    Scale shape: the pair explosion is Σ_k C(d_k, 2) over per-key
    fanouts d_k — quadratic in hub pages, which is why ``max_fanout``
    exists: it caps each key's item list at F (deterministic — the F
    smallest items, a window PARTITIONED by key over the already
    key-deduplicated list), bounding the blowup at Σ min(d_k, F)²/2
    exactly the way WebGraph/Spark co-citation jobs do in practice.
    Degrees are computed AFTER the cap so the Jaccard stays consistent
    with the pair counts. One self-join on the key (hash shuffle),
    partial-agg count; min_common prunes the long tail before the
    degree joins.
    """
    it = items.select(
        F.col(key_col).alias("_k"), F.col(item_col).alias("_i")
    ).distinct()
    if max_fanout is not None:
        w = Window.partitionBy("_k").orderBy("_i")
        it = (
            it.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_fanout)
            .drop("_rn")
        )
    a, b = it.alias("a"), it.alias("b")
    pairs = (
        a.join(b, F.col("a._k") == F.col("b._k"))
        .filter(F.col("a._i") < F.col("b._i"))
        .groupBy(
            F.col("a._i").alias("item_a"), F.col("b._i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    deg = it.groupBy("_i").agg(F.count(F.lit(1)).alias("_d"))
    return (
        pairs.join(deg.withColumnRenamed("_i", "item_a"), "item_a")
        .withColumnRenamed("_d", "_da")
        .join(deg.withColumnRenamed("_i", "item_b"), "item_b")
        .withColumnRenamed("_d", "_db")
        .select(
            "item_a",
            "item_b",
            "n_common",
            F.expr("CAST(n_common * 1000L div (_da + _db - n_common) AS BIGINT)")
            .alias("jaccard_permille"),
        )
    )


def cocitation(
    links: DataFrame, min_common: int = 1, max_fanout: int | None = None
) -> DataFrame:
    """Host co-citation (Small 1973, the classic web-graph relatedness
    signal): hosts a and b are similar when many PAGES link to both.
    Input is the :func:`extract_links` output; self-links (dst_host =
    src_host) are dropped the way :func:`host_graph` drops them.
    Output columns renamed (host_a, host_b, n_common,
    jaccard_permille)."""
    it = links.filter(
        F.col("dst_host").isNotNull()
        & F.col("src_host").isNotNull()
        & (F.col("dst_host") != F.col("src_host"))
    )
    out = common_neighbor_pairs(
        it, "src_url", "dst_host", min_common=min_common,
        max_fanout=max_fanout,
    )
    return out.withColumnRenamed("item_a", "host_a").withColumnRenamed(
        "item_b", "host_b"
    )


def bibliographic_coupling(
    links: DataFrame, min_common: int = 1, max_fanout: int | None = None
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963): source hosts a and b are
    similar when they link OUT to many of the same destination hosts —
    the dual of :func:`cocitation` (key and item swapped: keys are
    destination hosts, items are the citing source hosts)."""
    it = links.filter(
        F.col("dst_host").isNotNull()
        & F.col("src_host").isNotNull()
        & (F.col("dst_host") != F.col("src_host"))
    )
    out = common_neighbor_pairs(
        it, "dst_host", "src_host", min_common=min_common,
        max_fanout=max_fanout,
    )
    return out.withColumnRenamed("item_a", "host_a").withColumnRenamed(
        "item_b", "host_b"
    )


def butterfly_stats(
    links: DataFrame, max_fanout: int | None = None
) -> DataFrame:
    """Bipartite butterfly (2×2 biclique) census over the page→host
    link graph — the bipartite analogue of triangle counting (Wang et
    al. VLDB 2019 "Vertex priority based butterfly counting"): a
    butterfly is two pages both linking to the same two hosts, the
    motif that makes link farms / template networks visible long
    before PageRank moves. Butterflies = Σ over page pairs
    C(common_hosts, 2), computed from the :func:`common_neighbor_pairs`
    kernel (key = dst_host, item = src_url) — wedges group by host, so
    the hub-host explosion is bounded by the same ``max_fanout`` cap.

    Output: one row ``(n_page_pairs, n_wedges, n_butterflies)`` —
    page pairs sharing ≥1 host, total wedge count Σ common, and the
    butterfly total. All integer aggregates of the pair table
    (vocabulary-sized after the cap), partial-agg friendly."""
    it = links.filter(
        F.col("dst_host").isNotNull()
        & F.col("src_host").isNotNull()
        & (F.col("dst_host") != F.col("src_host"))
    )
    pairs = common_neighbor_pairs(
        it, "dst_host", "src_url", min_common=1, max_fanout=max_fanout
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_page_pairs"),
        F.sum("n_common").cast("long").alias("n_wedges"),
        F.sum(
            F.expr("n_common * (n_common - 1) div 2")
        ).cast("long").alias("n_butterflies"),
    )
