"""Composed web-archive ingest plan: raw captured HTML → directive
gates → endorsed host link graph → host authority ranks, in one
declarative chain — the read-side composition that turns the
page-level operators (operators/pagemeta) and the spectral family
(operators/graph_algos) into the table a crawl planner actually
consumes ("which hosts matter, honoring what publishers declared").

Chain (every stage an existing, independently-oracled operator):

  1. ``robots_directives`` — pages declaring ``noindex`` contribute
     NOTHING (their outlinks vanish with them: a page we may not
     index is a page whose endorsements we do not count);
  2. ``anchors_with_rel`` — anchors flagged nofollow/ugc/sponsored
     (or on a page-level-nofollow page) are discovery-only edges and
     are dropped from the authority flow;
  3. host projection (links._host_of, both endpoints), self-links
     dropped, distinct — the host graph;
  4. fixed-point integer :func:`graph_algos.pagerank`.

Scale shape: stages 1-3 are the narrow tag/attribute regex passes of
their operators plus ONE distinct on (src_host, dst_host) — a
vocabulary-sized output; stage 4 is the proven iterative kernel. The
whole chain replays as ONE DuckDB statement (q_webarchive_rank): the
pagemeta CTEs feed an edges CTE that parameterizes the shared
_pagerank_oracle body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.graph_algos import pagerank
from ..operators.links import _host_of
from ..operators.pagemeta import anchors_with_rel, robots_directives


def webarchive_host_rank(
    pages: DataFrame,
    n_iters: int = 5,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """(host, rank_fixed): PageRank over the directive-gated host
    graph of a page capture table."""
    d = robots_directives(pages, html_col, url_col)
    anchors = anchors_with_rel(pages, html_col, url_col)
    indexable = d.filter(~F.col("noindex")).select("url")
    endorsed = anchors.filter(~F.col("nofollow")).join(indexable, "url")
    edges = (
        endorsed.select(
            _host_of(F.col("url")).alias("src"),
            _host_of(F.col("href")).alias("dst"),
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    ranks = pagerank(
        edges.select(
            F.col("src").alias("subj_id"), F.col("dst").alias("obj_id")
        ),
        n_iters=n_iters,
    )
    return ranks.select(F.col("node_id").alias("host"), "rank_fixed")
