"""Composed web-archive ingest plan: gate semantics (noindex pages
contribute nothing, nofollow anchors carry no authority) and a
pure-Python PageRank replay over the hand-built capture set."""

from metal_history_knowledge_graph_spark.operators.graph_algos import (
    PAGERANK_SCALE,
)
from metal_history_knowledge_graph_spark.plans.webarchive import (
    webarchive_host_rank,
)


def _page(url, body, noindex=False, nofollow=False):
    metas = []
    if noindex:
        metas.append('<meta name="robots" content="noindex">')
    if nofollow:
        metas.append('<meta name="robots" content="nofollow">')
    return (url, f"<html><head>{''.join(metas)}</head><body>{body}</body></html>")


def _a(href, rel=None):
    return f'<a rel="{rel}" href="{href}">x</a>' if rel else f'<a href="{href}">x</a>'


def _py_pagerank(edges, n_iters=5, damping=85, scale=PAGERANK_SCALE):
    nodes = sorted({x for p in edges for x in p})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    for _ in range(n_iters):
        c = {v: 0 for v in nodes}
        for s, d in edges:
            c[d] += r[s] // out[s]
        r = {v: (100 - damping) * scale // (100 * n) + damping * c[v] // 100
             for v in nodes}
    return r


def test_gates_and_rank(spark):
    pages = [
        _page("http://a.com/1", _a("http://b.com/x") + _a("http://c.com/x", "nofollow")),
        _page("http://b.com/1", _a("http://c.com/x")),
        _page("http://c.com/1", _a("http://a.com/x")),
        # noindex page: its endorsement of d.com must vanish
        _page("http://a.com/2", _a("http://d.com/x"), noindex=True),
        # page-level nofollow: all anchors discovery-only
        _page("http://b.com/2", _a("http://e.com/x"), nofollow=True),
        # self-host link drops
        _page("http://c.com/2", _a("http://c.com/other")),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    got = {
        r["host"]: r["rank_fixed"]
        for r in webarchive_host_rank(df).collect()
    }
    # surviving host edges: a->b, b->c, c->a only
    want = _py_pagerank([("a.com", "b.com"), ("b.com", "c.com"),
                         ("c.com", "a.com")])
    assert got == want
    assert "d.com" not in got and "e.com" not in got
