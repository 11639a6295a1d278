"""Link extraction + host graph (operators/links.py): both quote
styles, relative/protocol-relative resolution, non-http schemes →
NULL host, port/userinfo stripping, self-link dropping, and a
JVM-only narrow plan."""

from metal_history_knowledge_graph_spark.operators.links import (
    extract_links,
    host_graph,
)

HTML = (
    '<a href="http://B.example/x">abs</a> '
    "<a href='https://c.example:8080/y'>port</a> "
    '<a href="/rel/path">rel</a> '
    '<a href="//cdn.example/l.js">proto-rel</a> '
    '<a href="mailto:a@b.example">mail</a> '
    '<a href="http://user:pw@d.example/z">userinfo</a> '
    '<a href="#frag">frag</a>'
)


def _pages(spark):
    return spark.createDataFrame(
        [("http://a.example/page", HTML)], "url string, html string"
    )


def test_extract_and_resolve(spark):
    rows = {r["href"]: r for r in extract_links(_pages(spark)).collect()}
    assert rows['http://B.example/x']["dst_host"] == "b.example"
    assert rows["https://c.example:8080/y"]["dst_host"] == "c.example"
    assert rows["/rel/path"]["dst_url"] == "http://a.example/rel/path"
    assert rows["/rel/path"]["dst_host"] == "a.example"
    assert rows["//cdn.example/l.js"]["dst_url"] == "http://cdn.example/l.js"
    assert rows["//cdn.example/l.js"]["dst_host"] == "cdn.example"
    assert rows["mailto:a@b.example"]["dst_host"] is None
    assert rows["http://user:pw@d.example/z"]["dst_host"] == "d.example"
    assert rows["#frag"]["dst_host"] is None
    assert all(r["src_host"] == "a.example" for r in rows.values())


def test_host_graph_counts_and_self_drop(spark):
    links = extract_links(_pages(spark))
    g = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(links).collect()
    }
    # /rel/path resolves to a.example -> self link dropped
    assert ("a.example", "a.example") not in g
    assert g[("a.example", "b.example")] == 1
    assert g[("a.example", "cdn.example")] == 1
    with_self = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(links, drop_self=False).collect()
    }
    assert with_self[("a.example", "a.example")] == 1


def test_plan_narrow_jvm_only(spark):
    plan = (
        extract_links(_pages(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


# --- anchor text ---------------------------------------------------------------

ANCHOR_HTML = (
    '<a href="http://b.example/x">Great Band Wiki</a> '
    "<a href='http://b.example/y'>great band</a> "
    '<a href="/nav">my own nav</a> '
    '<a href="http://c.example/z"><b>nested</b> markup</a> '
    '<a href="http://c.example/z2"></a> '
    '<A href="http://d.example/u">UPPER Tag</A> '
    '<a class="x" href="http://e.example/v" rel="nofollow">attrs ok</a> '
    '<a href="mailto:x@y">mail me</a>'
)


def _anchor_pages(spark):
    return spark.createDataFrame(
        [("http://a.example/page", ANCHOR_HTML)], "url string, html string"
    )


def test_extract_anchors_parses_text_and_edge_cases(spark):
    from metal_history_knowledge_graph_spark.operators.links import (
        extract_anchors,
    )

    rows = extract_anchors(_anchor_pages(spark)).collect()
    by_href = {r["href"]: r for r in rows}
    assert by_href["http://b.example/x"]["anchor_text"] == "Great Band Wiki"
    assert by_href["http://b.example/y"]["anchor_text"] == "great band"
    # self link keeps its text; filtering is anchor_terms' job
    assert by_href["/nav"]["dst_host"] == "a.example"
    # nested markup inside the anchor is excluded by construction
    assert "http://c.example/z" not in by_href
    # empty text still parses
    assert by_href["http://c.example/z2"]["anchor_text"] == ""
    # uppercase tag and extra attributes parse
    assert by_href["http://d.example/u"]["anchor_text"] == "UPPER Tag"
    assert by_href["http://e.example/v"]["anchor_text"] == "attrs ok"
    # non-http scheme -> NULL dst_host, text kept
    assert by_href["mailto:x@y"]["dst_host"] is None


def test_anchor_terms_ranks_external_description(spark):
    from metal_history_knowledge_graph_spark.operators.links import (
        anchor_terms,
        extract_anchors,
    )

    out = anchor_terms(extract_anchors(_anchor_pages(spark)), k=2).collect()
    got = {(r["dst_host"], r["rank"]): (r["term"], r["n"]) for r in out}
    # 'band'/'great' appear twice at b.example; ties break by term asc
    assert got[("b.example", 1)] == ("band", 2)
    assert got[("b.example", 2)] == ("great", 2)
    # self navigation labels are dropped
    assert not any(h == "a.example" for h, _ in got)
    # k bound respected
    assert all(r["rank"] <= 2 for r in out)


def test_anchor_plan_is_jvm_only(spark):
    from metal_history_knowledge_graph_spark.operators.links import (
        anchor_terms,
        extract_anchors,
    )

    plan = anchor_terms(extract_anchors(_anchor_pages(spark))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
