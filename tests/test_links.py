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


# ---- common-neighbor similarity (cocitation / bibliographic_coupling) ----


def _link_rows(spark):
    # pages p1..p4; hosts x,y,z. x&y co-cited by p1,p2; x&z by p1 only.
    rows = [
        ("http://s1.example/p1", "s1.example", "x.example"),
        ("http://s1.example/p1", "s1.example", "y.example"),
        ("http://s1.example/p1", "s1.example", "z.example"),
        ("http://s2.example/p2", "s2.example", "x.example"),
        ("http://s2.example/p2", "s2.example", "y.example"),
        ("http://s2.example/p3", "s2.example", "z.example"),
        ("http://s3.example/p4", "s3.example", "s3.example"),  # self: dropped
        ("http://s3.example/p4", "s3.example", "x.example"),
    ]
    return spark.createDataFrame(
        rows, "src_url string, src_host string, dst_host string"
    )


def test_cocitation_counts_and_jaccard(spark):
    from metal_history_knowledge_graph_spark.operators.links import cocitation

    got = {
        (r.host_a, r.host_b): (r.n_common, r.jaccard_permille)
        for r in cocitation(_link_rows(spark)).collect()
    }
    # deg: x=3 (p1,p2,p4), y=2 (p1,p2), z=2 (p1,p3)
    assert got[("x.example", "y.example")] == (2, 2 * 1000 // (3 + 2 - 2))
    assert got[("x.example", "z.example")] == (1, 1000 // 4)
    assert got[("y.example", "z.example")] == (1, 1000 // 3)
    assert len(got) == 3


def test_cocitation_min_common_and_fanout_cap(spark):
    from metal_history_knowledge_graph_spark.operators.links import cocitation

    assert {
        (r.host_a, r.host_b)
        for r in cocitation(_link_rows(spark), min_common=2).collect()
    } == {("x.example", "y.example")}
    # cap 2: p1 keeps its 2 smallest hosts (x,y) — z loses p1's citation
    capped = {
        (r.host_a, r.host_b): r.n_common
        for r in cocitation(_link_rows(spark), max_fanout=2).collect()
    }
    assert ("x.example", "z.example") not in capped
    assert capped[("x.example", "y.example")] == 2


def test_bibliographic_coupling_dual(spark):
    from metal_history_knowledge_graph_spark.operators.links import (
        bibliographic_coupling,
    )

    got = {
        (r.host_a, r.host_b): r.n_common
        for r in bibliographic_coupling(_link_rows(spark)).collect()
    }
    # s1 links {x,y,z}, s2 links {x,y,z}, s3 links {x}
    assert got[("s1.example", "s2.example")] == 3
    assert got[("s1.example", "s3.example")] == 1
    assert got[("s2.example", "s3.example")] == 1


def test_butterfly_stats_known_counts(spark):
    from metal_history_knowledge_graph_spark.operators.links import (
        butterfly_stats,
    )

    # pages p1,p2 both link {x,y} -> C(2,2)=1 butterfly; p3 links {x}
    rows = [
        ("http://s.example/p1", "s.example", "x.example"),
        ("http://s.example/p1", "s.example", "y.example"),
        ("http://s.example/p2", "s.example", "x.example"),
        ("http://s.example/p2", "s.example", "y.example"),
        ("http://s.example/p3", "s.example", "x.example"),
    ]
    links = spark.createDataFrame(
        rows, "src_url string, src_host string, dst_host string"
    )
    r = butterfly_stats(links).collect()[0]
    # pairs: (p1,p2) c=2; (p1,p3) c=1; (p2,p3) c=1 -> wedges 4, bfly 1
    assert (r.n_page_pairs, r.n_wedges, r.n_butterflies) == (3, 4, 1)
