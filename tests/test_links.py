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
