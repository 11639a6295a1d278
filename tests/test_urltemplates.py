"""URL template mining (operators/urltemplates.py): generalization
order (UUID > hex > digits > query values), host extraction, rollup
counts, and the top-templates cut."""

from metal_history_knowledge_graph_spark.operators.urltemplates import (
    top_templates,
    url_template_rollup,
)


def _roll(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        (r.host, r.template): (r.n_urls, r.n_distinct, r.example_url)
        for r in url_template_rollup(df).collect()
    }


def test_generalization_order(spark):
    got = _roll(
        spark,
        [
            "http://a.com/item/123",
            "http://a.com/item/456",
            "http://a.com/u/550e8400-e29b-41d4-a716-446655440000",
            "http://a.com/h/deadbeefcafe1234",
            "http://a.com/mixed/2020/abc",
        ],
    )
    assert got[("a.com", "/item/{N}")][0] == 2
    assert ("a.com", "/u/{U}") in got
    assert ("a.com", "/h/{H}") in got
    assert ("a.com", "/mixed/{N}/abc") in got


def test_query_values_and_fragment(spark):
    got = _roll(
        spark,
        [
            "http://b.com/s?q=hello&page=2#top",
            "http://b.com/s?q=world&page=9",
            "http://b.com/s?page=1&q=x",  # different param ORDER = different shape
        ],
    )
    assert got[("b.com", "/s?q={V}&page={V}")][0] == 2
    assert got[("b.com", "/s?page={V}&q={V}")][0] == 1


def test_host_port_case_and_empty_path(spark):
    got = _roll(spark, ["HTTP://C.COM:8080", "http://c.com/"])
    assert got == {("c.com", "/"): (2, 2, "HTTP://C.COM:8080")}


def test_counts_distinct_vs_total(spark):
    got = _roll(
        spark,
        ["http://d.com/p/1", "http://d.com/p/1", "http://d.com/p/2"],
    )
    n_urls, n_distinct, example = got[("d.com", "/p/{N}")]
    assert (n_urls, n_distinct, example) == (3, 2, "http://d.com/p/1")


def test_top_templates_order(spark):
    urls = (
        ["http://e.com/a/%d" % i for i in range(5)]
        + ["http://e.com/b/%d" % i for i in range(3)]
        + ["http://f.com/c"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    top = top_templates(df, k=2).collect()
    assert [(r.host, r.template, r.n_urls) for r in top] == [
        ("e.com", "/a/{N}", 5),
        ("e.com", "/b/{N}", 3),
    ]
