"""Markup statistics + gate (operators/markup.py) and per-page link
features (operators/links.link_features): hand-counted fixtures,
gate decisions, and JVM-only plans."""

from metal_history_knowledge_graph_spark.operators.links import (
    extract_links,
    link_features,
)
from metal_history_knowledge_graph_spark.operators.markup import (
    markup_gate,
    markup_stats,
)

ARTICLE = (
    "<html><head><script src='a.js'></script><style>.x{}</style></head>"
    "<body><h1>Title</h1><p>long body text that dominates the bytes of "
    "this page by a wide margin</p><p>more text <a href='/x'>ref</a></p>"
    "</body></html>"
)
LINK_FARM = (
    "<body>" + "".join(f"<a href='/p{i}'>x</a>" for i in range(30)) + "</body>"
)
JS_SHELL = "<html><head><SCRIPT>app()</SCRIPT></head><body></body></html>"


def _pages(spark):
    return spark.createDataFrame(
        [("u1", ARTICLE), ("u2", LINK_FARM), ("u3", JS_SHELL), ("u4", "")],
        "url string, html string",
    )


def test_markup_stats_hand_counts(spark):
    got = {r.url: r for r in markup_stats(_pages(spark)).collect()}
    a = got["u1"]
    assert (a.n_scripts, a.n_styles, a.n_paras, a.n_headings, a.n_links) == \
        (1, 1, 2, 1, 1)
    assert a.html_chars == len(ARTICLE)
    import re

    assert a.text_chars == len(re.sub(r"<[a-zA-Z/][^>]*>", "", ARTICLE))
    assert a.text_permille == a.text_chars * 1000 // a.html_chars
    farm = got["u2"]
    assert farm.n_links == 30 and farm.n_paras == 0
    # case-insensitive tag matching
    assert got["u3"].n_scripts == 1
    # empty page: all zeros, permille 0 (no divide-by-zero)
    assert got["u4"].text_permille == 0 and got["u4"].n_tags == 0


def test_markup_gate_separates_article_from_farm_and_shell(spark):
    kept = {
        r.url: r.keep for r in markup_gate(markup_stats(_pages(spark))).collect()
    }
    assert kept["u1"] is True
    assert kept["u2"] is False  # links dominate tags
    assert kept["u3"] is False  # no visible text share


def test_link_features_splits(spark):
    pages = spark.createDataFrame(
        [(
            "http://a.example/p",
            "<a href='/in1'>i</a><a href='http://a.example/in2'>i</a>"
            "<a href='http://b.example/e1'>e</a><a href='//c.example/e2'>e</a>"
            "<a href='http://b.example/e3'>e</a><a href='mailto:x'>d</a>",
        )],
        "url string, html string",
    )
    r = link_features(extract_links(pages)).collect()[0]
    assert (r.n_links, r.n_resolved, r.n_internal, r.n_external,
            r.n_ext_hosts) == (6, 5, 2, 3, 2)
    assert r.ext_permille == 600  # 3 * 1000 div 5


def test_markup_plans_are_jvm_only(spark):
    for df in (
        markup_gate(markup_stats(_pages(spark))),
        link_features(extract_links(_pages(spark))),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
