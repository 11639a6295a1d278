"""Composed sitemap-driven discovery plan (plans/discovery): the
sitemap front-end feeds the crawl chain end to end — index children
are not scheduled, robots denial applies to parsed locs, seen URLs
drop, and the politeness budget caps each host."""

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.robots import parse_robots
from metal_history_knowledge_graph_spark.plans.discovery import (
    discovery_schedule,
)

XML = (
    "<urlset>"
    "<url><loc>http://h.example/a</loc></url>"
    "<url><loc>http://h.example/b/</loc></url>"          # canonicalizes
    "<url><loc>HTTP://h.example:80/c?utm_source=x</loc></url>"
    "<url><loc>http://h.example/blocked/1</loc></url>"   # robots-denied
    "<url><loc>http://h.example/seen</loc></url>"        # already crawled
    "<url><loc>http://h.example/d</loc></url>"
    "<url><loc>http://h.example/e</loc></url>"
    "</urlset>"
    "<sitemapindex><sitemap>"
    "<loc>http://h.example/child.xml</loc>"               # never scheduled
    "</sitemap></sitemapindex>"
)


def test_discovery_end_to_end(spark):
    sitemaps = spark.createDataFrame(
        [("http://h.example/sitemap.xml", XML)],
        "sitemap_url string, xml string",
    )
    rules = parse_robots(
        spark.createDataFrame(
            [("h.example", "User-agent: *\nDisallow: /blocked/\n")],
            "domain string, robots_txt string",
        )
    )
    scores = spark.createDataFrame(
        [("h.example", 1_000_000)], "host string, rank_fixed long"
    )
    seen = spark.createDataFrame([("http://h.example/seen",)], "url string")
    out = discovery_schedule(
        sitemaps, rules, scores, seen=seen, per_host_budget=4
    )
    urls = sorted(r["url"] for r in out.collect())
    # 5 admitted candidates (a, b, c, d, e) cut to budget 4 by
    # (priority desc, url): depth-1 urls share priority → url ASC
    assert len(urls) == 4
    assert "http://h.example/blocked/1" not in urls
    assert "http://h.example/seen" not in urls
    assert "http://h.example/child.xml" not in urls
    assert "http://h.example/b" in urls          # trailing slash stripped
    assert "http://h.example/c" in urls          # port + utm stripped


def test_discovery_is_one_declarative_plan(spark):
    """The composition must stay lazy — one optimized plan, no
    intermediate actions (sitemap parse fuses into the chain)."""
    sitemaps = spark.createDataFrame(
        [("http://h.example/sitemap.xml", XML)],
        "sitemap_url string, xml string",
    )
    rules = parse_robots(
        spark.createDataFrame(
            [("h.example", "User-agent: *\nDisallow: /blocked/\n")],
            "domain string, robots_txt string",
        )
    )
    scores = spark.createDataFrame(
        [("h.example", 1_000_000)], "host string, rank_fixed long"
    )
    plan = discovery_schedule(sitemaps, rules, scores)._jdf \
        .queryExecution().optimizedPlan().toString()
    # the sitemap regex extraction appears inside the SAME plan tree
    # as the politeness window — nothing was materialized in between
    assert "regexp_extract_all" in plan
    assert "row_number" in plan or "windowExpressions" in plan.lower()
