"""Sitemap XML source (sources/sitemap): field extraction, spec
defaults, whitespace trimming, entries-without-loc dropped, index
children, malformed-priority fallback, and the narrow no-shuffle
parse plan."""

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.sources.sitemap import (
    DEFAULT_PRIORITY_PERMILLE,
    parse_sitemaps,
)

FULL = """<?xml version="1.0"?>
<urlset>
  <url>
    <loc> https://a.com/p1 </loc>
    <lastmod>2024-03-04</lastmod>
    <changefreq>weekly</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.com/p2</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://a.com/p3</loc><priority>junk</priority></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://a.com/s1.xml</loc><lastmod>2024-02-02</lastmod></sitemap>
  <sitemap><loc>https://a.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def _df(spark):
    return spark.createDataFrame(
        [("https://a.com/sitemap.xml", FULL),
         ("https://a.com/sitemap_index.xml", INDEX)],
        "sitemap_url string, xml string",
    )


def test_url_entries(spark):
    rows = {
        r["loc"]: r
        for r in parse_sitemaps(_df(spark)).filter(
            F.col("kind") == "url").collect()
    }
    # whitespace inside <loc> is trimmed
    full = rows["https://a.com/p1"]
    assert full["lastmod"] == "2024-03-04"
    assert full["changefreq"] == "weekly"
    assert full["priority_permille"] == 800
    # minimal entry: absent fields are NULL, priority falls to 500
    minimal = rows["https://a.com/p2"]
    assert minimal["lastmod"] is None and minimal["changefreq"] is None
    assert minimal["priority_permille"] == DEFAULT_PRIORITY_PERMILLE
    # malformed priority ('junk' never matches [0-9.]+) → default
    assert rows["https://a.com/p3"]["priority_permille"] == \
        DEFAULT_PRIORITY_PERMILLE
    # the loc-less entry was dropped
    assert len(rows) == 3


def test_index_entries(spark):
    rows = sorted(
        (r["loc"], r["lastmod"])
        for r in parse_sitemaps(_df(spark)).filter(
            F.col("kind") == "index").collect()
    )
    assert rows == [("https://a.com/s1.xml", "2024-02-02"),
                    ("https://a.com/s2.xml", None)]


def test_overlong_priority_is_null_safe(spark):
    # >3 fractional digits overflows DECIMAL(4,3) → NULL → default,
    # never a throw (ANSI off) and never a wrong integer
    df = spark.createDataFrame(
        [("s", "<urlset><url><loc>x</loc>"
          "<priority>0.12345</priority></url></urlset>")],
        "sitemap_url string, xml string",
    )
    row = parse_sitemaps(df).head()
    assert row["priority_permille"] in (123, DEFAULT_PRIORITY_PERMILLE)


def test_parse_plan_is_narrow(spark):
    """The parse is explode + project only — no Exchange until the
    caller aggregates."""
    plan = parse_sitemaps(_df(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_advertised_recrawl_semantics(spark):
    from metal_history_knowledge_graph_spark.operators.frontier import (
        advertised_recrawl,
    )

    parsed = spark.createDataFrame(
        [
            # daily, 2 days stale → 2000‰ overdue
            ("u1", "2024-02-28", "daily", 800),
            # never → score 0 regardless of staleness
            ("u2", "2020-01-01", "never", 1000),
            # no changefreq → weekly default; no lastmod → exactly due
            ("u3", None, None, 500),
            # future lastmod clamps to 0 staleness
            ("u4", "2024-03-05", "hourly", 500),
        ],
        "loc string, lastmod string, changefreq string, "
        "priority_permille long",
    )
    out = {
        r["loc"]: r
        for r in advertised_recrawl(parsed, "2024-03-01 00:00:00").collect()
    }
    assert out["u1"]["interval_s"] == 86400
    assert out["u1"]["staleness_s"] == 2 * 86400
    assert out["u1"]["overdue_permille"] == 2000
    assert out["u1"]["recrawl_score"] == 2000 * 800
    assert out["u2"]["interval_s"] == 0
    assert out["u2"]["overdue_permille"] == 0
    assert out["u2"]["recrawl_score"] == 0
    assert out["u3"]["interval_s"] == 604800
    assert out["u3"]["staleness_s"] == 604800       # exactly due
    assert out["u3"]["overdue_permille"] == 1000
    assert out["u4"]["staleness_s"] == 0
    assert out["u4"]["overdue_permille"] == 0
