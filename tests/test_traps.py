"""Crawl-trap signals: planted trap shapes with exact ppm assertions."""

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.traps import (
    crawl_trap_signals,
    trap_filtered_frontier,
)


def _crawl(spark):
    rows = []
    # calendar trap: 24 distinct URLs, ONE text
    for i in range(24):
        rows.append(
            ("cal", f"http://cal/blog/{2000 + i % 6}/{1 + i % 12}/p{i}",
             "same page")
        )
    # repeated-segment trap: 25 distinct URLs, distinct texts
    for i in range(25):
        rows.append(("loop", f"http://loop/a/b/a/{i}", f"text {i}"))
    # param mint: 20 distinct URLs (>=3 params), one text
    for i in range(20):
        rows.append(
            ("mint", f"http://mint/search?q=x&sess={i}&page={i % 5}",
             "results")
        )
    # healthy host: 25 distinct URLs, distinct texts, recrawled twice
    for i in range(25):
        rows.append(("ok", f"http://ok/page/{i}", f"doc {i}"))
        rows.append(("ok", f"http://ok/page/{i}", f"doc {i}"))
    # tiny host: all-duplicate but below min_urls
    for i in range(5):
        rows.append(("tiny", f"http://tiny/{i}", "dup"))
    return spark.createDataFrame(rows, "host string, url string, text string")


def test_trap_signals(spark):
    sig = {
        r["host"]: r.asDict()
        for r in crawl_trap_signals(_crawl(spark)).collect()
    }
    cal = sig["cal"]
    assert cal["n_urls"] == 24 and cal["n_texts"] == 1
    assert cal["calendar_ppm"] == 1_000_000
    assert cal["dup_ppm"] == (1_000_000 * 23) // 24
    assert cal["is_trap"] is True

    loop = sig["loop"]
    assert loop["repseg_ppm"] == 1_000_000 and loop["dup_ppm"] == 0
    assert loop["is_trap"] is True
    assert loop["max_depth"] == 4  # a / b / a / i

    mint = sig["mint"]
    assert mint["param_ppm"] == 1_000_000
    assert mint["dup_ppm"] == (1_000_000 * 19) // 20
    assert mint["is_trap"] is True  # via dup gate, not param

    ok = sig["ok"]
    assert ok["n_pages"] == 50 and ok["n_urls"] == 25 and ok["n_texts"] == 25
    assert ok["dup_ppm"] == 0 and ok["is_trap"] is False

    tiny = sig["tiny"]
    assert tiny["dup_ppm"] == (1_000_000 * 4) // 5
    assert tiny["is_trap"] is False  # below min_urls


def test_trap_filtered_frontier(spark):
    sig = crawl_trap_signals(_crawl(spark))
    cand = spark.createDataFrame(
        [("cal", "http://cal/blog/2001/2/p9"), ("ok", "http://ok/page/7"),
         ("new", "http://new/x")],
        "host string, url string",
    )
    kept = {r["host"] for r in trap_filtered_frontier(cand, sig).collect()}
    assert kept == {"ok", "new"}


def test_depth_and_params_parsing(spark):
    # no scheme/host prefix ambiguity: fragment and query stripped
    crawl = spark.createDataFrame(
        [("h", "https://h:8080/a/b/c/d/e/f/g?x=1#frag", "t1"),
         ("h", "http://h/", "t2")],
        "host string, url string, text string",
    )
    sig = crawl_trap_signals(crawl, min_urls=1).collect()[0]
    assert sig["max_depth"] == 7
    assert sig["deep_ppm"] == 500_000  # one of two URLs deeper than 6
    assert sig["param_ppm"] == 0  # single param < threshold
