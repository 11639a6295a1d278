"""Composed crawl-scheduling plan (plans/crawl.py): spelling collapse,
seen-set removal, robots admission (incl. the per-agent variant),
politeness budget, and scheme gating."""

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.robots import parse_robots
from metal_history_knowledge_graph_spark.plans.crawl import crawl_schedule


def _rules(spark, txt="User-agent: *\nDisallow: /private/\nAllow: /private/ok\n\n"
                       "User-agent: gptbot\nDisallow: /\n"):
    robots = spark.createDataFrame(
        [("a.example", txt), ("b.example", txt)], "domain string, robots_txt string"
    )
    return parse_robots(robots)


def _scores(spark):
    return spark.createDataFrame(
        [("a.example", 1_000_000), ("b.example", 500_000)],
        "host string, rank_fixed long",
    )


def test_crawl_schedule_full_chain(spark):
    candidates = spark.createDataFrame(
        [
            # three spellings of ONE canonical page
            ("http://a.example/page?utm_source=x",),
            ("HTTP://A.example:80/page",),
            ("http://a.example/page/",),
            # robots-blocked and its carve-out
            ("http://a.example/private/secret",),
            ("http://a.example/private/ok/1",),
            # already crawled
            ("http://a.example/old",),
            # second host, deeper path (lower priority than /page)
            ("http://b.example/x/y/z",),
            ("http://b.example/top",),
            # unschedulable scheme
            ("mailto:someone@a.example",),
        ],
        "url string",
    )
    seen = spark.createDataFrame([("http://a.example/old",)], "url string")
    out = crawl_schedule(
        candidates, _rules(spark), _scores(spark), seen=seen, per_host_budget=5
    )
    rows = {r.url: r for r in out.collect()}
    # spellings collapsed to one canonical
    assert "http://a.example/page" in rows
    assert len([u for u in rows if "page" in u]) == 1
    # robots verdicts
    assert "http://a.example/private/secret" not in rows
    assert "http://a.example/private/ok/1" in rows
    # seen + scheme gates
    assert "http://a.example/old" not in rows
    assert not any(u.startswith("mailto") for u in rows)
    # priority: depth 1 beats depth 3 on the same host
    assert rows["http://b.example/top"].fetch_slot < \
        rows["http://b.example/x/y/z"].fetch_slot
    # all slots within budget
    assert all(r.fetch_slot <= 5 for r in rows.values())


def test_crawl_schedule_budget_and_agent(spark):
    candidates = spark.createDataFrame(
        [(f"http://a.example/p/{i}",) for i in range(10)], "url string"
    )
    out = crawl_schedule(
        candidates, _rules(spark), _scores(spark), per_host_budget=3
    )
    assert out.count() == 3
    # the gptbot group blocks everything for that agent
    gpt = crawl_schedule(
        candidates, _rules(spark), _scores(spark), per_host_budget=3,
        agent="gptbot",
    )
    assert gpt.count() == 0


def test_crawl_plan_broadcasts_vocabulary_dims(spark):
    """The robots and per-host budget joins broadcast their genuinely
    vocabulary-sized sides. The seen anti-join must NOT carry a forced
    broadcast hint (seen is the unbounded crawl history — a hard-coded
    broadcast would OOM at Common-Crawl scale); its physical strategy
    is left entirely to Catalyst/AQE."""
    from metal_history_knowledge_graph_spark.operators.robots import (
        crawl_budgets,
        parse_crawl_delays,
    )

    candidates = spark.createDataFrame(
        [(f"http://a.example/p/{i}",) for i in range(50)], "url string"
    )
    seen = spark.createDataFrame([("http://a.example/p/1",)], "url string")
    delays = parse_crawl_delays(spark.createDataFrame(
        [("a.example", "User-agent: *\nCrawl-delay: 2\n")],
        "domain string, robots_txt string",
    ))
    budgets = crawl_budgets(delays, window_s=60)
    out = crawl_schedule(
        candidates, _rules(spark), _scores(spark), seen=seen,
        per_host_budget=5, host_budgets=budgets,
    )
    out.collect()  # finalize the adaptive plan before inspecting it
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the genuinely bounded dims (robots verdicts, host budgets) are
    # broadcast builds; the seen anti-join's strategy is whatever the
    # optimizer picks for the current seen size (SMJ is the correct
    # shape once the history outgrows the broadcast threshold)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "LeftAnti" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the seen side must NOT be pinned by a broadcast hint: the
    # optimized logical plan carries hints only for the bounded dims,
    # so at history scale AQE is free to shuffle the anti-join
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert not any(
        "LeftAnti" in ln and "Hint" in ln for ln in logical.splitlines()
    ), logical
