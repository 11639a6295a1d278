"""robots.txt parsing + RFC 9309 decision (operators/robots.py):
golden fixtures covering multi-agent groups, comments/CRLF/case,
empty Disallow, wildcard flagging; decision semantics — longest
match, Allow-beats-Disallow ties, exact-agent group precedence,
default allow — each pinned against hand-derived outcomes."""

from metal_history_knowledge_graph_spark.operators.robots import (
    parse_robots,
    robots_decide,
)

ROBOTS_A = (
    "# crawl policy\r\n"
    "User-Agent: *\r\n"
    "Disallow: /private/\r\n"
    "Allow: /private/ok/\r\n"
    "Disallow:\r\n"            # empty -> allow-all -> no rule emitted
    "\r\n"
    "User-agent: gptbot\r\n"
    "user-agent: ccbot\r\n"    # consecutive UA lines: ONE group
    "Disallow: /\r\n"
)

ROBOTS_B = (
    "User-agent: *\n"
    "Disallow: /tmp*.html\n"   # wildcard -> parsed + flagged
    "Allow: /a\n"
    "Disallow: /a/b\n"
)


def _rules(spark):
    df = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)],
        "domain string, robots_txt string",
    )
    return parse_robots(df)


def test_parse_golden(spark):
    got = {
        (r["domain"], r["agent"], r["rule"], r["path_prefix"]):
            (r["rule_len"], r["has_wildcard"])
        for r in _rules(spark).collect()
    }
    assert got == {
        ("a.example", "*", "disallow", "/private/"): (9, False),
        ("a.example", "*", "allow", "/private/ok/"): (12, False),
        ("a.example", "gptbot", "disallow", "/"): (1, False),
        ("a.example", "ccbot", "disallow", "/"): (1, False),
        ("b.example", "*", "disallow", "/tmp*.html"): (10, True),
        ("b.example", "*", "allow", "/a"): (2, False),
        ("b.example", "*", "disallow", "/a/b"): (4, False),
    }


def test_decision_semantics(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [
            ("a.example", "/public/x"),        # no match -> allow
            ("a.example", "/private/x"),       # disallow /private/
            ("a.example", "/private/ok/x"),    # longer allow wins
            ("b.example", "/a/b/c"),           # /a/b (disallow, len 4) beats /a
            ("b.example", "/a/x"),             # only /a allow
            ("c.example", "/anything"),        # unknown domain -> allow
        ],
        "domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_decide(urls, rules, agent="*").collect()
    }
    assert got == {
        ("a.example", "/public/x"): True,
        ("a.example", "/private/x"): False,
        ("a.example", "/private/ok/x"): True,
        ("b.example", "/a/b/c"): False,
        ("b.example", "/a/x"): True,
        ("c.example", "/anything"): True,
    }


def test_exact_agent_group_precedence(spark):
    """gptbot has its own group on a.example -> the * group is IGNORED
    (RFC 9309 group selection), so /private/ok/x is disallowed for
    gptbot (its group says Disallow: /) while anonymous crawlers keep
    the * rules. On b.example gptbot has no group -> falls back to *."""
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [("a.example", "/private/ok/x"), ("b.example", "/a/x")],
        "domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_decide(urls, rules, agent="GPTBot").collect()
    }
    assert got == {
        ("a.example", "/private/ok/x"): False,
        ("b.example", "/a/x"): True,
    }


def test_tie_allow_wins(spark):
    df = spark.createDataFrame(
        [("t.example", "User-agent: *\nAllow: /p\nDisallow: /p\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("t.example", "/p/x")], "domain string, path string"
    )
    got = robots_decide(urls, parse_robots(df)).collect()[0]
    assert got["allowed"] is True


def test_decide_plan_broadcast_jvm_only(spark):
    """The rules side (domain-vocabulary-sized) must broadcast — the
    URL side stays narrow; zero Python in either half."""
    rb = spark.createDataFrame(
        [("d", "User-agent: *\nDisallow: /x\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame([("d", "/x/1")], "domain string, path string")
    plan = (
        robots_decide(urls, parse_robots(rb))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_wildcard_rules_match(spark):
    """'Disallow: /*' (disallow-all idiom) and 'Disallow: /tmp*.html'
    must actually BLOCK — wildcard rules compile to anchored regexes,
    never literal prefixes that match nothing."""
    df = spark.createDataFrame(
        [
            ("w.example", "User-agent: *\nDisallow: /*\nAllow: /pub/\n"),
            ("x.example", "User-agent: *\nDisallow: /tmp*.html\n"),
            ("y.example", "User-agent: *\nDisallow: /exact$\n"),
        ],
        "domain string, robots_txt string",
    )
    rules = parse_robots(df)
    urls = spark.createDataFrame(
        [
            ("w.example", "/anything"),      # /* blocks
            ("w.example", "/pub/ok"),        # longer Allow wins (5 > 2)
            ("x.example", "/tmp123.html"),   # wildcard hit
            ("x.example", "/tmp123.txt"),    # no .html suffix -> allow
            ("y.example", "/exact"),         # $ anchor hit
            ("y.example", "/exactly"),       # longer path -> allow
        ],
        "domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_decide(urls, rules).collect()
    }
    assert got == {
        ("w.example", "/anything"): False,
        ("w.example", "/pub/ok"): True,
        ("x.example", "/tmp123.html"): False,
        ("x.example", "/tmp123.txt"): True,
        ("y.example", "/exact"): False,
        ("y.example", "/exactly"): True,
    }


def test_empty_exact_group_governs(spark):
    """'User-agent: mybot\\nDisallow:' (allow-all for mybot) + a
    disallow-all '*' group: with parse_robots_groups supplied, mybot
    is allowed everywhere — never falls back to the '*' block."""
    from metal_history_knowledge_graph_spark.operators.robots import (
        parse_robots_groups,
    )

    df = spark.createDataFrame(
        [("g.example",
          "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n")],
        "domain string, robots_txt string",
    )
    rules, groups = parse_robots(df), parse_robots_groups(df)
    urls = spark.createDataFrame(
        [("g.example", "/a"), ("g.example", "/b/c")],
        "domain string, path string",
    )
    mine = {
        r["path"]: r["allowed"]
        for r in robots_decide(urls, rules, agent="mybot",
                               groups=groups).collect()
    }
    anon = {
        r["path"]: r["allowed"]
        for r in robots_decide(urls, rules, agent="*",
                               groups=groups).collect()
    }
    assert mine == {"/a": True, "/b/c": True}
    assert anon == {"/a": False, "/b/c": False}


# --- Crawl-delay budgets --------------------------------------------------------

def test_parse_crawl_delays_groups_and_validation(spark):
    from metal_history_knowledge_graph_spark.operators.robots import (
        parse_crawl_delays,
    )

    txt = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
        "User-agent: slowbot\nCrawl-delay: 30\n\n"
        "User-agent: badbot\nCrawl-delay: nope\n\n"   # non-numeric ignored
        "User-agent: twice\nCrawl-delay: 3\nCrawl-delay: 7\n"  # max wins
    )
    df = spark.createDataFrame([("a.example", txt)],
                               "domain string, robots_txt string")
    got = {(r.domain, r.agent): r.delay_s
           for r in parse_crawl_delays(df).collect()}
    assert got == {
        ("a.example", "*"): 2,
        ("a.example", "slowbot"): 30,
        ("a.example", "twice"): 7,
    }


def test_crawl_budgets_agent_precedence_and_window(spark):
    from metal_history_knowledge_graph_spark.operators.robots import (
        crawl_budgets,
        parse_crawl_delays,
    )

    txt = "User-agent: *\nCrawl-delay: 2\n\nUser-agent: mybot\nCrawl-delay: 5\n"
    df = spark.createDataFrame(
        [("a.example", txt), ("b.example", "User-agent: *\nCrawl-delay: 120\n")],
        "domain string, robots_txt string",
    )
    delays = parse_crawl_delays(df)
    star = {r.host: r.budget
            for r in crawl_budgets(delays, "*", window_s=60).collect()}
    assert star == {"a.example": 30, "b.example": 0}  # 120s delay > window
    mine = {r.host: r.budget
            for r in crawl_budgets(delays, "mybot", window_s=60).collect()}
    # exact agent beats '*'; hosts without an exact group fall to '*'
    assert mine == {"a.example": 12, "b.example": 0}


def test_schedule_batch_respects_host_budgets(spark):
    from metal_history_knowledge_graph_spark.operators.frontier import (
        frontier_priorities,
        schedule_batch,
    )

    urls = spark.createDataFrame(
        [(f"http://{h}/p/{i}",) for h in ("a.example", "b.example", "c.example")
         for i in range(6)],
        "url string",
    )
    scores = spark.createDataFrame(
        [("a.example", 100), ("b.example", 100), ("c.example", 100)],
        "host string, rank_fixed long",
    )
    budgets = spark.createDataFrame(
        [("a.example", 2), ("b.example", 0)], "host string, budget long"
    )
    out = schedule_batch(
        frontier_priorities(urls, scores), per_host_budget=4,
        host_budgets=budgets,
    )
    counts = {r.host: r.n for r in
              out.groupBy("host").agg(__import__("pyspark").sql.functions
                                      .count("*").alias("n")).collect()}
    # override caps a, zero-budget skips b, default covers c
    assert counts == {"a.example": 2, "c.example": 4}


def test_robots_sitemaps_directives(spark):
    """RFC 9309 §2.2.4: Sitemap directives are group-independent —
    found before and inside UA groups, case-insensitive key, relative
    URLs dropped, duplicates collapsed, URL case preserved."""
    from metal_history_knowledge_graph_spark.operators.robots import (
        robots_sitemaps,
    )

    body = (
        "# header\n"
        "SITEMAP: https://x.example/SiteMap-A.xml\n"
        "User-agent: *\n"
        "Disallow: /p/\n"
        "Sitemap: https://x.example/b.xml  # trailing comment\n"
        "Sitemap: /relative.xml\n"
        "sitemap: https://x.example/b.xml\n"
        "Sitemap:\n"
    )
    df = spark.createDataFrame(
        [("x.example", body)], "domain string, robots_txt string"
    )
    rows = sorted(r["sitemap_url"] for r in robots_sitemaps(df).collect())
    assert rows == [
        "https://x.example/SiteMap-A.xml",
        "https://x.example/b.xml",
    ]
