"""robots.txt policy filtering — the crawl-side admission control a
web-scale corpus pipeline applies before fetching (and re-applies
when licensing audits re-check stored corpora against current
policies). Completes the crawl-ops family (snapshot diff, per-domain
capping, URL canonicalization).

* ``parse_robots`` — robots.txt text → a rules table
  (domain, agent, rule, path_prefix, rule_len), entirely native
  column ops: line explode with position, a running-count window to
  assign user-agent GROUP ids (consecutive ``User-agent:`` lines
  share one group, per the spec), and a group join attaching every
  rule to all of its group's agents. Comments (#), blank lines, CRLF
  and case-insensitive keys handled; the common prefix-rule subset is
  implemented (``*``/``$`` wildcard rules are parsed but flagged
  ``has_wildcard`` so callers can route them to a stricter matcher).
* ``robots_decide`` — the Google/RFC 9309 decision: pick the most
  specific agent group (exact agent if it has rules, else ``*``),
  longest path-prefix match wins, Allow beats Disallow on ties,
  no match ⇒ allowed. Empty-path ``Disallow:`` (allow-all) emits no
  rule.

Scale shape: the rules table is domain-vocabulary-sized — broadcast
it; the URL side stays a narrow scan with one broadcast join + one
(url)-keyed window over its handful of matched rules. Parser
semantics are pinned on golden robots.txt fixtures in test_robots;
the decision function has an exact SQL oracle (q_robots_filter)
replaying longest-match + tie-break over the exported rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RULES_COLS = ("domain", "agent", "rule", "path_prefix", "rule_len",
              "has_wildcard")


def parse_robots(
    df: DataFrame, domain_col: str = "domain", text_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies → rules table (one row per (agent, rule))."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(
            F.split(F.col(text_col), r"\r?\n")
        ).alias("line_no", "raw"),
    )
    # strip comments + whitespace; key:value split on the FIRST colon
    cleaned = lines.select(
        "domain", "line_no",
        F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")).alias("ln"),
    )
    kv = cleaned.select(
        "domain", "line_no",
        F.lower(F.trim(F.substring_index(F.col("ln"), ":", 1))).alias("key"),
        F.when(
            F.instr(F.col("ln"), ":") > 0,
            F.trim(F.expr("substring(ln, instr(ln, ':') + 1)")),
        ).otherwise(F.lit("")).alias("value"),
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))
    # group id: a user-agent line starts a new group unless the
    # previous kept line was also a user-agent line (consecutive UA
    # lines share a group, RFC 9309 §2.2.1)
    w = Window.partitionBy("domain").orderBy("line_no")
    kv = kv.withColumn("prev_key", F.lag("key").over(w)).withColumn(
        "new_group",
        (
            (F.col("key") == "user-agent")
            & (F.coalesce(F.col("prev_key"), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("group_id", F.sum("new_group").over(w))
    agents = kv.filter(F.col("key") == "user-agent").select(
        "domain", "group_id", F.lower(F.col("value")).alias("agent")
    )
    rules = kv.filter(
        (F.col("key") != "user-agent") & (F.length("value") > 0)
    ).select(
        "domain", "group_id",
        F.when(F.col("key") == "allow", F.lit("allow"))
        .otherwise(F.lit("disallow")).alias("rule"),
        F.col("value").alias("path_prefix"),
    )
    return (
        rules.join(agents, ["domain", "group_id"])
        .select(
            "domain", "agent", "rule", "path_prefix",
            F.length("path_prefix").cast("int").alias("rule_len"),
            (
                F.col("path_prefix").contains("*")
                | F.col("path_prefix").endswith("$")
            ).alias("has_wildcard"),
        )
        .distinct()
    )


def parse_robots_groups(
    df: DataFrame, domain_col: str = "domain", text_col: str = "robots_txt"
) -> DataFrame:
    """(domain, agent) for EVERY declared user-agent group — including
    groups with no emittable rules (an empty ``Disallow:`` means
    allow-all and produces no rules row, but per RFC 9309 the group
    still GOVERNS its agent: falling back to ``*`` would invert the
    policy). Pass this to robots_decide's ``groups``."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(text_col), r"\r?\n")).alias("raw"),
    )
    ln = F.trim(F.regexp_replace(F.col("raw"), r"#.*$", ""))
    return (
        lines.select(
            "domain",
            F.lower(F.trim(F.substring_index(ln, ":", 1))).alias("key"),
            F.when(
                F.instr(ln, ":") > 0,
                F.lower(F.trim(F.expr(
                    "substring(trim(regexp_replace(raw, '#.*$', '')), "
                    "instr(trim(regexp_replace(raw, '#.*$', '')), ':') + 1)"
                ))),
            ).otherwise(F.lit("")).alias("agent"),
        )
        .filter((F.col("key") == "user-agent") & (F.length("agent") > 0))
        .select("domain", "agent")
        .distinct()
    )


def _wildcard_regex(prefix: Column) -> Column:
    """RFC 9309 pattern → anchored Java regex: '*' matches any
    sequence, a TRAILING '$' anchors end-of-path, every other
    character is literal (escaped)."""
    anchored = prefix.endswith("$")
    body = F.when(
        anchored, F.expr("substring(path_prefix, 1, length(path_prefix) - 1)")
    ).otherwise(prefix)
    esc = F.regexp_replace(
        body, r"([.^$+?(){}\[\]|\\])", r"\\$1"
    )
    return F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )


def robots_decide(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    domain_col: str = "domain",
    path_col: str = "path",
    groups: DataFrame | None = None,
) -> DataFrame:
    """urls + ``allowed`` boolean (RFC 9309 decision for ``agent``):
    most specific agent group, longest match, Allow wins ties,
    default allow. Plain rules match as path prefixes; wildcard rules
    ('*' any-sequence / trailing-'$' end anchor) match via the
    compiled anchored regex — both in one broadcast join + one
    per-url window.

    ``groups`` (from parse_robots_groups) supplies the DECLARED
    agent groups: a group declared with zero emittable rules (empty
    Disallow = allow-all) still governs its agent per RFC 9309 and
    must not fall back to '*'. Without ``groups``, group existence is
    inferred from the rules table (a declared-but-empty exact group
    is then indistinguishable from no group — pass ``groups`` when
    policies use that idiom)."""
    agent = agent.lower()
    exact_src = (
        groups.filter(F.col("agent") == agent)
        if groups is not None
        else rules.filter(F.col("agent") == agent)
    )
    has_exact = (
        exact_src.select("domain").distinct().withColumn("_exact", F.lit(True))
    )
    applicable = (
        rules.filter(F.col("agent").isin(agent, "*"))
        .join(F.broadcast(has_exact), "domain", "left")
        .filter(
            (F.col("agent") == agent)
            | F.col("_exact").isNull()  # wildcard only when no exact group
        )
        .select(
            F.col("domain").alias("_r_domain"), "rule",
            "path_prefix", "rule_len", "has_wildcard",
            _wildcard_regex(F.col("path_prefix")).alias("_pat"),
        )
    )
    matched = urls.join(
        F.broadcast(applicable),
        (F.col(domain_col) == F.col("_r_domain"))
        & F.when(
            F.col("has_wildcard"),
            F.regexp_like(F.col(path_col), F.col("_pat")),
        ).otherwise(F.col(path_col).startswith(F.col("path_prefix"))),
        "left",
    ).drop("_r_domain")
    w = (
        Window.partitionBy(domain_col, path_col)
        .orderBy(
            F.desc("rule_len"),
            F.asc(F.col("rule") != "allow"),  # allow first on ties
            F.asc("path_prefix"),
        )
    )
    ranked = matched.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.filter(F.col("_rk") == 1)
        .select(
            domain_col, path_col,
            F.coalesce(F.col("rule") != "disallow", F.lit(True))
            .alias("allowed"),
        )
    )


def parse_crawl_delays(
    df: DataFrame, domain_col: str = "domain", text_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies → (domain, agent, delay_s): the Crawl-delay
    directive per agent group (non-standard but near-universal; the
    politeness knob schedule_batch's per-host budgets consume). The
    same line/group machinery as parse_robots, scoped to
    user-agent/crawl-delay keys; non-numeric or negative values are
    ignored, repeated values keep the MAX (the conservative reading).
    Kept separate from parse_robots so the RFC 9309 rule grouping is
    untouched by a directive the RFC does not define."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("line_no", "raw"),
    )
    cleaned = lines.select(
        "domain", "line_no",
        F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")).alias("ln"),
    )
    kv = cleaned.select(
        "domain", "line_no",
        F.lower(F.trim(F.substring_index(F.col("ln"), ":", 1))).alias("key"),
        F.when(
            F.instr(F.col("ln"), ":") > 0,
            F.trim(F.expr("substring(ln, instr(ln, ':') + 1)")),
        ).otherwise(F.lit("")).alias("value"),
    ).filter(F.col("key").isin("user-agent", "crawl-delay"))
    w = Window.partitionBy("domain").orderBy("line_no")
    kv = kv.withColumn("prev_key", F.lag("key").over(w)).withColumn(
        "new_group",
        (
            (F.col("key") == "user-agent")
            & (F.coalesce(F.col("prev_key"), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("group_id", F.sum("new_group").over(w))
    agents = kv.filter(F.col("key") == "user-agent").select(
        "domain", "group_id", F.lower(F.col("value")).alias("agent")
    )
    delays = kv.filter(
        (F.col("key") == "crawl-delay") & F.col("value").rlike(r"^\d+$")
    ).select("domain", "group_id", F.col("value").cast("long").alias("delay_s"))
    return (
        delays.join(agents, ["domain", "group_id"])
        .groupBy("domain", "agent")
        .agg(F.max("delay_s").alias("delay_s"))
    )


def robots_sitemaps(
    df: DataFrame, domain_col: str = "domain", text_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies → (domain, sitemap_url): the ``Sitemap:``
    directives (RFC 9309 §2.2.4 — group-INDEPENDENT, valid anywhere
    in the file, so no user-agent machinery applies). The discovery
    seam: feeds ``sources/sitemap.parse_sitemaps`` with the per-host
    sitemap list a crawler fetches after the robots probe.

    Sitemap values are absolute URLs per spec; the key match is
    case-insensitive, the URL keeps its case. Relative or empty
    values are dropped; duplicates collapse. One narrow
    split-explode + filter — no window, no shuffle beyond the
    distinct."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(text_col), r"\r?\n")).alias("raw"),
    )
    cleaned = lines.select(
        "domain",
        F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")).alias("ln"),
    )
    return (
        cleaned.filter(
            F.lower(F.trim(F.substring_index(F.col("ln"), ":", 1)))
            == "sitemap"
        )
        .select(
            "domain",
            F.trim(F.expr("substring(ln, instr(ln, ':') + 1)"))
            .alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url").rlike(r"^https?://"))
        .distinct()
    )


def crawl_budgets(
    delays: DataFrame,
    agent: str = "*",
    window_s: int = 60,
    default_budget: int = 10,
) -> DataFrame:
    """(host, budget): how many fetches a politeness window of
    ``window_s`` seconds allows per host — ``window_s div delay_s``,
    exact-agent delay beating the '*' group, hosts without a delay
    falling back to ``default_budget``, and a delay longer than the
    window yielding 0 (the host sits this window out rather than
    being hammered once anyway). Vocabulary-sized output — broadcast
    it into schedule_batch."""
    agent = agent.lower()
    exact = delays.filter(F.col("agent") == agent).select(
        F.col("domain").alias("host"), F.col("delay_s").alias("_d_exact")
    )
    wild = delays.filter(F.col("agent") == "*").select(
        F.col("domain").alias("host"), F.col("delay_s").alias("_d_wild")
    )
    hosts = exact.select("host").unionByName(wild.select("host")).distinct()
    return (
        hosts.join(exact, "host", "left")
        .join(wild, "host", "left")
        .select(
            "host",
            F.expr(
                f"CASE WHEN coalesce(_d_exact, _d_wild) IS NULL"
                f" THEN {default_budget}L"
                f" WHEN coalesce(_d_exact, _d_wild) <= 0 THEN {default_budget}L"
                f" ELSE {window_s}L div coalesce(_d_exact, _d_wild) END"
            ).cast("long").alias("budget"),
        )
    )
