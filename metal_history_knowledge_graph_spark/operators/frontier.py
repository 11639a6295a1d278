"""Crawl-frontier prioritization — the scheduling side of the crawl
ops family (robots.py decides *may we fetch*, snapshot_diff decides
*what changed*; this decides *what next*): score every candidate URL
from its host's authority and its path depth, then cut a fetch batch
under a per-host politeness budget so no host is hammered however
many candidate URLs it has.

Everything is native column work over two inputs: the candidate URL
table (web-scale) and a host score table (host-vocabulary-sized —
pagerank/hits output over the host graph from operators/links.py).

Scale design: the scoring join is host-keyed against a
vocabulary-sized dim (broadcastable); the politeness cut is the skew
case — a hot host can hold 10^8 candidates and a single per-host
window would funnel them through one reducer — so ``schedule_batch``
runs a TREE of lossless top-k levels: a (host, input-partition) local
top-``budget`` that spreads the hot host over every reducer, an
intermediate (host, url-hash-salt) cut over the ≤ budget·n_partitions
phase-1 survivors (so the final reducer's residual funnel is
≤ budget·fanout, independent of the input partition count), then the
exact per-host window. Every level is lossless: each of the true
per-host top-``budget`` rows lives in some partition/salt group and
is within that group's top-``budget``, so the final window sees it.
Output is deterministic — final ranking orders by (priority desc,
url) and urls are unique.

Reference analogue: the reference crawls a fixed two-file corpus
(SURVEY §2.1 scopes enrichment fetching out); frontier scheduling is
the beyond-reference crawl-ops operator a Common-Crawl-scale pipeline
needs, same family as robots.py.

Oracle: q_frontier replays depth parsing, the score join, the integer
priority, and the budget cut in DuckDB (a single global window — the
oracle is allowed the O(hot-host) plan the engine avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .links import _host_of


def url_depth(url_col) -> "F.Column":
    """Number of non-empty path segments of an absolute URL — 0 for
    the root, counting neither query nor fragment. Integer, shared
    rule with the oracle."""
    path = F.regexp_replace(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_replace(path, r"[?#].*$", "")
    return F.size(F.filter(F.split(path, "/"), lambda x: x != ""))


def frontier_priorities(
    urls: DataFrame,
    host_scores: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    score_col: str = "rank_fixed",
) -> DataFrame:
    """(url, host, depth, priority_fixed): candidate URLs scored
    host-authority-over-depth — ``priority = score div (depth + 1)``,
    all BIGINT (the fixed-point pagerank/hits outputs divide evenly
    into deterministic integer priorities; deep pages on strong hosts
    compete with shallow pages on weak ones). Unknown hosts score 0
    rather than dropping — a frontier must still be able to schedule
    never-seen hosts.

    One narrow projection + one host-keyed join against the
    vocabulary-sized score dim (broadcast it at the call site when it
    fits; the optimizer's size estimate does otherwise)."""
    scored = urls.select(
        F.col(url_col).alias("url"),
        _host_of(F.col(url_col)).alias("host"),
        url_depth(F.col(url_col)).cast("int").alias("depth"),
    ).join(
        host_scores.select(
            F.col(host_col).alias("host"),
            F.col(score_col).alias("_score"),
        ),
        "host",
        "left",
    )
    return scored.select(
        "url", "host", "depth",
        F.expr("coalesce(_score, 0L) div (depth + 1)")
        .cast("long").alias("priority_fixed"),
    )


def schedule_batch(
    priorities: DataFrame,
    per_host_budget: int = 10,
    host_budgets: DataFrame | None = None,
    tree_fanout: int | None = 16,
) -> DataFrame:
    """The politeness cut: at most ``per_host_budget`` URLs per host,
    best-priority first — (url, host, depth, priority_fixed,
    fetch_slot) where fetch_slot is 1..budget within the host.
    ``host_budgets`` (host, budget — e.g. robots.crawl_budgets from
    Crawl-delay directives) overrides the default per host; a budget
    of 0 skips the host for this window entirely.

    Tree top-k per host (see module docstring): phase 1 ranks within
    (host, input partition) so a hot host's candidates spread over all
    reducers; phase 1.5 (``tree_fanout`` > 1, VERDICT r4 next-step #7)
    re-cuts the ≤ budget·n_partitions phase-1 survivors per
    (host, url-hash salt) so the FINAL per-host reducer sees only
    ≤ budget·fanout rows — at 10⁴ input partitions the hot host's
    residual funnel shrinks from budget·10⁴ to budget·16; phase 2
    ranks those survivors per host exactly. Every level is a lossless
    prefilter (a true per-host top-``budget`` row is within the
    top-``budget`` of ANY subgroup containing it), so the output is
    identical for every ``tree_fanout`` — pinned vs brute force in
    test_frontier. Ordering key is (priority desc, url) — total, so
    the schedule is deterministic under any partitioning. The budget
    table is vocabulary-sized and broadcast; every phase cuts at the
    per-host effective budget. ``tree_fanout=None`` (or ≤ 1) restores
    the plain two-phase cut.
    """
    pre = priorities.withColumn("_pid", F.spark_partition_id())
    if host_budgets is not None:
        # fold duplicate host rows to the MIN budget — a duplicated
        # dim row would otherwise multiply every candidate of that
        # host through the join, and the conservative (most polite)
        # budget is the only safe merge
        hb = host_budgets.groupBy("host").agg(F.min("budget").alias("_hb"))
        pre = pre.join(F.broadcast(hb), "host", "left")
    else:
        pre = pre.withColumn("_hb", F.lit(None).cast("long"))
    pre = pre.withColumn(
        "_budget", F.coalesce(F.col("_hb"), F.lit(per_host_budget)).cast("long")
    )
    w1 = Window.partitionBy("host", "_pid").orderBy(
        F.desc("priority_fixed"), "url"
    )
    survivors = (
        pre.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= F.col("_budget"))
        .drop("_pid", "_r", "_hb")
    )
    if tree_fanout is not None and tree_fanout > 1:
        w15 = Window.partitionBy("host", "_salt").orderBy(
            F.desc("priority_fixed"), "url"
        )
        survivors = (
            survivors.withColumn(
                "_salt", F.pmod(F.xxhash64("url"), F.lit(tree_fanout))
            )
            .withColumn("_r2", F.row_number().over(w15))
            .filter(F.col("_r2") <= F.col("_budget"))
            .drop("_salt", "_r2")
        )
    w2 = Window.partitionBy("host").orderBy(F.desc("priority_fixed"), "url")
    return (
        survivors.withColumn("fetch_slot", F.row_number().over(w2).cast("long"))
        .filter(F.col("fetch_slot") <= F.col("_budget"))
        .drop("_budget")
    )


def recrawl_priorities(
    history: DataFrame,
    now_ts,
    url_col: str = "url",
    ts_col: str = "crawl_ts",
    fp_col: str = "fingerprint",
    default_change_permille: int = 500,
) -> DataFrame:
    """(url, n_crawls, n_changes, change_permille, staleness_s,
    recrawl_score): freshness scheduling from the crawl history — the
    refetch side of the frontier (schedule_batch decides WHAT first
    among new URLs; this decides WHEN a known URL is due again).

    Change rate is observed, not guessed: consecutive fetches whose
    content fingerprint differs count as changes, and
    ``change_permille = changes·1000 div (crawls−1)`` (a URL seen once
    has no observed rate and takes the ``default_change_permille``
    prior). ``recrawl_score = change_permille · staleness_s`` — a page
    that changes every fetch and is a day stale outranks a static page
    a week stale by the standard freshness-rate product. All integer
    arithmetic (epoch seconds, floor divides), so the SQL oracle
    replays every score.

    Scale shape: one window pass partitioned by url ordered by fetch
    time (per-url history is short — bounded by the crawl cadence,
    never corpus-sized), then one partial-agg groupBy. ``now_ts`` is a
    literal timestamp the caller fixes (determinism: never wall-clock
    inside the plan)."""
    # fp tie-break keeps the lag deterministic when two fetches share
    # a timestamp (same total order in the SQL oracle)
    w = Window.partitionBy(url_col).orderBy(ts_col, fp_col)
    flagged = history.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        (
            F.col(fp_col)
            != F.lag(fp_col).over(w)
        ).cast("long").alias("changed"),
    )
    agg = flagged.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_crawls"),
        F.coalesce(F.sum("changed"), F.lit(0)).cast("long").alias("n_changes"),
        F.max("ts").alias("_last"),
    )
    return agg.select(
        "url", "n_crawls", "n_changes",
        F.expr(
            f"CASE WHEN n_crawls >= 2"
            f" THEN (n_changes * 1000L) div (n_crawls - 1L)"
            f" ELSE {default_change_permille}L END"
        ).cast("long").alias("change_permille"),
        (
            F.unix_timestamp(F.lit(now_ts).cast("timestamp"))
            - F.unix_timestamp(F.col("_last").cast("timestamp"))
        ).cast("long").alias("staleness_s"),
    ).withColumn(
        "recrawl_score",
        F.expr("change_permille * staleness_s").cast("long"),
    )


#: sitemaps.org changefreq → nominal refresh interval in seconds.
CHANGEFREQ_INTERVAL_S = {
    "always": 60,
    "hourly": 3_600,
    "daily": 86_400,
    "weekly": 604_800,
    "monthly": 2_592_000,
    "yearly": 31_536_000,
}
#: applied when a <url> entry advertises no changefreq.
DEFAULT_CHANGEFREQ = "weekly"


def advertised_recrawl(
    parsed: DataFrame,
    now_ts,
    loc_col: str = "loc",
) -> DataFrame:
    """(loc, interval_s, staleness_s, overdue_permille,
    priority_permille, recrawl_score): freshness scheduling from what
    the SITE advertises — the sitemap-side sibling of
    ``recrawl_priorities`` (which scores from OBSERVED change rates;
    a crawler runs both and lets observation override advertisement
    once history exists).

    ``parsed`` is ``sources/sitemap.parse_sitemaps`` url-kind output.
    Semantics, all integer: ``interval_s`` maps changefreq through
    ``CHANGEFREQ_INTERVAL_S`` (absent → weekly, the conventional
    default); ``changefreq='never'`` scores 0 (the spec's
    archive-page marker); a missing ``lastmod`` makes the entry
    exactly due (``staleness = interval``, overdue = 1000‰) —
    "no information" must not outrank known-stale pages;
    ``overdue_permille = staleness·1000 div interval`` and
    ``recrawl_score = overdue_permille · priority_permille`` so the
    site's own priority weights the refetch order. ``now_ts`` is a
    caller-fixed literal (never wall-clock inside the plan).

    One narrow projection — no shuffle; the SQL oracle replays every
    score."""
    interval = F.coalesce(
        *[
            F.when(F.col("changefreq") == k, F.lit(v))
            for k, v in CHANGEFREQ_INTERVAL_S.items()
        ],
        F.when(F.col("changefreq") == "never", F.lit(0)),
        F.lit(CHANGEFREQ_INTERVAL_S[DEFAULT_CHANGEFREQ]),
    ).cast("long")
    now_s = F.unix_timestamp(F.lit(now_ts).cast("timestamp"))
    # explicit branch, NOT coalesce-over-greatest: Spark's greatest()
    # SKIPS nulls, so greatest(NULL − lastmod, 0) is 0, and a missing
    # lastmod would silently read as perfectly fresh instead of due
    stale = F.when(
        F.col("lastmod").isNotNull(),
        F.greatest(
            now_s - F.unix_timestamp(F.col("lastmod").cast("timestamp")),
            F.lit(0),
        ),
    ).otherwise(F.col("_interval")).cast("long")
    out = (
        parsed.select(
            F.col(loc_col).alias("loc"),
            "changefreq", "lastmod", "priority_permille",
        )
        .withColumn("interval_s", interval)
        .withColumn("_interval", F.col("interval_s"))
        .withColumn("staleness_s", stale)
        .withColumn(
            "overdue_permille",
            F.expr(
                "CASE WHEN interval_s > 0"
                " THEN (staleness_s * 1000L) div interval_s"
                " ELSE 0L END"
            ).cast("long"),
        )
        .withColumn(
            "recrawl_score",
            F.expr("overdue_permille * priority_permille").cast("long"),
        )
    )
    return out.select(
        "loc", "interval_s", "staleness_s", "overdue_permille",
        "priority_permille", "recrawl_score",
    )
