"""HTTP redirect / rel=canonical chain resolution over a crawled URL
space, and link-graph repointing through the resolved map.

A Common-Crawl-scale fetch log is full of 3xx hops and ``<link
rel=canonical>`` pointers: every duplicate-collapse, link-graph, and
recrawl decision wants the FINAL landing URL, not the alias the crawler
happened to fetch. The reference's scraper follows redirects inside the
HTTP client one page at a time (requests does it implicitly per call);
at 10^11 URLs the chains live in a table, and resolution is a graph
problem: each redirecting URL has ONE successor (a functional graph),
chains end at a non-redirecting URL, and real logs contain loops
(A→B→A), self-redirects, and chains longer than any client follows.
Browsers cap at ~20 hops and report "too many redirects" — ``max_hops``
reproduces exactly that semantics.

Spark-first shape: parallel POINTER DOUBLING (pointer jumping), the
classic O(log H) formulation — round k advances every unresolved
pointer from 2^(k-1) to 2^k hops via ONE self-equi-join on the current
target, so a 20-hop cap costs 5 hash joins total instead of 20
iterative ones, with no driver state and no per-chain work. Exited
pointers (target is not a redirect source) miss the join and stay put,
so hop counts are exact chain lengths. Loops and over-long chains
simply never exit; they surface as ``resolved = false`` with NULL
final/hops — a pure function of the graph, which is what lets DuckDB
verify the DEFINITION (recursive-CTE walk to depth max_hops+1) rather
than replay the doubling trajectory. ``localCheckpoint`` truncates the
per-round lineage doubling (CLAUDE.md iterative-lineage rule).

Cost at scale: the pointer table is O(#redirecting URLs) — a small
slice of the corpus — and every round is a key-hash-partitioned
equi-join on it. Repointing the link graph afterwards is one
broadcast-eligible left join (Catalyst/AQE decides; the resolution map
is NOT hinted broadcast — it grows with the crawl, the crawl.py seen-
set lesson).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def redirect_map(
    redirects: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(url, nxt): the deterministic functional graph — one successor
    per source, ties collapsed to ``min(dst)`` (a crawl log can record
    the same URL redirecting differently across fetches; min is the
    order-independent pick). Self-redirects are KEPT: A→A is a real
    loop a client reports, not a row to silently drop."""
    return (
        redirects.select(
            F.col(src_col).alias("url"), F.col(dst_col).alias("nxt")
        )
        .filter(F.col("url").isNotNull() & F.col("nxt").isNotNull())
        .groupBy("url")
        .agg(F.min("nxt").alias("nxt"))
    )


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 20,
) -> DataFrame:
    """Resolve every redirect SOURCE to its final landing URL.

    Returns (url, final_url, hops, resolved):
      * ``resolved = true``  → the chain exits at ``final_url`` after
        ``hops`` ≤ max_hops redirects (hops ≥ 1; exact chain length).
      * ``resolved = false`` → loop, self-redirect, or chain longer
        than ``max_hops`` (the browser "too many redirects" bucket);
        final_url/hops are NULL so the output is a pure function of
        the graph, not of the resolution schedule.

    Pointer doubling: after k rounds every pointer has advanced
    min(chain length, 2^k) hops, so ceil(log2(max_hops + 1)) rounds
    (2^k ≥ max_hops + 1) guarantee every chain of length ≤ max_hops
    has fully exited and every longer chain is either past max_hops
    hops or still on a source — "still pointing at a redirect source
    OR hops > max_hops" is exactly the unresolved predicate, with no
    extra round (each round is a corpus-wide self-join; one too many
    is one shuffle too many).
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    m = redirect_map(redirects, src_col, dst_col)
    ptr = m.select(
        "url",
        F.col("nxt").alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=False)
    rounds = int(math.ceil(math.log2(max_hops + 1)))
    for _ in range(rounds):
        jump = ptr.select(
            F.col("url").alias("j_url"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
        )
        ptr = (
            ptr.join(jump, ptr["cur"] == jump["j_url"], "left")
            .select(
                "url",
                F.coalesce("j_cur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("j_hops", F.lit(0))).alias(
                    "hops"
                ),
            )
            .localCheckpoint(eager=False)
        )
    still_source = m.select(F.col("url").alias("cur")).withColumn(
        "cur_is_source", F.lit(True)
    )
    out = ptr.join(still_source, "cur", "left")
    ok = F.col("cur_is_source").isNull() & (F.col("hops") <= max_hops)
    return out.select(
        "url",
        F.when(ok, F.col("cur")).alias("final_url"),
        F.when(ok, F.col("hops")).alias("hops"),
        ok.alias("resolved"),
    )


def repoint_edges(
    links: DataFrame,
    resolution: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    drop_unresolved: bool = True,
) -> DataFrame:
    """Rewrite a link graph's BOTH endpoints through the resolution
    map (aliases collapse on either side of an edge), returning the
    distinct repointed (src, dst) pairs with self-links (alias →
    its own canonical) removed.

    Endpoints that are not redirect sources pass through unchanged;
    endpoints whose chain is unresolved (loop / too-long) are edges
    into dead URL space — dropped when ``drop_unresolved`` (the crawl-
    planning default), kept as-is otherwise. Two plain left equi-joins;
    the map is unhinted (AQE picks broadcast while it is small)."""
    res = resolution.select("url", "final_url", "resolved")

    def _one_side(df: DataFrame, col: str) -> DataFrame:
        r = res.select(
            F.col("url").alias(f"{col}__u"),
            F.col("final_url").alias(f"{col}__f"),
            F.col("resolved").alias(f"{col}__ok"),
        )
        df = df.join(r, df[col] == r[f"{col}__u"], "left")
        if drop_unresolved:
            df = df.filter(
                F.col(f"{col}__ok").isNull() | F.col(f"{col}__ok")
            )
        return df.withColumn(
            col, F.coalesce(f"{col}__f", col)
        ).drop(f"{col}__u", f"{col}__f", f"{col}__ok")

    out = _one_side(
        links.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")),
        "src",
    )
    out = _one_side(out, "dst")
    return (
        out.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
