"""Maximal independent set by Luby's algorithm with deterministic
hash priorities (Luby 1986 — THE symmetric-breaking primitive of
distributed graph computing): per round, every still-active node
whose priority beats all active neighbors joins the MIS; it and its
neighbors deactivate. O(log n) rounds w.h.p., each round two
node-keyed join+aggs — the BSP shape of the repo's other fixed-point
kernels (pagerank, label propagation, scc).

Where a data pipeline wants an MIS: picking a maximal set of
mutually-NON-adjacent items from a conflict graph — audit samples
from a near-duplicate graph where no two chosen docs are near-dups
of each other, politeness-safe seed hosts where no two share an
edge, diversity anchors in a similarity graph.

Determinism / oracle: the priority is the md5 hex digest of the node
id (string compare = total order; ties require an md5 collision).
With fixed priorities Luby's result is a pure function of the graph —
equal to the sequential greedy MIS over the priority order — and a
SQL oracle replays the exact same rounds as chained CTEs. The round
count is data-dependent, so :func:`luby_mis` RAISES if ``max_rounds``
is hit before the active set drains (never returns a partial set),
and the oracle unrolls the same bound.

Scale shape: per round, one symmetrized-edge join against the active
set + a min partial agg per node, one anti-join to deactivate;
lineage cut per round with localCheckpoint; the only driver state is
the 1-row active-count probe. Isolated nodes join in round 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prio(node):
    return F.md5(F.concat(F.lit("mis:"), node.cast("string")))


def _edge_prio(a, b):
    return F.md5(
        F.concat(
            F.lit("match:"), a.cast("string"), F.lit("|"), b.cast("string")
        )
    )


def greedy_matching(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 16,
) -> DataFrame:
    """Maximal matching by the edge-parallel analogue of Luby:
    ``(a, b, match_round)`` — a maximal set of vertex-disjoint edges
    of the undirected graph (canonicalized a < b, self-loops
    dropped). Per round, an edge is matched iff its md5 priority is
    the minimum among ALL active edges at BOTH endpoints (the
    classic locally-lightest-edge rule); matched endpoints retire
    every incident edge. Equals the sequential greedy matching over
    the global priority order (pytest-pinned), so a SQL oracle
    replays the rounds exactly. Where a pipeline wants one: pairing
    near-duplicate documents one-to-one for side-by-side audit, or
    pairing mirror hosts for differential crawls.

    Per round: one explode to endpoint rows + a min partial agg, two
    joins back, one anti-join — node- and edge-keyed only. Raises
    RuntimeError if ``max_rounds`` doesn't drain the active edges."""
    e = (
        edges.select(
            F.least(
                F.col(src_col).cast("long"), F.col(dst_col).cast("long")
            ).alias("a"),
            F.greatest(
                F.col(src_col).cast("long"), F.col(dst_col).cast("long")
            ).alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .distinct()
    )
    active = e.select(
        "a", "b", _edge_prio(F.col("a"), F.col("b")).alias("pr")
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    matched = spark.createDataFrame([], "a long, b long, match_round int")
    for r in range(1, max_rounds + 1):
        if active.limit(1).count() == 0:
            return matched
        nm = (
            active.select(F.col("a").alias("node"), "pr")
            .unionByName(active.select(F.col("b").alias("node"), "pr"))
            .groupBy("node")
            .agg(F.min("pr").alias("_mn"))
        )
        sel = (
            active.join(
                nm.select(F.col("node").alias("a"), F.col("_mn").alias("_ma")),
                "a",
            )
            .join(
                nm.select(F.col("node").alias("b"), F.col("_mn").alias("_mb")),
                "b",
            )
            .filter((F.col("pr") == F.col("_ma")) & (F.col("pr") == F.col("_mb")))
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        matched = matched.unionByName(
            sel.select("a", "b", F.lit(r).cast("int").alias("match_round"))
        ).localCheckpoint(eager=True)
        used = (
            sel.select(F.col("a").alias("node"))
            .unionByName(sel.select(F.col("b").alias("node")))
            .distinct()
        )
        active = (
            active.join(
                used.select(F.col("node").alias("a")), "a", "left_anti"
            )
            .join(used.select(F.col("node").alias("b")), "b", "left_anti")
            .localCheckpoint(eager=True)
        )
    if active.limit(1).count() > 0:
        raise RuntimeError(
            f"greedy_matching: active edges remain after {max_rounds} rounds"
        )
    return matched


def luby_mis(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    nodes: DataFrame | None = None,
    max_rounds: int = 16,
) -> DataFrame:
    """``(node, mis_round)`` — the members of the maximal independent
    set of the UNDIRECTED graph (edges are symmetrized, self-loops
    dropped) and the round each joined in. ``nodes`` optionally adds
    isolated vertices (1 column, first used); raises RuntimeError if
    ``max_rounds`` rounds don't drain the active set."""
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("a"),
            F.col(dst_col).cast("long").alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = sym.select(F.col("a").alias("node"))
    if nodes is not None:
        n = n.unionByName(
            nodes.select(F.col(nodes.columns[0]).cast("long").alias("node"))
        )
    active = (
        n.distinct()
        .select("node", _prio(F.col("node")).alias("pr"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    mis = spark.createDataFrame([], "node long, mis_round int")
    for r in range(1, max_rounds + 1):
        if active.limit(1).count() == 0:
            return mis
        nbmin = (
            sym.join(active.select(F.col("node").alias("b"),
                                   F.col("pr").alias("_bpr")), "b")
            .join(active.select(F.col("node").alias("a")), "a")
            .groupBy("a")
            .agg(F.min("_bpr").alias("_mn"))
        )
        sel = (
            active.join(nbmin, active["node"] == nbmin["a"], "left")
            .filter(F.col("_mn").isNull() | (F.col("pr") < F.col("_mn")))
            .select("node")
            .localCheckpoint(eager=True)
        )
        mis = mis.unionByName(
            sel.select("node", F.lit(r).cast("int").alias("mis_round"))
        ).localCheckpoint(eager=True)
        removed = (
            sym.join(sel.select(F.col("node").alias("a")), "a")
            .select(F.col("b").alias("node"))
            .unionByName(sel)
            .distinct()
        )
        active = active.join(removed, "node", "left_anti").localCheckpoint(
            eager=True
        )
    if active.limit(1).count() > 0:
        raise RuntimeError(
            f"luby_mis: active nodes remain after {max_rounds} rounds"
        )
    return mis
