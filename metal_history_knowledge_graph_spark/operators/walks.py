"""Deterministic random-walk corpus generation (DeepWalk/node2vec
style, Perozzi et al. 2014): materialize fixed-length walks over the
graph as training sequences for embedding models — the graph-ML
counterpart of the text pipeline's training-data exports.

Determinism / oracle design: the transition at step t of walk w from
node v is NOT drawn from an RNG (executor-local RNGs are neither
partition- nor engine-stable) — it picks the neighbour whose
dst-sorted rank equals::

    md5_60bit(seed | w | t | v) mod degree(v)

a pure function of (seed, walk id, step, node), so the whole corpus
is reproducible row-for-row on any engine and any partitioning —
the repo's md5-keyed sampling discipline (operators/sampling.py)
applied to graph transitions. Uniformity per step is the standard
hash-as-PRF argument; successive steps use distinct hash inputs.

Scale shape (10^9-edge graphs): the adjacency is ranked ONCE (a
dst-ordered row_number window per src — sort-based, spills, never a
collect_list of neighbour arrays); each step is two equi-joins of the
walk frontier (|nodes| × walks_per_node rows, constant per step)
against the node-sized degree dim and the edge-sized ranked adjacency
— no fan-out joins (a 10^7-degree hub contributes ONE matched row per
visiting walk, not 10^7 candidates), no driver state. localCheckpoint
per step truncates the iterative lineage.

Reference tie-in: the reference's graph analysis stops at NetworkX
metrics (scripts/analysis/graph_metrics.py); walk corpora are the
beyond-reference bridge from the KG to embedding training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash60(*cols) -> F.Column:
    """First 60 bits of md5 over the '|'-joined operands as BIGINT —
    bit-identical in DuckDB via
    ``('0x' || substr(md5(...), 1, 15))::UBIGINT``."""
    joined = F.concat_ws("|", *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def ranked_adjacency(edges: DataFrame) -> DataFrame:
    """Directed adjacency with a dense per-source neighbour rank:
    (src, dst, rn) with rn ∈ [1, outdeg(src)], neighbours ordered by
    dst — the positional index walk transitions select against.
    Self-loops and duplicate edges are dropped first."""
    from pyspark.sql import Window

    e = (
        edges.select(
            F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    w = Window.partitionBy("src").orderBy("dst")
    return e.withColumn("rn", F.row_number().over(w).cast("long"))


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    seed: str = "w",
) -> DataFrame:
    """Fixed-length deterministic walks from EVERY node with non-zero
    out-degree: (walk_id, start, step, node), step 0..walk_len. A walk
    that reaches a sink (no out-edges) stops there — later steps emit
    no rows for it (the standard DeepWalk truncation; padding is the
    consumer's choice).

    ``walk_id`` ∈ [0, walks_per_node) is the per-start replica index;
    different walk ids diverge because the id feeds the transition
    hash.
    """
    if walk_len < 1:
        raise ValueError(f"walk_len must be ≥ 1: {walk_len}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be ≥ 1: {walks_per_node}")
    adj = ranked_adjacency(edges).localCheckpoint(eager=True)
    deg = adj.groupBy("src").agg(F.max("rn").alias("deg"))

    starts = deg.select(F.col("src").alias("start"))
    frontier = (
        starts.crossJoin(
            F.broadcast(
                edges.sparkSession.range(walks_per_node).select(
                    F.col("id").alias("walk_id")
                )
            )
        )
        .select("walk_id", "start", F.col("start").alias("node"))
        .localCheckpoint(eager=True)
    )
    out = frontier.select(
        "walk_id", "start", F.lit(0).cast("int").alias("step"), "node"
    )
    for t in range(1, walk_len + 1):
        pick = (
            frontier.join(deg, frontier["node"] == deg["src"])
            .select(
                "walk_id",
                "start",
                "node",
                (
                    _hash60(
                        F.lit(seed), F.col("walk_id"), F.lit(t), F.col("node")
                    )
                    % F.col("deg")
                    + F.lit(1)
                ).alias("pick_rn"),
            )
        )
        frontier = (
            pick.join(
                adj,
                (pick["node"] == adj["src"]) & (pick["pick_rn"] == adj["rn"]),
            )
            .select("walk_id", "start", F.col("dst").alias("node"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            frontier.select(
                "walk_id", "start", F.lit(t).cast("int").alias("step"), "node"
            )
        )
    return out
