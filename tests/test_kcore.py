"""core_numbers (h-index-iteration k-core decomposition): pinned
against the classic sequential peeling algorithm on seeded random
graphs and hand-built core structures; the non-convergence guard
raises instead of returning upper bounds."""

import itertools
import random

import pytest

from metal_history_knowledge_graph_spark.operators.graph_algos import (
    core_numbers,
)


def _brute_cores(edges):
    """Sequential min-degree peeling — the textbook exact algorithm."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    remaining = set(adj)
    core, k = {}, 0
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        remaining.remove(v)
        for u in adj[v]:
            if u in remaining:
                deg[u] -= 1
    return core


def _spark_cores(spark, edges, n_rounds=15):
    df = spark.createDataFrame(edges, "subj_id long, obj_id long")
    return {
        r["node_id"]: r["core"]
        for r in core_numbers(df, n_rounds=n_rounds).collect()
    }


def test_clique_plus_path_plus_pendant(spark):
    """5-clique (core 4) bridged to a path (core 1) with a pendant."""
    clique = list(itertools.combinations(range(5), 2))
    path = [(4, 10), (10, 11), (11, 12)]
    pendant = [(12, 99)]
    edges = clique + path + pendant
    got = _spark_cores(spark, edges)
    assert got == _brute_cores(edges)
    assert got[0] == 4 and got[10] == 1 and got[99] == 1


def test_random_graphs_vs_peeling(spark):
    """Seeded G(n,p) graphs at three densities — h-index fixed point
    must equal sequential peeling on every node."""
    rng = random.Random(11)
    for p in (0.05, 0.15, 0.35):
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(40), 2)
            if rng.random() < p
        ]
        assert _spark_cores(spark, edges) == _brute_cores(edges), p


def test_directed_input_symmetrized(spark):
    """Direction and duplicate edges must not matter: (a,b) and (b,a)
    plus repeats count as ONE undirected edge."""
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 0)]
    got = _spark_cores(spark, edges)
    assert got == {0: 2, 1: 2, 2: 2}


def test_nonconvergence_raises(spark):
    """A 12-node path needs ~5 H-rounds; n_rounds=2 must RAISE, not
    return the still-decreasing upper bounds."""
    edges = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(edges, "subj_id long, obj_id long")
    with pytest.raises(RuntimeError, match="still changing"):
        core_numbers(df, n_rounds=2).collect()
