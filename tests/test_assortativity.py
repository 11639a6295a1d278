"""degree_assortativity: exact-integer sufficient statistics pinned
against a pure-Python replay; sign sanity on canonical graphs (star
= −1, disjoint unequal cliques = +1); degenerate-variance NULL."""

import itertools
import random

from metal_history_knowledge_graph_spark.operators.graph_algos import (
    degree_assortativity,
)


def _brute(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    stubs = [(deg[a], deg[b]) for a in adj for b in adj[a]]
    m = len(stubs)
    sx = sum(x for x, _ in stubs)
    sxy = sum(x * y for x, y in stubs)
    sx2 = sum(x * x for x, _ in stubs)
    num, den = m * sxy - sx * sx, m * sx2 - sx * sx
    r_ppm = None if den == 0 else (
        (1 if num > 0 else -1 if num < 0 else 0)
        * ((1_000_000 * abs(num)) // den)
    )
    return (m, sx, sxy, sx2, num, den, r_ppm)


def _spark(spark, edges):
    df = spark.createDataFrame(edges, "subj_id long, obj_id long")
    r = degree_assortativity(df).collect()[0]
    return (r.m_stubs, r.s_x, r.s_xy, r.s_x2, r.num, r.den, r.r_ppm)


def test_star_is_disassortative(spark):
    edges = [(0, i) for i in range(1, 8)]
    got = _spark(spark, edges)
    assert got == _brute(edges)
    assert got[6] == -1_000_000  # star: exactly −1


def test_unequal_cliques_are_assortative(spark):
    c1 = list(itertools.combinations(range(4), 2))
    c2 = list(itertools.combinations(range(10, 17), 2))
    got = _spark(spark, c1 + c2)
    assert got == _brute(c1 + c2)
    assert got[6] == 1_000_000  # equal-degree endpoints everywhere


def test_equal_degree_everywhere_is_null(spark):
    """A single triangle: zero degree variance → den = 0 → NULL."""
    got = _spark(spark, [(0, 1), (1, 2), (2, 0)])
    assert got[5] == 0 and got[6] is None


def test_random_graphs_vs_reference(spark):
    rng = random.Random(13)
    for p in (0.1, 0.3):
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(30), 2)
            if rng.random() < p
        ]
        assert _spark(spark, edges) == _brute(edges), p


def test_direction_and_duplicates_ignored(spark):
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 3)]
    assert _spark(spark, edges) == _brute(edges)
