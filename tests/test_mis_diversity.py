"""Luby MIS (operators/mis.py) and corpus concentration metrics
(operators/diversity.py): MIS independence + maximality + equality
with the sequential greedy over the same priorities, isolated nodes,
the max_rounds raise; concentration replayed in pure integers."""

import hashlib

import pytest

from metal_history_knowledge_graph_spark.operators.diversity import (
    concentration_report,
    group_shares,
)
from metal_history_knowledge_graph_spark.operators.mis import (
    greedy_matching,
    luby_mis,
)


def _prio(v):
    return hashlib.md5(f"mis:{v}".encode()).hexdigest()


def _rand_edges(n, m, seed):
    import random

    rng = random.Random(seed)
    return list({
        (a, b)
        for a, b in (
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        )
        if a != b
    })


def greedy_mis(nodes, edges):
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    taken = set()
    for v in sorted(nodes, key=_prio):
        if not (adj[v] & taken):
            taken.add(v)
    return taken


def test_luby_equals_sequential_greedy(spark):
    edges = _rand_edges(60, 150, 3)
    nodes = set(range(60))
    df = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = {r.node for r in luby_mis(df, nodes=nd).collect()}
    assert got == greedy_mis(nodes, edges)


def test_independence_and_maximality(spark):
    edges = _rand_edges(80, 300, 9)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node for r in luby_mis(df).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in got:
        assert not (adj.get(v, set()) & got)  # independent
    for v in adj:
        assert v in got or (adj[v] & got)  # maximal


def test_isolated_nodes_join_round_one(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    nd = spark.createDataFrame([(5,), (6,)], "node long")
    rows = {r.node: r.mis_round for r in luby_mis(df, nodes=nd).collect()}
    assert rows[5] == 1 and rows[6] == 1
    assert (0 in rows) != (1 in rows)


def test_max_rounds_raise(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(RuntimeError, match="active nodes remain"):
        luby_mis(df, max_rounds=0)


def _edge_prio(a, b):
    return hashlib.md5(f"match:{a}|{b}".encode()).hexdigest()


def greedy_match_py(edges):
    canon = sorted(
        {(min(a, b), max(a, b)) for a, b in edges if a != b},
        key=lambda e: _edge_prio(*e),
    )
    used, out = set(), set()
    for a, b in canon:
        if a not in used and b not in used:
            out.add((a, b))
            used.update((a, b))
    return out


def test_matching_equals_sequential_greedy(spark):
    edges = _rand_edges(50, 160, 21)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.a, r.b) for r in greedy_matching(df).collect()}
    assert got == greedy_match_py(edges)


def test_matching_vertex_disjoint_and_maximal(spark):
    edges = _rand_edges(70, 250, 4)
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = greedy_matching(df).collect()
    used = [v for r in rows for v in (r.a, r.b)]
    assert len(used) == len(set(used))  # vertex-disjoint
    matched = set(used)
    for a, b in edges:  # maximal: no fully-unmatched edge remains
        if a != b:
            assert a in matched or b in matched


def test_matching_round_bound_raise(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(RuntimeError, match="active edges remain"):
        greedy_matching(df, max_rounds=0)


def test_group_shares_and_concentration(spark):
    rows = [("a", 60), ("a", 20), ("b", 15), ("c", 5), (None, 100)]
    df = spark.createDataFrame(rows, "source string, tokens int")
    shares = {
        r.group: (r.weight, r.share_ppm)
        for r in group_shares(df, "source", "tokens").collect()
    }
    assert shares == {
        "a": (80, 800_000),
        "b": (15, 150_000),
        "c": (5, 50_000),
    }
    rep = concentration_report(df, "source", "tokens", top_k=2).collect()[0]
    assert rep.n_groups == 3 and rep.total_weight == 100
    assert rep.top1_share_ppm == 800_000
    assert rep.top2_share_ppm == 950_000
    # simpson = (80^2 + 15^2 + 5^2) * 1e6 // 100^2 = 6650 * 100 = 665000
    assert rep.simpson_ppm == 665_000
    assert rep.effective_groups_milli == 1_000_000_000 // 665_000


def test_concentration_unweighted_counts(spark):
    rows = [("x",), ("x",), ("y",)]
    df = spark.createDataFrame(rows, "source string")
    rep = concentration_report(df, "source").collect()[0]
    assert rep.total_weight == 3
    assert rep.top1_share_ppm == 666_666
    assert rep.simpson_ppm == (4 + 1) * 1_000_000 // 9
