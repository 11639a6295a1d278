"""k-truss decomposition (graph_algos.truss_edges): clique/pendant
ground truths, cascading removal, equality with a brute-force
synchronous peel, the k-truss ⊆ (k−1)-core containment, partitioning
invariance, and the guard rails."""

import itertools

import pytest

from metal_history_knowledge_graph_spark.operators.graph_algos import (
    core_numbers,
    truss_edges,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "subj_id long, obj_id long")


def _truss_brute(pairs, k):
    """Synchronous peel in pure Python."""
    e = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        sup = {edge: 0 for edge in e}
        for x, y, z in itertools.combinations(
                sorted({n for p in e for n in p}), 3):
            if (x, y) in e and (x, z) in e and (y, z) in e:
                sup[(x, y)] += 1
                sup[(x, z)] += 1
                sup[(y, z)] += 1
        keep = {edge for edge in e if sup[edge] >= k - 2}
        if keep == e:
            return e
        e = keep


def _clique(nodes):
    return list(itertools.combinations(nodes, 2))


def test_two_cliques_with_pendants(spark):
    # two 4-cliques sharing node 3, pendant edges off nodes 0 and 10
    pairs = _clique([0, 1, 2, 3]) + _clique([3, 10, 11, 12]) + [
        (0, 99), (10, 98)]
    out = {(r.a, r.b) for r in truss_edges(_df(spark, pairs), k=4).collect()}
    assert out == set(_clique([0, 1, 2, 3])) | set(_clique([3, 10, 11, 12]))
    # k=3 keeps every triangle edge, still drops the pendants
    out3 = {(r.a, r.b) for r in truss_edges(_df(spark, pairs), k=3).collect()}
    assert out3 == out | set()
    assert (0, 99) not in out3 and (10, 98) not in out3


def test_cascade(spark):
    # triangle strip 0-1-2, 1-2-3, 2-3-4: end edges have support 1,
    # middle edges 2 — under k=4 the first synchronous round removes
    # the support-1 edges, which drops the middle below threshold and
    # the whole strip cascades to empty
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    out = truss_edges(_df(spark, pairs), k=4).collect()
    assert out == []
    assert _truss_brute(pairs, 4) == set()


def test_matches_brute_force(spark):
    # deterministic pseudo-random graph: edge (i, j) iff hash-ish rule
    pairs = [
        (i, j)
        for i in range(24)
        for j in range(i + 1, 24)
        if (i * 7 + j * 13 + i * j) % 5 < 2
    ]
    df = _df(spark, pairs)
    for k in (3, 4, 5):
        got = {(r.a, r.b) for r in truss_edges(df, k=k).collect()}
        assert got == _truss_brute(pairs, k), f"k={k}"


def test_truss_inside_core(spark):
    pairs = [
        (i, j)
        for i in range(24)
        for j in range(i + 1, 24)
        if (i * 3 + j * 11 + i * j) % 4 < 2
    ]
    df = _df(spark, pairs)
    truss = truss_edges(df, k=4)
    cores = {
        r.node_id: r.core for r in core_numbers(df, n_rounds=15).collect()
    }
    for r in truss.collect():
        assert cores[r.a] >= 3 and cores[r.b] >= 3


def test_partitioning_invariance(spark):
    pairs = [
        (i, j)
        for i in range(20)
        for j in range(i + 1, 20)
        if (i + j * j) % 3 == 0
    ]
    a = sorted(map(tuple, truss_edges(
        _df(spark, pairs).repartition(1), k=3).collect()))
    b = sorted(map(tuple, truss_edges(
        _df(spark, pairs).repartition(13), k=3).collect()))
    assert a == b


def test_guards(spark):
    df = _df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        truss_edges(df, k=2)
    # non-convergence raises instead of returning an upper bound:
    # a long cascade cannot finish in 1 round
    strip = [(i, i + 1) for i in range(8)] + [(i, i + 2) for i in range(7)]
    with pytest.raises(RuntimeError):
        truss_edges(_df(spark, strip), k=4, n_rounds=1)
