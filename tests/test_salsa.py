"""SALSA: pure-Python integer-trajectory replay plus the TKC
(link-farm) resistance property that separates it from HITS."""

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.graph_algos import (
    HITS_SCALE,
    hits,
    salsa,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "subj_id long, obj_id long"
    )


def _py_salsa(pairs, n_iters=5, scale=HITS_SCALE):
    e = sorted({(a, b) for a, b in pairs if a != b})
    nodes = sorted({x for p in e for x in p})
    outdeg, indeg = {}, {}
    for a, b in e:
        outdeg[a] = outdeg.get(a, 0) + 1
        indeg[b] = indeg.get(b, 0) + 1
    h = {v: scale // len(nodes) for v in nodes}
    a_ = {v: 0 for v in nodes}
    for _ in range(n_iters):
        a_ = {v: 0 for v in nodes}
        for u, v in e:
            a_[v] += h[u] // outdeg[u]
        h = {v: 0 for v in nodes}
        for u, v in e:
            h[u] += a_[v] // indeg[v]
    return {v: (h[v], a_[v]) for v in nodes}


PAIRS = [
    (0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (4, 2), (4, 3), (5, 0),
]


def test_matches_python_trajectory(spark):
    got = {
        r["node_id"]: (r["hub_fixed"], r["auth_fixed"])
        for r in salsa(_edges(spark, PAIRS)).collect()
    }
    assert got == _py_salsa(PAIRS)


def test_link_farm_resistance(spark):
    # organic community: 10 hubs × 10 targets, complete bipartite.
    organic = [(h, 100 + t) for h in range(10) for t in range(10)]
    # farm community: 30 hubs × 5 targets, complete bipartite — the
    # classic TKC construction (larger principal eigenvalue
    # sqrt(150) > sqrt(100), so HITS mass collapses onto it).
    farm = [(200 + i, 900 + t) for i in range(30) for t in range(5)]
    pairs = organic + farm
    s = {
        r["node_id"]: r["auth_fixed"]
        for r in salsa(_edges(spark, pairs)).collect()
    }
    k = {
        r["node_id"]: r["auth_fixed"]
        for r in hits(_edges(spark, pairs)).collect()
    }
    # HITS: farm target authority EXPLODES relative to organic
    # ((150/100)^5 ≈ 7.6× amplification on top of the 6× in-degree).
    # SALSA: degree division pins the ratio at the in-degree share
    # (30/5 vs 10/10 per unit hub mass = 6×), no amplification.
    # measured at 5 iters: HITS ratio 15.2 (and growing per iter),
    # SALSA ratio 6.000 — exactly the in-degree share, no growth
    assert k[900] > 12 * k[100]
    assert s[900] < 7 * s[100]
    assert 5 * s[100] < s[900]  # in-degree signal itself is kept


def test_empty_graph(spark):
    assert salsa(_edges(spark, [(1, 1)])).count() == 0
