"""Katz centrality: pure-Python integer-trajectory replay and the
no-degree-division property that separates it from PageRank."""

from metal_history_knowledge_graph_spark.operators.graph_algos import (
    HITS_SCALE,
    katz,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "subj_id long, obj_id long"
    )


def _py_katz(pairs, n_iters=6, alpha_pct=20, scale=HITS_SCALE):
    e = sorted({(a, b) for a, b in pairs if a != b})
    nodes = sorted({x for p in e for x in p})
    x = {v: scale for v in nodes}
    for _ in range(n_iters):
        raw = {v: 0 for v in nodes}
        for u, v in e:
            raw[v] += x[u]
        x = {v: scale + alpha_pct * raw[v] // 100 for v in nodes}
    return x


PAIRS = [(0, 1), (1, 2), (2, 3), (3, 1), (4, 1), (0, 2), (2, 0)]


def test_matches_python_trajectory(spark):
    got = {
        r["node_id"]: r["katz_fixed"]
        for r in katz(_edges(spark, PAIRS)).collect()
    }
    assert got == _py_katz(PAIRS)


def test_full_strength_endorsement(spark):
    # hub 0 links both 1 and 2; single-purpose 10 links only 3.
    # Katz: 1, 2, 3 all receive the same one-hop mass (no out-degree
    # division) — the property that separates it from PageRank.
    pairs = [(0, 1), (0, 2), (10, 3)]
    got = {
        r["node_id"]: r["katz_fixed"]
        for r in katz(_edges(spark, pairs), n_iters=2).collect()
    }
    assert got[1] == got[2] == got[3]
    assert got[1] > got[0]  # sinks with an in-edge beat pure sources
