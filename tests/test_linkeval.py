"""Link-prediction eval harness: negative-sample determinism +
non-edge guarantees, and the exact rank-sum AUC against a pure-Python
replay (including perfect / inverted / random endpoints)."""

import hashlib

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.linkeval import (
    auc_ppm,
    negative_edges,
)

PAIRS = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2), (1, 3)]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "subj_id long, obj_id long"
    )


def test_negative_edges_are_nonedges_and_deterministic(spark):
    e = _edges(spark, PAIRS)
    got1 = {(r["src"], r["dst"]) for r in negative_edges(e, per_node=6).collect()}
    got2 = {(r["src"], r["dst"]) for r in negative_edges(e, per_node=6).collect()}
    assert got1 == got2 and got1
    assert got1.isdisjoint(set(PAIRS))
    # reverse of a real edge is NOT a negative (undirected scorers)
    assert got1.isdisjoint({(b, a) for a, b in PAIRS})
    assert all(a != b for a, b in got1)
    nodes = {x for p in PAIRS for x in p}
    assert all(a in nodes and b in nodes for a, b in got1)


def test_negative_edges_python_replay(spark):
    e = _edges(spark, PAIRS)
    nodes = sorted({x for p in PAIRS for x in p})
    n = len(nodes)
    undirected = set(PAIRS) | {(b, a) for a, b in PAIRS}
    want = set()
    for v in nodes:
        for t in range(6):
            h = int(hashlib.md5(f"{v}|{t}".encode()).hexdigest()[:15], 16)
            d = nodes[h % n]
            if d != v and (v, d) not in undirected:
                want.add((v, d))
    got = {(r["src"], r["dst"]) for r in negative_edges(e, per_node=6).collect()}
    assert got == want


def test_sample_cut_is_md5_ranked(spark):
    e = _edges(spark, PAIRS)
    full = {(r["src"], r["dst"]) for r in negative_edges(e, per_node=6).collect()}
    cut = [(r["src"], r["dst"]) for r in negative_edges(e, per_node=6, sample=3).collect()]
    assert len(cut) == 3 and set(cut) <= full
    ranked = sorted(full, key=lambda p: hashlib.md5(f"{p[0]}|{p[1]}".encode()).hexdigest())
    assert set(cut) == set(ranked[:3])


def _scored(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, score long, label int")


def test_auc_endpoints(spark):
    perfect = [(i, 0, 100 + i, 1) for i in range(5)] + [
        (i, 1, i, 0) for i in range(5)
    ]
    row = auc_ppm(_scored(spark, perfect)).collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc_ppm"]) == (5, 5, 1000000)
    inverted = [(i, 0, i, 1) for i in range(5)] + [
        (i, 1, 100 + i, 0) for i in range(5)
    ]
    assert auc_ppm(_scored(spark, inverted)).collect()[0]["auc_ppm"] == 0


def test_auc_python_replay(spark):
    rows = [(i, j, (i * 7 + j * 13) % 23, 1 if (i + j) % 3 == 0 else 0)
            for i in range(6) for j in range(6) if i != j]
    got = auc_ppm(_scored(spark, rows)).collect()[0]
    ordered = sorted(rows, key=lambda r: (r[2], r[0], r[1]))
    ranks = {(r[0], r[1]): k + 1 for k, r in enumerate(ordered)}
    pos = [r for r in rows if r[3] == 1]
    neg = [r for r in rows if r[3] == 0]
    rs = sum(ranks[(r[0], r[1])] for r in pos)
    p, q = len(pos), len(neg)
    want = (rs - p * (p + 1) // 2) * 10**6 // (p * q)
    assert (got["n_pos"], got["n_neg"], got["auc_ppm"]) == (p, q, want)


def test_score_common_neighbors(spark):
    from metal_history_knowledge_graph_spark.operators.linkeval import (
        score_common_neighbors,
    )

    # square 0-1-2-3-0 plus diagonal hub 4 linked to all
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0),
                       (4, 0), (4, 1), (4, 2), (4, 3)])
    pairs = spark.createDataFrame(
        [(0, 2, 1), (0, 1, 1), (1, 3, 0)], "src long, dst long, label int"
    )
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in score_common_neighbors(pairs, e).collect()
    }
    # N(0)={1,3,4} N(2)={1,3,4} -> 3; N(0)∩N(1)={4} -> 1;
    # N(1)={0,2,4} N(3)={0,2,4} -> 3
    assert got == {(0, 2): 3, (0, 1): 1, (1, 3): 3}
