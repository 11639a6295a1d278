"""TextRank: co-occurrence graph construction pins plus a pure-Python
replay of the integer weighted-PageRank trajectory on a hand corpus."""

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.textrank import (
    cooccurrence_edges,
    textrank_keywords,
)

DOCS = [
    (0, "spark shuffles Data data spark shuffles"),
    (1, "data pipelines move data  data"),
    (2, "spark spark spark"),  # immediate repeats only → no edges
    (3, ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_cooccurrence_edges(spark):
    got = {
        (r["a"], r["b"]): r["weight"]
        for r in cooccurrence_edges(_df(spark)).collect()
    }
    # doc0: (shuffles,spark) x2, (data,shuffles), (data,data)->drop,
    #       (data,spark)
    # doc1: (data,pipelines), (move,pipelines), (data,move), (data,data)->drop
    assert got == {
        ("shuffles", "spark"): 2,
        ("data", "shuffles"): 1,
        ("data", "spark"): 1,
        ("data", "pipelines"): 1,
        ("move", "pipelines"): 1,
        ("data", "move"): 1,
    }


def _py_textrank(edges, n_iters=5, damping=85, scale=10**12):
    sym = {}
    for (a, b), w in edges.items():
        sym[(a, b)] = sym.get((a, b), 0) + w
        sym[(b, a)] = sym.get((b, a), 0) + w
    nodes = sorted({u for u, _ in sym} | {v for _, v in sym})
    n = len(nodes)
    wtot = {}
    for (u, _), w in sym.items():
        wtot[u] = wtot.get(u, 0) + w
    r = {u: scale // n for u in nodes}
    teleport = (100 - damping) * scale // (100 * n)
    for _ in range(n_iters):
        contrib = {u: 0 for u in nodes}
        for (u, v), w in sym.items():
            contrib[v] += (r[u] // wtot[u]) * w
        r = {u: teleport + damping * contrib[u] // 100 for u in nodes}
    return r


def test_matches_python_trajectory(spark):
    edges = {
        (r["a"], r["b"]): r["weight"]
        for r in cooccurrence_edges(_df(spark)).collect()
    }
    want = _py_textrank(edges)
    got = {
        r["term"]: r["rank_fixed"]
        for r in textrank_keywords(_df(spark), k=100).collect()
    }
    assert got == want


def test_topk_tiebreak_and_plan(spark):
    q = textrank_keywords(_df(spark), k=3)
    rows = q.collect()
    assert len(rows) == 3
    ranks = [(r["rank_fixed"], r["term"]) for r in rows]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_merge_equals_rebuild(spark):
    from metal_history_knowledge_graph_spark.operators.textrank import (
        merge_cooccurrence,
    )

    old = _df(spark).filter("doc_id < 2")
    new = _df(spark).filter("doc_id >= 2")
    merged = {
        (r["a"], r["b"]): r["weight"]
        for r in merge_cooccurrence(cooccurrence_edges(old), new).collect()
    }
    full = {
        (r["a"], r["b"]): r["weight"]
        for r in cooccurrence_edges(_df(spark)).collect()
    }
    assert merged == full
