"""label_propagation (synchronous LPA community detection): pinned
against a pure-Python synchronous reference with the identical
min-label tie-break on seeded random graphs; planted two-clique
recovery; symmetrization and partition invariance."""

from pyspark.sql import functions as F
import itertools
import random

from metal_history_knowledge_graph_spark.operators.graph_algos import (
    label_propagation,
)


def _brute_lpa(edges, n_rounds):
    """Synchronous LPA, most-frequent neighbour label, ties → min."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(n_rounds):
        nxt = {}
        for v, ns in adj.items():
            counts = {}
            for u in ns:
                counts[lab[u]] = counts.get(lab[u], 0) + 1
            nxt[v] = min(counts, key=lambda l: (-counts[l], l))
        lab = nxt
    return lab


def _spark_lpa(spark, edges, n_rounds=8):
    df = spark.createDataFrame(edges, "subj_id long, obj_id long")
    return {
        r["node_id"]: r["community"]
        for r in label_propagation(df, n_rounds=n_rounds).collect()
    }


def test_two_cliques_with_bridge(spark):
    """Two 6-cliques joined by one bridge edge: each clique floods to
    its min node id and the bridge does not merge them."""
    c1 = list(itertools.combinations(range(6), 2))
    c2 = list(itertools.combinations(range(10, 16), 2))
    edges = c1 + c2 + [(5, 10)]
    got = _spark_lpa(spark, edges, n_rounds=6)
    assert {got[v] for v in range(6)} == {0}
    assert {got[v] for v in range(10, 16)} == {10}


def test_random_graphs_vs_reference(spark):
    """Seeded G(n,p) graphs at three densities and two round counts —
    the Spark trajectory must equal the synchronous reference on
    every node at the SAME round (oscillation included)."""
    rng = random.Random(7)
    for p in (0.08, 0.2, 0.4):
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(30), 2)
            if rng.random() < p
        ]
        for n_rounds in (3, 8):
            assert _spark_lpa(spark, edges, n_rounds) == _brute_lpa(
                edges, n_rounds
            ), (p, n_rounds)


def test_directed_duplicates_symmetrized(spark):
    """(a,b), (b,a) and repeats count as ONE undirected edge — vote
    counts must not double."""
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 3), (3, 2), (2, 3)]
    got = _spark_lpa(spark, edges, n_rounds=4)
    assert got == _brute_lpa(edges, 4)


def test_partition_invariance(spark):
    rng = random.Random(3)
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(25), 2)
        if rng.random() < 0.15
    ]
    df = spark.createDataFrame(edges, "subj_id long, obj_id long")
    a = sorted(map(tuple, label_propagation(df, n_rounds=5).collect()))
    b = sorted(
        map(tuple, label_propagation(df.repartition(13), n_rounds=5).collect())
    )
    assert a == b


def test_modularity_known_values(spark):
    from metal_history_knowledge_graph_spark.operators.graph_algos import (
        modularity_4m2,
    )

    # two triangles joined by one bridge edge; perfect 2-community split
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)],
        "subj_id long, obj_id long",
    )
    assign = spark.createDataFrame(
        [(i, 0 if i < 3 else 3) for i in range(6)],
        "node_id long, community long",
    )
    r = modularity_4m2(e, assign).collect()[0]
    # m=7; community A: mc=3, Dc=7; B: mc=3, Dc=7
    # Q*4m^2 = 2*(4*7*3 - 49) = 70  (Q = 70/196 = 0.357)
    assert (r.q_4m2, r.m_edges, r.n_communities) == (70, 7, 2)
    # everything in one community: Q = 0 exactly
    one = assign.select("node_id", F.lit(0).alias("community"))
    assert modularity_4m2(e, one).collect()[0].q_4m2 == 0


def test_modularity_counts_reversed_duplicates_once(spark):
    from metal_history_knowledge_graph_spark.operators.graph_algos import (
        modularity_4m2,
    )

    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2)], "subj_id long, obj_id long"
    )
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0)], "node_id long, community long"
    )
    assert modularity_4m2(e, assign).collect()[0].m_edges == 2
