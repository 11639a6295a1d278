"""Path-analysis operators (graph_metrics.py:324-404 family):
node-simple path enumeration, longest named chains, sampled
shortest-path-length distribution. Each Spark result is checked
against an independent pure-python reference on handcrafted graphs."""

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.graph_algos import (
    longest_chains,
    path_enumeration,
    path_length_distribution,
)


def _dfs_paths(edges: list[tuple[int, int]], max_hops: int,
               roots: set[int] | None = None) -> set[tuple[int, ...]]:
    """Independent reference: enumerate node-simple directed paths."""
    adj: dict[int, list[int]] = {}
    for s, d in set(edges):
        if s != d:
            adj.setdefault(s, []).append(d)
    out: set[tuple[int, ...]] = set()

    def walk(path: tuple[int, ...]):
        if len(path) - 1 >= max_hops:
            return
        for nxt in adj.get(path[-1], []):
            if nxt in path:
                continue
            out.add(path + (nxt,))
            walk(path + (nxt,))

    for start in adj:
        if roots is None or start in roots:
            walk((start,))
    return out


def test_path_enumeration_matches_dfs_on_cyclic_graph(spark):
    # 1→2→3→1 cycle plus branches; cycle must stop path growth
    edges = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 5), (1, 2)]  # dup edge too
    pairs = spark.createDataFrame(edges, "src long, dst long")
    got = {
        tuple(r.path)
        for r in path_enumeration(pairs, max_hops=4).collect()
    }
    assert got == _dfs_paths(edges, max_hops=4)
    # hops column == len(path)-1 and src/dst match path endpoints
    for r in path_enumeration(pairs, max_hops=4).collect():
        assert r.hops == len(r.path) - 1
        assert r.path[0] == r.src and r.path[-1] == r.dst


def test_path_enumeration_roots_restrict_start_nodes(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    pairs = spark.createDataFrame(edges, "src long, dst long")
    roots = spark.createDataFrame([(2,)], "src long")
    got = {tuple(r.path) for r in
           path_enumeration(pairs, max_hops=3, roots=roots).collect()}
    assert got == _dfs_paths(edges, max_hops=3, roots={2})
    assert all(p[0] == 2 for p in got)


def test_longest_chains_names_and_order(spark):
    rows = [
        ("INFLUENCED_BY", 1, "A", 2, "B"),
        ("INFLUENCED_BY", 2, "B", 3, "C"),
        ("INFLUENCED_BY", 3, "C", 4, "D"),
        ("MEMBER_OF", 1, "A", 9, "Z"),  # other predicate ignored
    ]
    edges = spark.createDataFrame(
        rows, "pred string, subj_id long, subj_name string, obj_id long, obj_name string"
    )
    out = longest_chains(edges, pred="INFLUENCED_BY", max_hops=3, top_n=3).collect()
    assert [r.hops for r in out] == [3, 2, 2]
    assert out[0].chain == ["A", "B", "C", "D"]
    assert out[0].chain_str == "A -> B -> C -> D"
    assert {r.chain_str for r in out[1:]} == {"A -> B -> C", "B -> C -> D"}


def test_path_length_distribution_line_graph(spark):
    # undirected line 0-1-2-3: pairs (node>root): hops1 x3, hops2 x2, hops3 x1
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "subj_id long, obj_id long"
    )
    got = {r.hops: r.n_pairs for r in path_length_distribution(edges).collect()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_path_length_distribution_respects_max_hops_and_sample(spark):
    # line 0-1-2-3-4, only 2 sources (0,1), max 2 hops:
    # root 0: (0,1)=1 (0,2)=2 ; root 1: (1,2)=1 (1,3)=2  → hops1:2, hops2:2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "subj_id long, obj_id long"
    )
    got = {
        r.hops: r.n_pairs
        for r in path_length_distribution(edges, n_sources=2, max_hops=2).collect()
    }
    assert got == {1: 2, 2: 2}
