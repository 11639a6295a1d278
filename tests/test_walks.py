"""random_walks (hash-deterministic DeepWalk corpus): pinned against
a pure-Python replay of the md5 transition rule on seeded random
digraphs; sink truncation; walk-id divergence; partition
invariance."""

import hashlib
import random

import pytest

from metal_history_knowledge_graph_spark.operators.walks import (
    random_walks,
    ranked_adjacency,
)


def _h60(seed, walk_id, t, node):
    s = f"{seed}|{walk_id}|{t}|{node}".encode()
    return int(hashlib.md5(s).hexdigest()[:15], 16)


def _brute_walks(edges, walk_len, walks_per_node, seed="w"):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
    adj = {v: sorted(ns) for v, ns in adj.items()}
    rows = set()
    for start in adj:
        for w in range(walks_per_node):
            node = start
            rows.add((w, start, 0, node))
            for t in range(1, walk_len + 1):
                ns = adj.get(node)
                if not ns:
                    break  # sink: walk truncates
                node = ns[_h60(seed, w, t, node) % len(ns)]
                rows.add((w, start, t, node))
    return rows


def _spark_walks(spark, edges, walk_len=4, walks_per_node=2):
    df = spark.createDataFrame(edges, "subj_id long, obj_id long")
    return {
        (r.walk_id, r.start, r.step, r.node)
        for r in random_walks(
            df, walk_len=walk_len, walks_per_node=walks_per_node
        ).collect()
    }


def test_random_digraphs_vs_reference(spark):
    rng = random.Random(5)
    for p in (0.08, 0.25):
        edges = [
            (a, b)
            for a in range(30)
            for b in range(30)
            if a != b and rng.random() < p
        ]
        got = _spark_walks(spark, edges)
        assert got == _brute_walks(edges, 4, 2), p


def test_sink_truncation_and_ranked_adjacency(spark):
    """0→1→2, 2 is a sink: both walks stop at step 2; duplicate and
    self-loop edges don't inflate ranks."""
    edges = [(0, 1), (0, 1), (1, 2), (2, 2)]
    df = spark.createDataFrame(edges, "subj_id long, obj_id long")
    adj = {(r.src, r.dst): r.rn for r in ranked_adjacency(df).collect()}
    assert adj == {(0, 1): 1, (1, 2): 1}
    got = _spark_walks(spark, edges, walk_len=5, walks_per_node=1)
    assert got == {(0, 0, 0, 0), (0, 0, 1, 1), (0, 0, 2, 2),
                   (0, 1, 0, 1), (0, 1, 1, 2)}


def test_walk_ids_diverge(spark):
    """With several neighbours per node, replica walks must not all
    follow the same trajectory (the walk id feeds the hash)."""
    edges = [(a, b) for a in range(8) for b in range(8) if a != b]
    df = spark.createDataFrame(edges, "subj_id long, obj_id long")
    rows = random_walks(df, walk_len=6, walks_per_node=4).collect()
    traj = {}
    for r in rows:
        traj.setdefault((r.start, r.walk_id), {})[r.step] = r.node
    starts = {s for s, _ in traj}
    diverged = sum(
        len({tuple(traj[(s, w)][t] for t in sorted(traj[(s, w)]))
             for w in range(4)}) > 1
        for s in starts
    )
    assert diverged >= len(starts) - 1


def test_partition_invariance_and_guards(spark):
    rng = random.Random(9)
    edges = [
        (a, b)
        for a in range(20)
        for b in range(20)
        if a != b and rng.random() < 0.2
    ]
    df = spark.createDataFrame(edges, "subj_id long, obj_id long")
    a = sorted(map(tuple, random_walks(df, 3, 2).collect()))
    b = sorted(map(tuple, random_walks(df.repartition(11), 3, 2).collect()))
    assert a == b
    with pytest.raises(ValueError, match="walk_len"):
        random_walks(df, walk_len=0)
    with pytest.raises(ValueError, match="walks_per_node"):
        random_walks(df, walks_per_node=0)
