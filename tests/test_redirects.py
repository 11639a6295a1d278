"""Redirect-chain resolution: hand-built chains/loops plus a pure-
Python follow() cross-check on a deterministic pseudo-random
functional graph, and the repointed-link-graph semantics."""

import hashlib

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.redirects import (
    repoint_edges,
    resolve_redirects,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


# chain a->b->c->T ; loop l1->l2->l1 ; self s->s ; long chain
# c0->c1->...->c6->CT (7 hops); aliases x,y -> z -> w
HAND = (
    [("a", "b"), ("b", "c"), ("c", "T")]
    + [("l1", "l2"), ("l2", "l1"), ("s", "s")]
    + [(f"c{i}", f"c{i+1}") for i in range(6)]
    + [("c6", "CT")]
    + [("x", "z"), ("y", "z"), ("z", "w")]
)


def _got(spark, max_hops):
    return {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(_edges(spark, HAND), max_hops=max_hops).collect()
    }


def test_hand_graph(spark):
    got = _got(spark, max_hops=20)
    assert got["a"] == ("T", 3, True)
    assert got["b"] == ("T", 2, True)
    assert got["c"] == ("T", 1, True)
    assert got["l1"] == (None, None, False)
    assert got["l2"] == (None, None, False)
    assert got["s"] == (None, None, False)
    assert got["c0"] == ("CT", 7, True)
    assert got["x"] == ("w", 2, True)
    assert got["z"] == ("w", 1, True)


def test_hop_cap_is_exact(spark):
    # chain c0..c6->CT is 7 hops: cap 7 resolves the head, cap 6 cuts it
    assert _got(spark, max_hops=7)["c0"] == ("CT", 7, True)
    at6 = _got(spark, max_hops=6)
    assert at6["c0"] == (None, None, False)
    assert at6["c1"] == ("CT", 6, True)  # one closer → inside the cap


def test_duplicate_targets_collapse_to_min(spark):
    # same src recorded with two targets across fetches → min wins
    got = {
        r["url"]: r["final_url"]
        for r in resolve_redirects(
            _edges(spark, [("a", "q"), ("a", "b"), ("b", "T")])
        ).collect()
    }
    assert got["a"] == "T"  # min("b","q") = "b" → T


def _py_follow(rmap, url, max_hops):
    cur, hops = rmap[url], 1
    while cur in rmap and hops <= max_hops:
        cur = rmap[cur]
        hops += 1
    if cur in rmap or hops > max_hops:
        return (None, None, False)
    return (cur, hops, True)


def test_random_functional_graph_matches_python(spark):
    # deterministic pseudo-random successor: next = sha1 of the node,
    # folded into a 60-node space; ~half the nodes are sources
    nodes = [f"n{i}" for i in range(60)]
    rmap = {}
    for i, u in enumerate(nodes):
        h = int(hashlib.sha1(u.encode()).hexdigest(), 16)
        if h % 2 == 0:
            rmap[u] = nodes[h % 60]
    pairs = sorted(rmap.items())
    for cap in (1, 3, 20):
        got = {
            r["url"]: (r["final_url"], r["hops"], r["resolved"])
            for r in resolve_redirects(
                _edges(spark, pairs), max_hops=cap
            ).collect()
        }
        want = {u: _py_follow(rmap, u, cap) for u in rmap}
        assert got == want


def test_repoint_edges(spark):
    res = resolve_redirects(_edges(spark, HAND), max_hops=20)
    links = _edges(
        spark,
        [
            ("P", "a"),  # into a chain head → P->T
            ("a", "P"),  # alias as SOURCE endpoint → T->P
            ("P", "l1"),  # into a loop → dropped
            ("P", "Q"),  # untouched
            ("x", "y"),  # both endpoints aliases of w → self-link, dropped
            ("P", "T"),  # direct, collides with repointed P->a
        ],
    )
    got = {
        (r["src"], r["dst"])
        for r in repoint_edges(links, res).collect()
    }
    assert got == {("P", "T"), ("T", "P"), ("P", "Q")}
    kept = {
        (r["src"], r["dst"])
        for r in repoint_edges(links, res, drop_unresolved=False).collect()
    }
    assert ("P", "l1") in kept


def test_plan_no_cartesian_and_bounded_joins(spark):
    plan = resolve_redirects(
        _edges(spark, HAND), max_hops=20
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bad_max_hops_raises(spark):
    with pytest.raises(ValueError):
        resolve_redirects(_edges(spark, HAND), max_hops=0)
