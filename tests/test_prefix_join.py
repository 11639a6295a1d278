"""prefix_filter_pairs (exact All-Pairs/PPJoin set-similarity join):
recall is EXACT by construction — pinned here against a brute-force
Python baseline on seeded random corpora plus hand-built boundary
cases, and the plan is checked for no cartesian product."""

import itertools
import random

from metal_history_knowledge_graph_spark.operators.dedup import (
    prefix_filter_pairs,
)


def _brute(docs, t):
    sets = {i: set(s.lower().split()) for i, s in docs if s and s.split()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if jac >= t:
            out[(a, b)] = round(jac, 4)
    return out


def _spark_pairs(spark, docs, t):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_filter_pairs(df, threshold=t).collect()
    }


def test_exact_vs_bruteforce_random(spark):
    """200 seeded random docs over a small vocabulary (forces heavy
    overlap, boundary jaccards, ties in the frequency order): the
    prefix-filtered result must EQUAL brute force at two thresholds."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.sample(vocab, rng.randint(1, 12))))
        for i in range(200)
    ]
    for t in (0.5, 0.8):
        assert _spark_pairs(spark, docs, t) == _brute(docs, t), t


def test_boundary_and_degenerate_cases(spark):
    docs = [
        (0, "a b c d"),          # vs 1: inter 3 / union 6 = 0.5
        (1, "a b c e f"),
        (2, "a b c d"),          # identical to 0 → 1.0
        (3, "zz"),               # singleton, no partner
        (4, ""),                 # empty → excluded
        (5, None),               # NULL → excluded
        (6, "x y"),              # vs 7: inter 1 / union 3 = 0.3333 < t
        (7, "x q"),
    ]
    got = _spark_pairs(spark, docs, 0.5)
    assert got == _brute(docs, 0.5)
    assert got[(0, 2)] == 1.0 and got[(0, 1)] == 0.5
    assert (6, 7) not in got


def test_exact_threshold_hit(spark):
    """A pair landing EXACTLY on the threshold (J = 0.5) must be
    returned — the unrounded ≥ filter, not a strict >."""
    docs = [(0, "a b c d"), (1, "a b e f")]  # inter 2 / union 6 → no
    docs2 = [(0, "a b c"), (1, "a b c d e f")]  # inter 3 / union 6 = 0.5
    assert _spark_pairs(spark, docs2, 0.5) == {(0, 1): 0.5}
    assert _spark_pairs(spark, docs, 0.5) == {}


def test_no_cartesian_in_plan(spark):
    docs = [(i, f"w{i} w{i+1} common") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    plan = (
        prefix_filter_pairs(df, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_group_representatives_transitive_and_total(spark):
    """pairs → O(docs) decision table: transitive closure groups A~B~C
    even when A,C were never emitted as a pair; rep = min id; keep
    marks exactly one doc per group; singletons from ``docs`` appear
    as kept groups of size 1."""
    from metal_history_knowledge_graph_spark.operators.dedup import (
        group_representatives,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 42)], "doc_id long"
    )
    rows = {r.doc_id: r for r in group_representatives(pairs, docs=docs).collect()}
    assert set(rows) == {1, 2, 3, 10, 11, 42}
    # transitive group 1-2-3: rep 1, size 3, only 1 kept
    assert all(rows[d].rep_id == 1 and rows[d].group_size == 3 for d in (1, 2, 3))
    assert [rows[d].keep for d in (1, 2, 3)] == [True, False, False]
    # pair group 10-11
    assert rows[10].rep_id == 10 and rows[11].rep_id == 10
    assert rows[10].group_size == 2 and rows[10].keep and not rows[11].keep
    # singleton 42: its own kept group of size 1
    assert rows[42].rep_id == 42 and rows[42].group_size == 1 and rows[42].keep
    # without docs, the verdict covers only paired ids
    paired = group_representatives(pairs).collect()
    assert {r.doc_id for r in paired} == {1, 2, 3, 10, 11}
    # exactly one keeper per group, always
    keeps = [r for r in paired if r.keep]
    assert sorted(r.doc_id for r in keeps) == [1, 10]
