"""FastSS deletion-neighborhood fuzzy join (operators/fuzzy_join):
exhaustive losslessness vs a brute-force Levenshtein DP, depth-2
completeness, partitioning invariance, and the no-CartesianProduct
plan gate."""

import itertools

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.fuzzy_join import (
    deletion_neighborhood,
    fuzzy_pairs,
)


def _lev(s, t):
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


def _brute(names, d):
    out = set()
    for (i, s), (j, t) in itertools.combinations(enumerate(names), 2):
        dist = _lev(s, t)
        if dist <= d:
            out.add((i, j, s, t, dist))
    return out


def _run(spark, names, d):
    df = spark.createDataFrame(list(enumerate(names)), "id long, txt string")
    return {
        (r.id1, r.id2, r.text1, r.text2, r.dist)
        for r in fuzzy_pairs(df, "id", "txt", max_dist=d).collect()
    }


def test_exhaustive_d1_small_alphabet(spark):
    # every string of length 1..3 over {a, b}: 2 + 4 + 8 = 14 names,
    # all 91 pairs checked against the DP — losslessness is exhaustive
    names = [
        "".join(p)
        for n in (1, 2, 3)
        for p in itertools.product("ab", repeat=n)
    ]
    assert _run(spark, names, 1) == _brute(names, 1)


def test_realistic_names_d1(spark):
    names = [
        "black sabbath", "black sabath", "blck sabbath", "black sabbathh",
        "iron maiden", "iron maidenn", "iron miaden", "judas priest",
        "judaz priest", "metallica", "metalica", "megadeth", "megadeath",
        "slayer", "slayerr", "slayer",
    ]
    got = _run(spark, names, 1)
    assert got == _brute(names, 1)
    # the seeded true pairs are present
    by_ids = {(a, b) for a, b, *_ in got}
    assert (0, 1) in by_ids and (9, 10) in by_ids and (13, 14) in by_ids
    # the exact-duplicate pair surfaces with dist 0
    assert (13, 15, "slayer", "slayer", 0) in got


def test_depth2_completeness(spark):
    names = ["sabbath", "sabbth", "sbbth", "sabbath x", "sbbath xy",
             "anthrax", "antrax", "antrx"]
    assert _run(spark, names, 2) == _brute(names, 2)


def test_partitioning_invariance(spark):
    names = [f"name{i % 7}{'x' * (i % 3)}" for i in range(40)]
    df1 = spark.createDataFrame(
        list(enumerate(names)), "id long, txt string").repartition(1)
    df13 = spark.createDataFrame(
        list(enumerate(names)), "id long, txt string").repartition(13)
    a = sorted(map(tuple, fuzzy_pairs(df1, "id", "txt").collect()))
    b = sorted(map(tuple, fuzzy_pairs(df13, "id", "txt").collect()))
    assert a == b and a


def test_no_cartesian_product(spark):
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "id long, txt string")
    plan = fuzzy_pairs(df, "id", "txt")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_neighborhood_contents(spark):
    row = spark.range(1).select(
        deletion_neighborhood(F.lit("abc"), 1).alias("v")).head()
    assert set(row.v) == {"abc", "bc", "ac", "ab"}
    row2 = spark.range(1).select(
        deletion_neighborhood(F.lit("abc"), 2).alias("v")).head()
    assert set(row2.v) == {"abc", "bc", "ac", "ab", "a", "b", "c"}


def test_max_dist_guard(spark):
    df = spark.createDataFrame([(1, "a")], "id long, txt string")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "txt", max_dist=3)


def test_probe_equals_rebuild(spark):
    names = [
        "black sabbath", "black sabath", "iron maiden", "iron maidenn",
        "metallica", "metalica", "slayer", "slayerr", "slayer",
        "megadeth", "megadeath", "anthrax",
    ]
    df = spark.createDataFrame(list(enumerate(names)), "id long, txt string")
    old = df.filter(F.col("id") < 6)
    new = df.filter(F.col("id") >= 6)

    from metal_history_knowledge_graph_spark.operators.fuzzy_join import (
        fuzzy_index,
        fuzzy_probe_new,
    )

    idx = fuzzy_index(old, "id", "txt")
    probed = {
        tuple(r) for r in fuzzy_probe_new(new, idx, "id", "txt").collect()
    }
    old_pairs = {tuple(r) for r in fuzzy_pairs(old, "id", "txt").collect()}
    all_pairs = {tuple(r) for r in fuzzy_pairs(df, "id", "txt").collect()}
    # probe returns exactly the pairs that involve a new id
    assert probed == {p for p in all_pairs if p[0] >= 6 or p[1] >= 6}
    # probe ∪ old-pairs == full rebuild
    assert probed | old_pairs == all_pairs
    # old-old pairs are structurally excluded
    assert all(p[0] >= 6 or p[1] >= 6 for p in probed)


def test_pairs_feed_group_representatives(spark):
    from metal_history_knowledge_graph_spark.operators.dedup import (
        group_representatives,
    )

    names = ["abba", "abbba", "abb", "zz", "zzz", "qqqq"]
    df = spark.createDataFrame(list(enumerate(names)), "id long, txt string")
    pairs = fuzzy_pairs(df, "id", "txt")
    reps = group_representatives(
        pairs, docs=df.select(F.col("id")), id_col="id",
        a_col="id1", b_col="id2",
    )
    rows = {r.id: (r.rep_id, r.group_size, r.keep) for r in reps.collect()}
    # abba~abbba (dist 1), abba~abb (dist 1) → one group rooted at 0
    assert rows[0] == (0, 3, True)
    assert rows[1] == (0, 3, False) and rows[2] == (0, 3, False)
    # zz~zzz group, qqqq singleton
    assert rows[3] == (3, 2, True) and rows[4] == (3, 2, False)
    assert rows[5] == (5, 1, True)
