"""KMV bottom-k distinct sketches (operators/kmv.py): exact sub-k
behavior, estimator accuracy, shard-merge losslessness, Jaccard
accuracy against the true overlap, and the k bound guard."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.kmv import (
    kmv_distinct,
    kmv_jaccard,
    kmv_merge,
    kmv_sketch,
)

K = 64


@pytest.fixture(scope="module")
def items(spark):
    # group g0: items 0..4999; g1: 2500..7499 (50% true overlap of
    # the 7500-union); g2: only 30 items (sub-k, exact path)
    return (
        spark.range(5000)
        .select(F.lit("g0").alias("grp"), F.col("id").alias("item"))
        .unionByName(
            spark.range(2500, 7500).select(
                F.lit("g1").alias("grp"), F.col("id").alias("item")
            )
        )
        .unionByName(
            spark.range(30).select(
                F.lit("g2").alias("grp"), F.col("id").alias("item")
            )
        )
        .cache()
    )


def test_subk_exact_and_estimate_accuracy(spark, items):
    sk = kmv_sketch(items, "grp", "item", k=K)
    got = {r.grp: (r.n_distinct_est, r.exact)
           for r in kmv_distinct(sk, K).collect()}
    assert got["g2"] == (30, True)
    for g, true_n in (("g0", 5000), ("g1", 5000)):
        est, exact = got[g]
        assert not exact
        # KMV relative error ~ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
        assert abs(est - true_n) / true_n < 0.5


def test_merge_equals_direct(spark, items):
    direct = {(r.grp, r.rn): r.h
              for r in kmv_sketch(items, "grp", "item", k=K).collect()}
    shards = [
        kmv_sketch(items.filter(F.col("item") % 3 == i), "grp", "item", k=K)
        for i in range(3)
    ]
    merged = {(r.grp, r.rn): r.h for r in kmv_merge(shards, K).collect()}
    assert merged == direct


def test_jaccard_accuracy(spark, items):
    sk = kmv_sketch(items, "grp", "item", k=K)
    got = {(r.grp_a, r.grp_b): r.jaccard_permille
           for r in kmv_jaccard(sk, K).collect()}
    # true J(g0,g1) = 2500/7500 = 333‰; bottom-k binomial noise ~ 6%/pt
    assert ("g0", "g1") in got
    assert abs(got[("g0", "g1")] - 333) < 200
    # g2 ⊂ g0: its 30 hashes all land in g0's universe; pair appears
    # only if a shared hash survives both sketches — no assertion on
    # presence, but if present the estimate must be ≤ 1000
    for v in got.values():
        assert 0 <= v <= 1000


def test_partition_independent(spark, items):
    a = {(r.grp, r.rn, r.h)
         for r in kmv_sketch(items, "grp", "item", k=K).collect()}
    b = {(r.grp, r.rn, r.h)
         for r in kmv_sketch(items.repartition(13), "grp", "item", k=K).collect()}
    assert a == b


def test_k_bound_raises(spark, items):
    with pytest.raises(ValueError, match="BIGINT estimator"):
        kmv_sketch(items, "grp", "item", k=129)
    with pytest.raises(ValueError):
        kmv_sketch(items, "grp", "item", k=1)
