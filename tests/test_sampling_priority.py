"""Priority sampling (operators/sampling.priority_sample — DLT 2007):
selection matches a pure-Python replay, the sample is partition-
independent, per-shard samples merge losslessly, the w_hat estimator
is unbiased in expectation (tolerance smoke) and exact on exhaustive
samples, and the plan is a TakeOrderedAndProject, not a global sort."""

import hashlib

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.sampling import (
    priority_merge,
    priority_sample,
)

K = 50


@pytest.fixture(scope="module")
def weighted(spark):
    # 2000 rows, weights 1..400 with a heavy head (every 100th row 50x).
    return (
        spark.range(2000)
        .select(
            F.col("id").alias("key"),
            F.when(F.col("id") % 100 == 0, (F.col("id") % 400 + 1) * 50)
            .otherwise(F.col("id") % 400 + 1)
            .cast("long")
            .alias("w"),
        )
        .cache()
    )


def _replay(rows, k, seed=0):
    """Pure-Python DLT replay: returns {key: (qkey, w_hat)}."""
    keyed = []
    for key, w in rows:
        if w <= 0:
            continue
        u = int(hashlib.md5(f"prio:{seed}|{key}".encode()).hexdigest()[:8], 16) + 1
        qkey = max(1, (u << 20) // w)
        keyed.append((qkey, key, w))
    keyed.sort()
    top, nxt = keyed[:k], keyed[k : k + 1]
    tau_w = (1 << 52) // nxt[0][0] if nxt else None
    return {
        key: (qkey, max(w, tau_w) if tau_w is not None else w)
        for qkey, key, w in top
    }


def test_matches_python_replay(spark, weighted):
    got = {
        r.key: (r.qkey, r.w_hat)
        for r in priority_sample(weighted, "w", K, "key", seed=0).collect()
    }
    want = _replay([(r.key, r.w) for r in weighted.collect()], K)
    assert got == want and len(got) == K


def test_partition_independent(spark, weighted):
    a = {r.key for r in priority_sample(weighted, "w", K, "key").collect()}
    b = {
        r.key
        for r in priority_sample(weighted.repartition(17), "w", K, "key").collect()
    }
    assert a == b


def test_merge_equals_direct(spark, weighted):
    """DLT mergeability: per-shard samples re-cut to the corpus sample."""
    shards = [
        priority_sample(weighted.filter(F.col("key") % 3 == i), "w", K, "key")
        for i in range(3)
    ]
    merged = {
        r.key: (r.qkey, r.w_hat)
        for r in priority_merge(shards, "w", K, "key").collect()
    }
    direct = {
        r.key: (r.qkey, r.w_hat)
        for r in priority_sample(weighted, "w", K, "key").collect()
    }
    assert merged == direct


def test_estimator_total(spark, weighted):
    """E[Σ w_hat] = Σ w (DLT Thm 1); one draw at k=50 lands within
    ~4/sqrt(k) of the truth — a smoke bound, not a statistical test."""
    total = weighted.agg(F.sum("w")).collect()[0][0]
    est = (
        priority_sample(weighted, "w", K, "key")
        .agg(F.sum("w_hat"))
        .collect()[0][0]
    )
    assert abs(est - total) / total < 4 / K**0.5


def test_exhaustive_sample_exact(spark):
    """Population ≤ k: every row kept, w_hat == w exactly (no threshold)."""
    small = spark.range(10).select(
        F.col("id").alias("key"), (F.col("id") + 1).alias("w")
    )
    rows = priority_sample(small, "w", K, "key").collect()
    assert len(rows) == 10 and all(r.w_hat == r.w for r in rows)


def test_zero_weight_dropped_negative_raises(spark):
    df = spark.range(10).select(
        F.col("id").alias("key"), (F.col("id") - 1).alias("w")
    )
    with pytest.raises(ValueError, match="negative"):
        priority_sample(df, "w", 5, "key")
    nonneg = df.filter(F.col("w") >= 0)
    keys = {r.key for r in priority_sample(nonneg, "w", 20, "key").collect()}
    assert 1 not in keys and len(keys) == 8  # w=0 (key 1) never picked


def test_plan_is_take_ordered(spark, weighted):
    plan = priority_sample(weighted, "w", K, "key", checkpoint=False)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
