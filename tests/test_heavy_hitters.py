"""Misra-Gries heavy hitters (operators/heavy_hitters): candidate
completeness under real pruning pressure (cardinality ≫ capacity),
exact-output equality with a brute-force groupBy, partitioning
invariance, the undercount bound, and the guard rails."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.heavy_hitters import (
    heavy_hitters,
    mg_partition_summaries,
)


def _skewed(spark, n_heavy=3, heavy_freq=400, n_tail=2000):
    """3 heavy items (~400 each) over a 2000-item singleton tail —
    cardinality far above any test capacity, so MG actually prunes."""
    rows = [(f"hot{i}",) for i in range(n_heavy) for _ in range(heavy_freq)]
    rows += [(f"tail{j}",) for j in range(n_tail)]
    return spark.createDataFrame(rows, "item string")


def test_exact_output_under_pruning(spark):
    df = _skewed(spark).repartition(8)
    # N = 3200, threshold 10% = 320 → exactly the 3 hot items
    out = heavy_hitters(df, "item", threshold_ppm=100_000)
    rows = {r["item"]: r["freq"] for r in out.collect()}
    assert rows == {"hot0": 400, "hot1": 400, "hot2": 400}


def test_partitioning_invariance(spark):
    df = _skewed(spark)
    a = sorted(map(tuple, heavy_hitters(
        df.repartition(1), "item", threshold_ppm=100_000).collect()))
    b = sorted(map(tuple, heavy_hitters(
        df.repartition(13), "item", threshold_ppm=100_000).collect()))
    assert a == b and len(a) == 3


def test_summaries_bounded_and_undercount(spark):
    df = _skewed(spark).repartition(4)
    cap = 25
    summ = mg_partition_summaries(df, "item", cap).groupBy("item").agg(
        F.sum("weight").alias("w")
    )
    rows = {r["item"]: r["w"] for r in summ.collect()}
    # global candidate count ≤ cap per partition
    assert len(rows) <= 4 * cap
    # MG undercount bound: weight ≥ freq − N/(cap+1)
    n = df.count()
    for i in range(3):
        assert rows.get(f"hot{i}", 0) >= 400 - n / (cap + 1)


def test_boundary_frequency_included(spark):
    # item at EXACTLY the threshold must be returned (≥, not >)
    rows = [("x",)] * 10 + [("y",)] * 90
    df = spark.createDataFrame(rows, "item string")
    out = {r["item"]: r["freq"] for r in heavy_hitters(
        df, "item", threshold_ppm=100_000).collect()}
    assert out["x"] == 10 and out["y"] == 90


def test_guards(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError, match="threshold_ppm"):
        heavy_hitters(df, "item", threshold_ppm=0)
    with pytest.raises(ValueError, match="cannot guarantee"):
        heavy_hitters(df, "item", threshold_ppm=1000, capacity=10)
    with pytest.raises(ValueError, match="capacity"):
        mg_partition_summaries(df, "item", 0).collect()


def test_empty_input(spark):
    df = spark.createDataFrame([], "item string")
    assert heavy_hitters(df, "item", threshold_ppm=1000).count() == 0


def test_recount_plan_broadcasts_candidates(spark):
    """Pass 2 must be a broadcast LEFT-SEMI join (candidate set is
    ≤ capacity·partitions — vocabulary-sized); the raw key stream is
    never shuffled for the join."""
    df = _skewed(spark).repartition(4)
    plan = heavy_hitters(df, "item", threshold_ppm=100_000)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan.split("AdaptiveSparkPlan")[0]
