"""Water-filling budget allocation (operators/waterfill.py): parity
with a pure-Python bisection replay, the demand-fits fast path,
max-min fairness properties, budget feasibility, and fail-fast
guards."""

import random

import pytest

from metal_history_knowledge_graph_spark.operators.waterfill import (
    MICRO,
    waterfill_budget,
)


def py_waterfill(rows, budget):
    total_d = sum(d for _, d, _ in rows)
    cap = max(((d * MICRO + w - 1) // w for _, d, w in rows), default=0) + 1
    if total_d <= budget:
        lam = cap
    else:
        lo, hi = 0, cap
        while lo + 1 < hi:
            mid = (lo + hi) // 2
            f = sum(min(d, mid * w // MICRO) for _, d, w in rows)
            if f <= budget:
                lo = mid
            else:
                hi = mid
        lam = lo
    alloc = {k: min(d, lam * w // MICRO) for k, d, w in rows}
    return lam, alloc, budget - sum(alloc.values())


def _run(spark, rows, budget):
    df = spark.createDataFrame(rows, "host string, demand long, weight long")
    out = waterfill_budget(df, budget).collect()
    lam = {r.lambda_micro for r in out}
    left = {r.leftover for r in out}
    assert len(lam) == 1 and len(left) == 1
    return lam.pop(), {r.host: r.alloc for r in out}, left.pop()


def test_matches_python_bisection(spark):
    rng = random.Random(5)
    rows = [
        (f"h{i}", rng.randrange(0, 200), rng.randrange(1, 9))
        for i in range(25)
    ]
    for budget in (0, 137, 1000, 10**6):
        assert _run(spark, rows, budget) == py_waterfill(rows, budget)


def test_demand_fits_everyone_served(spark):
    rows = [("a", 10, 1), ("b", 5, 3)]
    lam, alloc, left = _run(spark, rows, 100)
    assert alloc == {"a": 10, "b": 5} and left == 85


def test_fairness_weight_proportionality(spark):
    # equal demands, weights 1 vs 3: the heavy host gets ~3x
    rows = [("light", 1000, 1), ("heavy", 1000, 3)]
    lam, alloc, left = _run(spark, rows, 1000)
    assert alloc["heavy"] == 3 * alloc["light"]
    assert alloc["light"] + alloc["heavy"] <= 1000
    assert left < 4  # residual bounded by one lambda step's granularity


def test_small_demand_served_fully(spark):
    rows = [("tiny", 2, 1), ("big", 10**6, 1)]
    lam, alloc, left = _run(spark, rows, 1000)
    assert alloc["tiny"] == 2 and alloc["big"] <= 998


def test_guards_raise(spark):
    df = spark.createDataFrame(
        [("a", -1, 1)], "host string, demand long, weight long"
    )
    with pytest.raises(ValueError, match="negative"):
        waterfill_budget(df, 10)
    df2 = spark.createDataFrame(
        [("a", 1, 0)], "host string, demand long, weight long"
    )
    with pytest.raises(ValueError, match="weight"):
        waterfill_budget(df2, 10)
    with pytest.raises(ValueError, match="budget"):
        waterfill_budget(df2, -5)
