"""Exact distributed quantiles (operators/quantiles.exact_quantiles):
ground-truth equality with a driver sort, heavy-duplicate robustness,
partitioning invariance, string-typed columns, and the guard rails."""

import math

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.quantiles import (
    exact_quantiles,
)


def _truth(values, qs):
    s = sorted(values)
    n = len(s)
    return {q: s[max(1, math.ceil(q * n / 1000)) - 1] for q in qs}


QS = [0, 10, 250, 500, 750, 900, 999, 1000]


def test_matches_driver_sort(spark):
    values = [((i * 2654435761) % 100003) - 50000 for i in range(20000)]
    df = spark.createDataFrame([(v,) for v in values], "x long")
    got = {
        r.q_permille: (r.value, r.rank)
        for r in exact_quantiles(df, "x", QS, sample_rate=0.01).collect()
    }
    truth = _truth(values, QS)
    n = len(values)
    for q in QS:
        assert got[q][0] == truth[q], f"q={q}"
        assert got[q][1] == max(1, math.ceil(q * n / 1000))


def test_heavy_duplicates(spark):
    # 90% of rows are the single value 7 — per-value aggregation keeps
    # the bracket tiny no matter the row count
    values = [7] * 18000 + list(range(2000))
    df = spark.createDataFrame([(v,) for v in values], "x long")
    got = {
        r.q_permille: r.value
        for r in exact_quantiles(df, "x", QS, sample_rate=0.02).collect()
    }
    assert got == _truth(values, QS)


def test_partitioning_invariance(spark):
    values = [(i * 37) % 1009 for i in range(5000)]
    a = spark.createDataFrame([(v,) for v in values], "x long").repartition(1)
    b = spark.createDataFrame([(v,) for v in values], "x long").repartition(13)
    ga = sorted(map(tuple, exact_quantiles(a, "x", QS).collect()))
    gb = sorted(map(tuple, exact_quantiles(b, "x", QS).collect()))
    assert ga == gb


def test_string_column(spark):
    values = [f"s{i:05d}" for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in values], "x string")
    got = {
        r.q_permille: r.value
        for r in exact_quantiles(df, "x", [500, 1000],
                                 sample_rate=0.02).collect()
    }
    assert got == _truth(values, [500, 1000])


def test_nulls_excluded_and_empty(spark):
    df = spark.createDataFrame(
        [(None,), (5,), (1,), (9,)], "x int")
    got = {r.q_permille: r.value
           for r in exact_quantiles(df, "x", [500, 1000]).collect()}
    assert got == {500: 5, 1000: 9}
    empty = spark.createDataFrame([], "x long")
    assert exact_quantiles(empty, "x", [500]).count() == 0


def test_guards(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [1500])
    wide = spark.createDataFrame([(i,) for i in range(5000)], "x long")
    with pytest.raises(RuntimeError):
        # rate so low no pivots survive → one bracket with 5000
        # distinct values > max_bracket
        exact_quantiles(wide, "x", [500], sample_rate=1e-6,
                        max_bracket=100)
