"""Q-digest quantile sketch (operators/qdigest.py): compression
matches a pure-Python replay, counts are conserved, quantile answers
respect the rank-error bound, shard merges stay within bound, tiny
inputs degrade to the exact histogram, and corrupt input raises."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.qdigest import (
    qdigest_build,
    qdigest_merge,
    qdigest_quantiles,
)

BITS, K = 10, 32


def _py_qdigest(values, bits, k):
    """Pure-Python synchronous leaf→root compression replay."""
    top = (1 << bits) - 1
    cnt = {}
    for v in values:
        nid = (1 << bits) + min(v, top)
        cnt[nid] = cnt.get(nid, 0) + 1
    thr = len(values) // k
    if thr <= 0:
        return cnt
    lvl = {nid: bits for nid in cnt}
    for l in range(bits, 0, -1):
        kids = [n for n in cnt if lvl[n] == l]
        par = {}
        for n in kids:
            par.setdefault(n // 2, 0)
            par[n // 2] += cnt[n]
        for p, cs in par.items():
            pcnt = cnt.get(p, 0)
            if cs + pcnt <= thr:
                for c in (2 * p, 2 * p + 1):
                    cnt.pop(c, None)
                    lvl.pop(c, None)
                cnt[p] = cs + pcnt
                lvl[p] = l - 1
    return cnt


@pytest.fixture(scope="module")
def vals(spark):
    # skewed: mostly small values, a heavy tail
    return (
        spark.range(4000)
        .select(
            F.when(F.col("id") % 10 < 8, F.col("id") % 50)
            .otherwise((F.col("id") * 7) % 1000)
            .alias("v")
        )
        .cache()
    )


def test_matches_python_replay(spark, vals):
    got = {r.nid: r.cnt for r in qdigest_build(vals, "v", BITS, K).collect()}
    want = _py_qdigest([r.v for r in vals.collect()], BITS, K)
    assert got == want


def test_counts_conserved_and_rank_bound(spark, vals):
    d = qdigest_build(vals, "v", BITS, K)
    n = vals.count()
    assert d.agg(F.sum("cnt")).collect()[0][0] == n
    truth = sorted(r.v for r in vals.collect())
    qs = qdigest_quantiles(d, BITS, [250, 500, 900]).collect()
    for r in qs:
        # value's true rank must be within bits*n/k of the target rank
        tgt = (r.q_permille * n + 999) // 1000
        rank_hi = sum(1 for v in truth if v <= r.value)
        assert rank_hi >= tgt  # never understates
        assert rank_hi - tgt <= BITS * n // K + 1


def test_merge_within_bound(spark, vals):
    parts = [
        qdigest_build(vals.filter(F.col("v") % 2 == i), "v", BITS, K)
        for i in range(2)
    ]
    m = qdigest_merge(parts, BITS, K)
    n = vals.count()
    assert m.agg(F.sum("cnt")).collect()[0][0] == n
    truth = sorted(r.v for r in vals.collect())
    for r in qdigest_quantiles(m, BITS, [500]).collect():
        tgt = (500 * n + 999) // 1000
        rank_hi = sum(1 for v in truth if v <= r.value)
        assert rank_hi >= tgt and rank_hi - tgt <= 2 * BITS * n // K + 2


def test_tiny_input_is_exact_histogram(spark):
    df = spark.createDataFrame([(3,), (3,), (7,)], "v long")
    d = {(r.nid, r.lvl): r.cnt
         for r in qdigest_build(df, "v", bits=4, k=32).collect()}
    # thr = 3 // 32 = 0 → untouched leaves
    assert d == {(16 + 3, 4): 2, (16 + 7, 4): 1}


def test_negative_raises(spark):
    df = spark.createDataFrame([(-1,)], "v long")
    with pytest.raises(ValueError, match="corrupt"):
        qdigest_build(df, "v", BITS, K)
