"""Calibration reliability bins (operators/calibration.py): exact
parity with a pure-Python replay of the floor-formula binning,
partition invariance, monotone pos-rate on a separable score, and
NULL handling."""

import random

from metal_history_knowledge_graph_spark.operators.calibration import (
    calibration_bins,
)


def ref_bins(rows, bins):
    """rows: (id, score, label 0/1) with non-null score/label."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(ordered)
    out = {}
    for i, (_id, s, y) in enumerate(ordered):
        b = i * bins // n + 1
        cur = out.setdefault(b, [0, 0, None, None, 0])
        cur[0] += 1
        cur[1] += y
        cur[2] = s if cur[2] is None else min(cur[2], s)
        cur[3] = s if cur[3] is None else max(cur[3], s)
        cur[4] += s
    return {
        b: (c[0], c[1], c[1] * 1_000_000 // c[0], c[2], c[3], c[4])
        for b, c in out.items()
    }


def _got(spark, rows, bins=10, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, score long, label int")
    if parts:
        df = df.repartition(parts)
    return {
        r.bin: (r.n, r.n_pos, r.pos_rate_ppm, r.score_min, r.score_max,
                r.score_sum)
        for r in calibration_bins(df, "score", "label", "doc_id", bins).collect()
    }


def test_matches_python_replay_and_partition_invariance(spark):
    rng = random.Random(13)
    rows = [
        (i, rng.randrange(1000), int(rng.random() < 0.3)) for i in range(237)
    ]
    want = ref_bins(rows, 10)
    assert _got(spark, rows) == want
    assert _got(spark, rows, parts=11) == want


def test_separable_score_monotone_rate(spark):
    # label = score above median: low bins pure 0, high bins pure 1
    rows = [(i, i, int(i >= 50)) for i in range(100)]
    got = _got(spark, rows, bins=5)
    assert [got[b][2] for b in sorted(got)] == [
        0, 0, 500_000, 1_000_000, 1_000_000,
    ]
    assert all(got[b][0] == 20 for b in got)


def test_nulls_dropped_and_ragged_sizes(spark):
    rows = [(1, 10, 1), (2, None, 1), (3, 20, None), (4, 30, 0), (5, 40, 1)]
    got = _got(spark, rows, bins=2)
    want = ref_bins([(1, 10, 1), (4, 30, 0), (5, 40, 1)], 2)
    assert got == want
