"""CUSUM: the window-function closed form must equal the textbook
sequential recurrence, and onsets land where the shift is planted."""

import pytest

from metal_history_knowledge_graph_spark.operators.changepoint import (
    cusum_onsets,
    cusum_scores,
)


def _py_cusum(vals, drift):
    s, out = 0, []
    for v in vals:
        s = max(0, s + (v - drift))
        out.append(s)
    return out


def _df(spark, series):
    rows = [
        (k, t, v) for k, vals in series.items() for t, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "host string, t long, v long")


SERIES = {
    # stable around 10 (drift 12 absorbs noise), shift to 25 at t=30
    "shifted": [10 + (i % 3) for i in range(30)] + [25 + (i % 3) for i in range(10)],
    "stable": [10 + (i % 5) for i in range(40)],
    "spiky": [10] * 20 + [60] + [10] * 19,  # single spike decays, no alarm at h=40
}


def test_matches_sequential_recurrence(spark):
    got = {
        (r["host"], r["t"]): r["cusum"]
        for r in cusum_scores(_df(spark, SERIES), "host", "t", "v",
                              drift=12, threshold=40).collect()
    }
    for host, vals in SERIES.items():
        want = _py_cusum(vals, 12)
        for t in range(len(vals)):
            assert got[(host, t)] == want[t], (host, t)


def test_onsets(spark):
    got = {
        r["host"]: (r["onset_ts"], r["onset_cusum"])
        for r in cusum_onsets(_df(spark, SERIES), "host", "t", "v",
                              drift=12, threshold=40).collect()
    }
    assert set(got) == {"shifted", "spiky"}
    # shifted: alarms once the post-shift surplus accumulates past 40
    want = _py_cusum(SERIES["shifted"], 12)
    onset = next(t for t, s in enumerate(want) if s > 40)
    assert got["shifted"] == (onset, want[onset])
    # single spike: 60-12=48 > 40 fires once at the spike itself
    assert got["spiky"][0] == 20
    assert "stable" not in got


def test_bad_threshold(spark):
    with pytest.raises(ValueError):
        cusum_scores(_df(spark, SERIES), "host", "t", "v", 12, 0)
