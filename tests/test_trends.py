"""burst_terms (inter-window trending-term detection): exact integer
replay in pure Python; first-window exclusion; born-this-window
smoothing; min_count screen; rate normalization across unequal
window sizes."""

from collections import Counter

import pytest

from metal_history_knowledge_graph_spark.operators.trends import (
    MICRO,
    PPB,
    burst_terms,
)

DOCS = [
    # window 0: baseline
    (0, 0, "alpha beta beta gamma gamma gamma"),
    (1, 0, "alpha delta delta"),
    # window 1: 'burst' is born, 'gamma' collapses, corpus is larger
    (2, 1, "burst burst burst alpha beta beta"),
    (3, 1, "burst burst alpha delta epsilon epsilon"),
    # window 2 exists so window 1 is also a predecessor
    (4, 2, "alpha alpha burst"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, window long, text string")


def _brute(min_count=1):
    counts, totals = Counter(), Counter()
    for _, w, text in DOCS:
        for t in text.split():
            counts[(w, t)] += 1
            totals[w] += 1
    rows = {}
    for (w, t), c in counts.items():
        if c < min_count or (w - 1) not in totals:
            continue
        prev_c = counts.get((w - 1, t), 0)
        n, prev_n = totals[w], totals[w - 1]
        rate = (PPB * c) // n
        prev = max(1, (PPB * (prev_c + 1)) // prev_n)
        rows[(w, t)] = (c, n, prev_c, prev_n, (MICRO * rate) // prev)
    return rows


def test_exact_python_replay(spark):
    got = {
        (r.window, r.term): (r.c, r.n_tokens, r.prev_c, r.prev_n, r.burst_ppm)
        for r in burst_terms(_docs(spark), min_count=1).collect()
    }
    assert got == _brute(min_count=1)
    # window 0 has no predecessor: no rows at all
    assert not [k for k in got if k[0] == 0]
    # 'burst' is born in window 1: biggest burst there
    w1 = {t: v[4] for (w, t), v in got.items() if w == 1}
    assert max(w1, key=w1.get) == "burst"
    # 'gamma' vanished in window 1: no current-count row exists
    assert (1, "gamma") not in got
    # 'burst' collapses window 2 vs 1: burst_ppm well under 1e6
    assert got[(2, "burst")][4] < MICRO


def test_min_count_screen_and_guard(spark):
    got = {
        (r.window, r.term)
        for r in burst_terms(_docs(spark), min_count=2).collect()
    }
    assert got == {k for k, v in _brute(min_count=2).items()}
    with pytest.raises(ValueError, match="min_count"):
        burst_terms(_docs(spark), min_count=0)


def test_rate_normalization(spark):
    """Same absolute count in a 2x-larger window must burst BELOW
    1e6 (the rate halved)."""
    docs = [
        (0, 0, "x x y y"),
        (1, 1, "x x y y a b c d"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, window long, text string")
    got = {r.term: r.burst_ppm for r in burst_terms(df, min_count=1).collect()}
    assert got["x"] < MICRO
