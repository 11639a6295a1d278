"""Reciprocal-rank fusion (operators/fuse.py): hand-computed RRF on
small candidate lists, weights, both-lists boost, tie-break, rank
assignment determinism, and input validation."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.fuse import (
    rrf_fuse,
    with_rank,
)


@pytest.fixture(scope="module")
def lists(spark):
    a = spark.createDataFrame(
        [("d1", 1), ("d2", 2), ("d3", 3)], ["doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [("d3", 1), ("d4", 2), ("d1", 3)], ["doc_id", "rank"]
    )
    return a, b


def test_rrf_hand_computed(lists):
    a, b = lists
    got = {
        r.doc_id: (r.rrf_score, r.n_lists)
        for r in rrf_fuse([a, b], k=10).collect()
    }
    assert got["d1"] == (round(1 / 61 + 1 / 63, 6), 2)
    assert got["d3"] == (round(1 / 63 + 1 / 61, 6), 2)
    assert got["d2"] == (round(1 / 62, 6), 1)
    assert got["d4"] == (round(1 / 62, 6), 1)


def test_rrf_both_lists_beat_single(lists):
    a, b = lists
    order = [r.doc_id for r in rrf_fuse([a, b], k=10).collect()]
    # d1 and d3 (in both lists, identical symmetric ranks) tie on
    # score → doc_id tie-break; singles follow
    assert order[:2] == ["d1", "d3"]
    assert set(order[2:]) == {"d2", "d4"}


def test_rrf_weights(lists):
    a, b = lists
    got = {
        r.doc_id: r.rrf_score
        for r in rrf_fuse([a, b], k=10, weights=[2.0, 0.0]).collect()
    }
    assert got["d2"] == round(2 / 62, 6)
    assert got["d4"] == 0.0  # only in the zero-weight list


def test_rrf_k_limit(lists):
    a, b = lists
    assert rrf_fuse([a, b], k=2).count() == 2


def test_rrf_validation(lists):
    a, b = lists
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1.0])


def test_with_rank_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("x", 5.0), ("y", 5.0), ("z", 7.0)], ["doc_id", "score"]
    )
    got = {r.doc_id: r.rank for r in with_rank(df, "score", "doc_id").collect()}
    assert got == {"z": 1, "x": 2, "y": 3}
    asc = {
        r.doc_id: r.rank
        for r in with_rank(df, "score", "doc_id", ascending=True).collect()
    }
    assert asc == {"x": 1, "y": 2, "z": 3}
