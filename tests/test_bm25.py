"""BM25 keyword retrieval (operators/bm25.py): hand-computed scores
on a tiny fixture, ranking sanity, tie-break determinism, edge cases,
and the broadcast/TakeOrdered plan shape."""

import math

import pytest

from metal_history_knowledge_graph_spark.operators.bm25 import (
    bm25_index,
    bm25_topk,
)

DOCS = [
    (0, "spark spark join"),
    (1, "spark filter scan"),
    (2, "join join join agg"),
    (3, "window sort merge"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def _bm25(tf, df_t, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(docs):
    got = {r.doc_id: r.score for r in bm25_topk(docs, "spark", k=10).collect()}
    avgdl = (3 + 3 + 4 + 3) / 4
    exp = {
        0: round(_bm25(2, 2, 4, 3, avgdl), 4),
        1: round(_bm25(1, 2, 4, 3, avgdl), 4),
    }
    assert got == exp
    assert got[0] > got[1]  # higher tf wins at equal dl


def test_bm25_multi_term_sums(docs):
    got = {
        r.doc_id: r.score
        for r in bm25_topk(docs, "spark join", k=10).collect()
    }
    avgdl = 13 / 4
    exp0 = round(_bm25(2, 2, 4, 3, avgdl) + _bm25(1, 2, 4, 3, avgdl), 4)
    assert got[0] == exp0
    assert set(got) == {0, 1, 2}  # doc 3 matches nothing → absent


def test_bm25_rare_term_outscores_common(spark):
    rows = [(i, "common filler words here") for i in range(20)]
    rows.append((100, "common rareterm filler here"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    top = bm25_topk(df, "rareterm common", k=3).collect()
    assert top[0].doc_id == 100  # the only rareterm doc ranks first


def test_bm25_query_term_dedup_and_case(docs):
    a = {(r.doc_id, r.score) for r in bm25_topk(docs, "Spark SPARK", k=10).collect()}
    b = {(r.doc_id, r.score) for r in bm25_topk(docs, "spark", k=10).collect()}
    assert a == b


def test_bm25_empty_query_and_no_match(docs):
    assert bm25_topk(docs, "   ", k=5).count() == 0
    assert bm25_topk(docs, "zzz_not_in_corpus", k=5).count() == 0


def test_bm25_k_bound_and_tiebreak(spark):
    # identical docs → identical scores; tie-break must be doc_id asc
    df = spark.createDataFrame(
        [(i, "same text here") for i in range(6)], ["doc_id", "text"]
    )
    top = bm25_topk(df, "same", k=3).collect()
    assert [r.doc_id for r in top] == [0, 1, 2]


def test_bm25_index_shapes(docs):
    postings, stats = bm25_index(docs)
    p = {(r.term, r.doc_id): r.tf for r in postings.collect()}
    assert p[("spark", 0)] == 2 and p[("join", 2)] == 3
    assert {r.doc_id: r.dl for r in stats.collect()} == {0: 3, 1: 3, 2: 4, 3: 3}


def test_bm25_plan_shape(docs):
    plan = bm25_topk(docs, "spark join", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # df_t and totals ride broadcasts
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
