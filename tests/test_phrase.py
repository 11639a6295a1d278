"""Positional phrase search (operators/phrase.py): overlap counting,
repeated-term phrases, brute-force agreement, empty cases, and the
JVM-only plan."""

import pytest

from metal_history_knowledge_graph_spark.operators.phrase import (
    phrase_match,
    positional_index,
)

DOCS = [
    (0, "the quick brown fox the quick brown cat"),
    (1, "a a a a"),
    (2, "quick brown"),
    (3, "brown quick"),
    (4, ""),
    (5, "The  Quick   BROWN fox"),  # case + whitespace normalization
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _brute(phrase):
    terms = phrase.lower().split()
    out = {}
    for did, text in DOCS:
        toks = text.lower().split()
        starts = [
            i for i in range(len(toks) - len(terms) + 1)
            if toks[i:i + len(terms)] == terms
        ]
        if starts:
            out[did] = (len(starts), starts[0])
    return out


@pytest.mark.parametrize("phrase", [
    "quick brown", "a a", "the quick brown", "brown", "a a a a", "fox the",
])
def test_phrase_match_agrees_with_bruteforce(spark, phrase):
    got = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_match(_docs(spark), phrase).collect()
    }
    assert got == _brute(phrase), phrase


def test_overlapping_and_repeated_terms(spark):
    # "a a" in "a a a a": 3 overlapping occurrences starting at 0
    got = {r.doc_id: (r.n_occurrences, r.first_pos)
           for r in phrase_match(_docs(spark), "a a").collect()}
    assert got == {1: (3, 0)}


def test_no_match_keeps_schema_and_empty_phrase_raises(spark):
    out = phrase_match(_docs(spark), "zebra stampede")
    assert out.columns == ["doc_id", "n_occurrences", "first_pos"]
    assert out.count() == 0
    with pytest.raises(ValueError, match="empty phrase"):
        phrase_match(_docs(spark), "   ")


def test_positional_index_positions_are_zero_based(spark):
    rows = positional_index(_docs(spark)).filter("doc_id = 2").collect()
    assert sorted((r.term, r.pos) for r in rows) == [("brown", 1), ("quick", 0)]


def test_phrase_plan_is_jvm_only_and_term_filtered(spark):
    plan = phrase_match(_docs(spark), "quick brown fox") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # each join side is filtered to one term before the join
    assert plan.count("= quick)") + plan.count("quick") >= 1


def test_proximity_match(spark):
    from metal_history_knowledge_graph_spark.operators.phrase import (
        positional_index,
        proximity_match,
    )

    docs = spark.createDataFrame(
        [
            (0, "black metal band from norway"),          # dist 2 (metal..band? no: black-0 metal-1) a=black b=band -> |2-0|=2
            (1, "band plays black doom metal"),           # band-0 black-2: dist 2 (b before a)
            (2, "black sabbath is not a metal band here"),# black-0 band-6: dist 6
            (3, "no terms of interest"),
            (4, "band band black band"),                  # multiple pairs
        ],
        "doc_id long, text string",
    )
    idx = positional_index(docs)
    un = {
        r["doc_id"]: (r["n_pairs"], r["min_distance"])
        for r in proximity_match(idx, "black", "band", 3).collect()
    }
    # doc0: pair (0,2) dist 2. doc1: (2,0) dist 2 unordered.
    # doc2: dist 6 > 3 -> absent. doc4: black@2, band@0,1,3 -> dists 2,1,1
    assert un == {0: (1, 2), 1: (1, 2), 4: (3, 1)}
    od = {
        r["doc_id"]: (r["n_pairs"], r["min_distance"])
        for r in proximity_match(idx, "black", "band", 3,
                                 ordered=True).collect()
    }
    # ordered black..band: doc0 (0->2); doc1 none (band before black);
    # doc4 black@2 -> band@3
    assert od == {0: (1, 2), 4: (1, 1)}


def test_proximity_same_term_counts_once(spark):
    from metal_history_knowledge_graph_spark.operators.phrase import (
        positional_index,
        proximity_match,
    )

    docs = spark.createDataFrame(
        [(0, "spark x spark y spark")], "doc_id long, text string"
    )
    got = proximity_match(
        positional_index(docs), "spark", "spark", 4
    ).collect()
    # positions 0,2,4 -> unordered pairs (0,2),(2,4),(0,4): 3 pairs
    assert [(r["n_pairs"], r["min_distance"]) for r in got] == [(3, 2)]
