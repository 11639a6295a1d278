"""Composed webtext-prep plan (plans/webtext.py): stage ordering
matters — docs that become exact duplicates only AFTER boilerplate
removal / span scrub must dedup; quality judges the scrubbed text."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.plans.webtext import webtext_prep

UNIQ = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima mike november oscar papa"
)


@pytest.fixture(scope="module")
def corpus(spark):
    boiler = "footer nav menu copyright"
    rows = [
        # d0/d1: identical AFTER the shared boilerplate block is
        # stripped (different block counts before) → dedup must fire
        (0, f"{boiler} {UNIQ}"),
        (1, f"{boiler} {boiler} {UNIQ}"),
        # d2: fully disjoint vocabulary, long enough to pass the gate
        (2, "quebec romeo amber blue coral dune ember frost grove "
            "harbor ivory jade"),
        # d3/d4/d5: the boilerplate owners (make df >= 3), each with a
        # disjoint unique remainder
        (3, f"{boiler} sierra tango uniform victor whiskey xray yankee "
            "zulu sun moon"),
        (4, f"{boiler} three four five six seven eight nine ten eleven "
            "twelve"),
        (5, f"{boiler} thirteen fourteen fifteen sixteen seventeen "
            "eighteen nineteen twenty twentyone twentytwo"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


@pytest.fixture(scope="module")
def result(corpus):
    # span_min_docs=3: spans shared by only the d0/d1 pair survive the
    # scrub, so the pair reaches stage 4 as exact duplicates (with
    # span_min_docs=2 the scrub itself would empty both — span dedup
    # subsumes pairwise exact dedup at that threshold)
    out = webtext_prep(
        corpus,
        boiler_min_docs=3,
        span_min_docs=3,
        gopher_kwargs={"min_words": 5},
    )
    return {r.doc_id: r.asDict() for r in out.collect()}


def test_boilerplate_removed_before_dedup(result):
    # d0 and d1 have different segment counts but identical text
    # after the boilerplate strip → one canonical, one duplicate
    assert result[0]["clean_text"] == result[1]["clean_text"]
    assert result[0]["is_canonical"] is True
    assert result[1]["is_canonical"] is False
    assert result[1]["removed_segments"] >= result[0]["removed_segments"]


def test_unique_doc_survives(result):
    assert result[2]["keep_quality"] is True
    assert result[2]["is_canonical"] is True
    assert result[2]["removed_segments"] == 0


def test_quality_judges_scrubbed_text(result):
    # d3-5 lose only the boilerplate block; their unique remainders
    # (10 words >= min_words=5) pass and stay canonical
    for d in (3, 4, 5):
        assert result[d]["removed_segments"] >= 1
        assert result[d]["keep_quality"] is True
        assert result[d]["is_canonical"] is True


def test_accounting_columns_consistent(result):
    for d, row in result.items():
        assert 0 <= row["removed_segments"] <= row["n_segments"]
        assert row["removed_tokens"] >= 0
        assert row["n_words"] == len(row["clean_text"].split()) or (
            row["clean_text"] == "" and row["n_words"] == 0
        )
