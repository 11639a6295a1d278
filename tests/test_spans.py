"""Span-level cross-document dedup (operators/spans.py): duplicated-
window statistics (exact-substring-dedup signal, Lee et al. 2022) and
boilerplate-segment removal (RefinedWeb line-dedup). Semantics pinned
on a crafted fixture; hash-vs-string key identity; removal fixed
point; line-delimiter mode; plan gates (no Python in the hot path)."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.spans import (
    duplicate_span_stats,
    remove_boilerplate_segments,
    remove_duplicate_spans,
)

DOCS = [
    # d0/d1 share the exact 5-word run "alpha beta gamma delta epsilon"
    (0, "alpha beta gamma delta epsilon zz qq"),
    (1, "yy alpha beta gamma delta epsilon ww"),
    # d2 shares exactly one 3-gram ("one two three") with d4-d6
    (2, "one two three four five six"),
    # d3 short doc (< window size)
    (3, "tiny doc"),
    # d4/d5/d6 share a 4-word boilerplate block at block position 1
    (4, "footer one two three unique4 a b c"),
    (5, "footer one two three unique5 d e f"),
    (6, "footer one two three unique6 g h i"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def _stats(df, **kw):
    return {
        r.doc_id: (r.n_windows, r.dup_windows, r.dup_bp, r.keep)
        for r in duplicate_span_stats(df, **kw).collect()
    }


def test_dup_span_stats_semantics(docs):
    s = _stats(docs, n=3, min_docs=2)
    # d0: 5 windows, 3 duplicated ("alpha beta gamma", "beta gamma
    # delta", "gamma delta epsilon" also appear in d1)
    assert s[0] == (5, 3, 6000, False)
    assert s[1] == (5, 3, 6000, False)
    assert s[2] == (4, 1, 2500, True)
    # shorter than the window → zero windows, trivially kept
    assert s[3] == (0, 0, 0, True)
    # d4-6 share "footer one two" / "one two three" (2 windows each)
    assert s[4][0] == 6 and s[4][1] == 2


def test_dup_span_occurrences_counted_per_position(spark):
    # a doc repeating the shared span twice counts BOTH positions
    df = spark.createDataFrame(
        [(0, "a b c x a b c"), (1, "z a b c z")], ["doc_id", "text"]
    )
    s = _stats(df, n=3, min_docs=2)
    assert s[0][1] == 2  # "a b c" at positions 1 and 5
    assert s[1][1] == 1


def test_dup_span_hash_vs_string_identical(docs):
    assert _stats(docs, key="hash") == _stats(docs, key="string")


def test_dup_span_min_docs_above_corpus_is_empty(docs):
    s = _stats(docs, n=3, min_docs=99)
    assert all(v[1] == 0 and v[3] for v in s.values())


def _removed(df, **kw):
    return {
        r.doc_id: (r.n_segments, r.removed_segments, r.clean_text)
        for r in remove_boilerplate_segments(df, **kw).collect()
    }


def test_boilerplate_block_removal(docs):
    out = _removed(docs, n=4, min_docs=3)
    # d4-6: first 4-word block "footer one two three" df=3 → removed
    assert out[4] == (2, 1, "unique4 a b c")
    assert out[5] == (2, 1, "unique5 d e f")
    assert out[6] == (2, 1, "unique6 g h i")
    # d0/d1 share no full 4-word BLOCK (alignment differs) → untouched
    assert out[0] == (2, 0, "alpha beta gamma delta epsilon zz qq")
    assert out[3] == (1, 0, "tiny doc")


def test_boilerplate_all_segments_removed_keeps_row(spark):
    df = spark.createDataFrame(
        [(i, "spam spam spam spam") for i in range(3)], ["doc_id", "text"]
    )
    out = _removed(df, n=4, min_docs=3)
    assert out == {i: (1, 1, "") for i in range(3)}


def test_boilerplate_fixed_point_when_no_duplicates(docs):
    # min_docs above corpus size → identity transform (normalized text)
    out = _removed(docs, n=4, min_docs=99)
    norm = {
        r.doc_id: r.t
        for r in docs.select(
            "doc_id",
            F.array_join(
                F.split(F.lower(F.trim("text")), r"\s+"), " "
            ).alias("t"),
        ).collect()
    }
    assert {k: v[2] for k, v in out.items()} == norm
    assert all(v[1] == 0 for v in out.values())


def test_boilerplate_line_mode(spark):
    df = spark.createDataFrame(
        [
            (0, "KEEP ME\nCopyright Footer\nbody zero"),
            (1, "body one\nCopyright Footer"),
            (2, "Copyright Footer\nbody two"),
        ],
        ["doc_id", "text"],
    )
    out = _removed(df, delimiter="\n", min_docs=2)
    assert out[0] == (3, 1, "KEEP ME\nbody zero")
    assert out[1] == (2, 1, "body one")
    assert out[2] == (2, 1, "body two")


def test_boilerplate_blank_lines_never_classified(spark):
    """Blank lines (consecutive delimiters / trailing newline) must
    NEVER be removed as boilerplate even when every doc has them —
    they are structure, not content (stripping them corpus-wide would
    collapse paragraph breaks of otherwise-unique documents)."""
    df = spark.createDataFrame(
        [
            (0, "para one zero\n\npara two zero\n"),
            (1, "para one one\n\npara two one\n"),
            (2, "para one two\n\npara two two\n"),
        ],
        ["doc_id", "text"],
    )
    out = _removed(df, delimiter="\n", min_docs=3)
    for d in range(3):
        n_seg, removed, clean = out[d]
        assert removed == 0
        assert clean == df.collect()[d].text  # byte-identical round-trip


def test_boilerplate_hash_vs_string_identical(docs):
    assert _removed(docs, key="hash") == _removed(docs, key="string")


def _scrubbed(df, **kw):
    return {
        r.doc_id: (r.n_tokens, r.removed_tokens, r.clean_text)
        for r in remove_duplicate_spans(df, **kw).collect()
    }


def test_span_scrub_cuts_exact_covered_tokens(docs):
    out = _scrubbed(docs, n=3, min_docs=2)
    # d0: windows 1-3 duplicated (shared 5-word run) → tokens 1-5 cut
    assert out[0] == (7, 5, "zz qq")
    assert out[1] == (7, 5, "yy ww")
    # d2: one duplicated window "one two three" → 3 tokens cut
    assert out[2] == (6, 3, "four five six")
    # short doc: no windows, untouched
    assert out[3] == (2, 0, "tiny doc")
    # d4: "footer one two" + "one two three" dup → tokens 1-4 cut
    assert out[4] == (8, 4, "unique4 a b c")


def test_span_scrub_overlapping_spans_merge(spark):
    # two overlapping duplicated windows must not double-remove
    df = spark.createDataFrame(
        [(0, "p q r s t END"), (1, "p q r s t OTHER")], ["doc_id", "text"]
    )
    out = _scrubbed(df, n=3, min_docs=2)
    assert out[0] == (6, 5, "end")
    assert out[1] == (6, 5, "other")


def test_span_scrub_fully_duplicated_doc_keeps_row(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c")], ["doc_id", "text"]
    )
    out = _scrubbed(df, n=3, min_docs=2)
    assert out == {0: (3, 3, ""), 1: (3, 3, "")}


def test_span_scrub_fixed_point_when_no_duplicates(docs):
    out = _scrubbed(docs, n=3, min_docs=99)
    assert all(v[1] == 0 for v in out.values())


def test_null_text_rows_account_as_zero(spark):
    """NULL text (common in crawled corpora) must behave as an empty
    doc in all three operators — no -1 counts from F.size(NULL)."""
    df = spark.createDataFrame(
        [(0, None), (1, "a b c d e f")], "doc_id int, text string"
    )
    s = _stats(df, n=3, min_docs=2)
    assert s[0] == (0, 0, 0, True)
    sc = _scrubbed(df, n=3, min_docs=2)
    assert sc[0] == (0, 0, "")
    b = _removed(df, n=4, min_docs=2)
    assert b[0] == (0, 0, "")


def test_span_scrub_hash_vs_string_identical(docs):
    assert _scrubbed(docs, key="hash") == _scrubbed(docs, key="string")


def test_span_plans_stay_jvm_side(docs):
    """No Python evaluation in either operator's plan (the window and
    segment builders are HOF expression chains), and the frequency agg
    is a partial-agg HashAggregate, not a row-list collect."""
    for plan_df in (
        duplicate_span_stats(docs),
        remove_boilerplate_segments(docs),
        remove_duplicate_spans(docs),
    ):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "HashAggregate" in plan


def test_dedup_within_doc_semantics(spark):
    from metal_history_knowledge_graph_spark.operators.spans import (
        dedup_within_doc,
    )

    df = spark.createDataFrame(
        [
            (0, "nav bar body one nav bar body two nav bar"),
            (1, "all unique words here now"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_segments, r.removed_segments, r.clean_text)
        for r in dedup_within_doc(df, n=2).collect()
    }
    # d0 blocks: [nav bar][body one][nav bar][body two][nav bar]
    assert out[0] == (5, 2, "nav bar body one body two")
    assert out[1] == (3, 0, "all unique words here now")
    # line mode keeps blank lines even when repeated
    df2 = spark.createDataFrame(
        [(0, "a\n\nb\n\na")], ["doc_id", "text"]
    )
    [r] = dedup_within_doc(df2, delimiter="\n").collect()
    assert r.clean_text == "a\n\nb\n"
    assert r.removed_segments == 1  # only the repeated 'a'


def test_normalize_unicode_forms(spark):
    from metal_history_knowledge_graph_spark.operators.normalize import (
        normalize_unicode,
    )

    rows = [
        (0, "café"),        # composes to café
        (1, "ﬁne"),          # ligature: NFC keeps, NFKC folds
        (2, "각"),  # jamo → 각
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    nfc = {r.doc_id: r.text for r in normalize_unicode(df, "text").collect()}
    assert nfc[0] == "café" and len(nfc[0]) == 4
    assert nfc[1] == "ﬁne"
    assert nfc[2] == "각" and len(nfc[2]) == 1
    assert nfc[3] is None
    nfkc = {
        r.doc_id: r.text
        for r in normalize_unicode(df, "text", form="NFKC").collect()
    }
    assert nfkc[1] == "fine"  # compatibility fold
    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_unicode(df, "text", form="XX")


def test_dedup_keep_best_picks_top_score(spark):
    """Best-scoring copy survives per fingerprint, ties break by min
    id, n_dropped counts the rest; singletons report 0."""
    from metal_history_knowledge_graph_spark.operators.dedup import (
        dedup_keep_best,
    )

    docs = spark.createDataFrame(
        [
            (1, "Same  Article", 10),
            (2, "same article", 90),     # normalized-identical, best score
            (3, "SAME ARTICLE  ", 90),   # tied score, higher id -> loses
            (4, "unique doc", 5),
        ],
        "doc_id long, text string, score long",
    )
    out = {r.doc_id: (r.score, r.n_dropped)
           for r in dedup_keep_best(docs, "score").collect()}
    assert out == {2: (90, 2), 4: (5, 0)}
