"""Generalized suffix array by prefix doubling (operators/suffix.py):
exact parity with a direct Python sort of all suffixes on seeded
random strings (including repeat-heavy alphabets that force many
doubling rounds); cross-document duplicate suffixes sharing a dense
rank; prefix-of ordering; partition invariance; empty/NULL edges; the
suffix_array total-order view."""

import random

from metal_history_knowledge_graph_spark.operators.suffix import (
    lcp_adjacent,
    longest_repeats,
    suffix_array,
    suffix_ranks,
)


def ref_ranks(rows):
    sufs = sorted({(t[p:],) for _, t in rows for p in range(len(t or ""))})
    rank = {s: i for i, (s,) in enumerate(sufs)}
    return {
        (i, p + 1, rank[t[p:]]) for i, t in rows for p in range(len(t or ""))
    }


def _got(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.pos, r.suffix_rank)
        for r in suffix_ranks(df, **kw).collect()
    }


def test_matches_sorted_suffixes_random(spark):
    rng = random.Random(5)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(1, 60))))
        for i in range(12)
    ]
    assert _got(spark, rows) == ref_ranks(rows)


def test_repeat_heavy_needs_many_rounds(spark):
    # aaaa... suffixes differ only by length: every doubling round is
    # exercised and the prefix-of-sorts-first sentinel decides ALL order
    rows = [(0, "a" * 50), (1, "aa" + "b" + "a" * 20)]
    assert _got(spark, rows) == ref_ranks(rows)


def test_cross_doc_equal_suffixes_share_rank(spark):
    rows = [(0, "xyz"), (1, "xyz"), (2, "qxyz")]
    got = _got(spark, rows)
    ranks = {(i, p): r for i, p, r in got}
    assert ranks[(0, 1)] == ranks[(1, 1)] == ranks[(2, 2)]
    assert got == ref_ranks(rows)


def test_partition_invariance(spark):
    rows = [(i, "banana" * (i % 3 + 1)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r.doc_id, r.pos, r.suffix_rank) for r in suffix_ranks(df).collect()}
    b = {
        (r.doc_id, r.pos, r.suffix_rank)
        for r in suffix_ranks(df.repartition(13)).collect()
    }
    assert a == b == ref_ranks(rows)


def test_empty_and_null_docs(spark):
    rows = [(0, ""), (1, None), (2, "ab")]
    assert _got(spark, rows) == ref_ranks([(2, "ab")])


def _lcp(a, b):
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def ref_lcp_rows(rows):
    sufs = sorted(
        (t[p:], i, p + 1) for i, t in rows for p in range(len(t or ""))
    )
    out = set()
    for r, (s, i, p) in enumerate(sufs):
        out.add((r, i, p, 0 if r == 0 else _lcp(s, sufs[r - 1][0])))
    return out


def test_lcp_adjacent_matches_reference(spark):
    rng = random.Random(11)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(rng.randint(1, 40))))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.sa_rank, r.doc_id, r.pos, r.lcp)
        for r in lcp_adjacent(df).collect()
    }
    assert got == ref_lcp_rows(rows)


def test_lcp_identical_docs_and_short_strings(spark):
    # identical whole docs exercise the overshoot-then-cap path: the
    # level-h add fires on strings shorter than h and the remaining-
    # length cap must restore the exact LCP
    rows = [(0, "ab"), (1, "ab"), (2, "abab"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.sa_rank, r.doc_id, r.pos, r.lcp)
        for r in lcp_adjacent(df).collect()
    }
    assert got == ref_lcp_rows(rows)


def test_longest_repeats_counts_overlapping(spark):
    # "aaaa" contains "aa" 3 times (overlapping) plus one in doc 1
    rows = [(0, "aaaa"), (1, "zaaz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.substring, r.rep_len, r.n_occ)
        for r in longest_repeats(df, min_len=2, k=5).collect()
    }
    # repeats >= 2 chars: "aaa" occurs 2x (doc0 pos1,2), "aa" occurs
    # 3x in doc0 + 1x in doc1 = 4
    assert ("aaa", 3, 2) in got
    assert ("aa", 2, 4) in got


def test_longest_repeats_cross_doc(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "a quick brown dog"),
        (2, "no overlap here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = longest_repeats(df, min_len=5, k=3).collect()
    assert top[0].substring == " quick brown "
    assert top[0].rep_len == 13 and top[0].n_occ == 2


def test_suffix_array_total_order(spark):
    rows = [(0, "mississippi"), (1, "missing")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sa = sorted(
        (r.sa_rank, r.doc_id, r.pos) for r in suffix_array(df).collect()
    )
    n = sum(len(t) for _, t in rows)
    assert [x[0] for x in sa] == list(range(n))  # dense total order
    # materialized order equals suffix string order with (id,pos) ties
    texts = dict(rows)
    sufs = [texts[d][p - 1 :] for _, d, p in sa]
    assert sufs == sorted(sufs)
