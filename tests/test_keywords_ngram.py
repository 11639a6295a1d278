"""TF-IDF keyword extraction (operators/keywords) and Kneser-Ney
bigram statistics (operators/ngram_lm): idf pinned against math.log,
top-k tie-breaks, exact integer KN replay in pure Python, and the
narrow bigram plan (no self-join)."""

import math

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.keywords import (
    MICRO,
    idf_log_table,
    tfidf_keywords,
)
from metal_history_knowledge_graph_spark.operators.ngram_lm import (
    D_MICRO,
    FLOOR_NLL_MICRO,
    bigram_kn,
    bigram_pairs,
    kn_event_probs,
    kn_score_docs,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "cat and dog and cat"),
    (3, ""),  # token-free: counts toward N, contributes no terms
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_idf_pinned_against_math_log(spark):
    _kw, idf, n_docs = tfidf_keywords(_docs(spark), k=3)
    assert n_docs == 4
    rows = {r["term"]: r for r in idf.collect()}
    # df: the=2 cat=2 sat=2 dog=2 on=1 mat=1 and=1
    assert rows["the"]["df"] == 2 and rows["and"]["df"] == 1
    for term, r in rows.items():
        expect = math.floor(math.log(4 / r["df"]) * MICRO + 0.5)
        assert r["idf_micro"] == expect, term
    # log table: one row per distinct df (2 here: 1 and 2)
    assert idf_log_table(idf).count() == 2


def test_keyword_topk_and_tiebreak(spark):
    kw, idf, _ = tfidf_keywords(_docs(spark), k=2)
    idf_m = {r["term"]: r["idf_micro"] for r in idf.collect()}
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["score_micro"])
        for r in kw.collect()
    }
    # doc 2: cat tf=2 df=2, and tf=2 df=1 → 'and' has higher idf, wins
    assert got[(2, 1)] == ("and", 2 * idf_m["and"])
    assert got[(2, 2)] == ("cat", 2 * idf_m["cat"])
    # doc 1: the/dog/sat all tf=1 df=2 → equal scores, term ASC breaks
    assert got[(1, 1)][0] == "dog" and got[(1, 2)][0] == "sat"
    # token-free doc yields no keyword rows
    assert not any(d == 3 for d, _r in got)


def test_bigram_pairs_shape(spark):
    rows = sorted(
        (r["w1"], r["w2"]) for r in bigram_pairs(_docs(spark)).collect()
    )
    assert ("the", "cat") in rows and ("and", "cat") in rows
    # doc sizes 6, 3, 5, 0 → 5 + 2 + 4 bigram occurrences
    assert len(rows) == 11


def test_kn_exact_python_replay(spark):
    out = {
        (r["w1"], r["w2"]): r for r in bigram_kn(_docs(spark)).collect()
    }
    # independent pure-Python replay
    toks = [d[1].split() for d in DOCS if d[1]]
    bgs = [(t[i], t[i + 1]) for t in toks for i in range(len(t) - 1)]
    c12, c1, fwd, bwd = {}, {}, {}, {}
    for a, b in bgs:
        c12[(a, b)] = c12.get((a, b), 0) + 1
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        fwd[a] = fwd.get(a, 0) + 1
        bwd[b] = bwd.get(b, 0) + 1
    nbt = len(c12)
    assert len(out) == nbt
    for (a, b), c in c12.items():
        r = out[(a, b)]
        pcont = (MICRO * bwd[b]) // nbt
        pkn = (MICRO * c - D_MICRO) // c1[a] + (
            ((D_MICRO * fwd[a]) // c1[a]) * pcont
        ) // MICRO
        assert (r["c12"], r["c1"], r["n1_fwd"], r["n1_bwd"]) == (
            c, c1[a], fwd[a], bwd[b]
        ), (a, b)
        assert r["pcont_micro"] == pcont and r["pkn_micro"] == pkn, (a, b)
    # KN normalization: the discounted (term-1) mass over OBSERVED
    # continuations plus the backoff weight λ equals 1 — the λ·p_cont
    # tail spreads over the FULL vocabulary, so only this partial
    # invariant is checkable from the observed rows (floor slack
    # ≤ one micro-unit per observed continuation).
    a = "the"
    term1_mass = sum(
        (MICRO * c - D_MICRO) // c1[a]
        for (x, _b), c in c12.items() if x == a
    )
    lam = (D_MICRO * fwd[a]) // c1[a]
    assert MICRO - fwd[a] - 1 <= term1_mass + lam <= MICRO


def _py_kn_model(train_rows):
    toks = [t.split() for _, t in train_rows if t]
    bgs = [(t[i], t[i + 1]) for t in toks for i in range(len(t) - 1)]
    c12, c1, fwd, bwd = {}, {}, {}, {}
    for a, b in bgs:
        c12[(a, b)] = c12.get((a, b), 0) + 1
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        fwd[a] = fwd.get(a, 0) + 1
        bwd[b] = bwd.get(b, 0) + 1
    nbt = len(c12)
    return c12, c1, fwd, bwd, nbt


def _py_event_p(model, a, b):
    c12, c1, fwd, bwd, nbt = model
    pcont = (MICRO * bwd[b]) // nbt if b in bwd else None
    if (a, b) in c12:
        p = (MICRO * c12[(a, b)] - D_MICRO) // c1[a] + (
            ((D_MICRO * fwd[a]) // c1[a]) * pcont
        ) // MICRO
    elif a in c1 and pcont is not None:
        p = (((D_MICRO * fwd[a]) // c1[a]) * pcont) // MICRO
    elif pcont is not None:
        p = pcont
    else:
        p = 1
    return max(p, 1)


SCORE_DOCS = DOCS + [
    (4, "the cat sat"),        # all bigrams seen
    (5, "dog sat on mat"),     # unseen pairs of known words
    (6, "zebra cat runs"),     # unknown w1 and unknown w2 paths
    (7, "qq"),                 # single token: floor average
]


def test_kn_event_probs_python_replay(spark):
    train = spark.createDataFrame(DOCS, "doc_id long, text string")
    lm = bigram_kn(train)
    score = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.p_micro)
        for r in kn_event_probs(score, lm).collect()
    )
    model = _py_kn_model(DOCS)
    want = []
    for i, t in SCORE_DOCS:
        w = t.split()
        for j in range(len(w) - 1):
            want.append((i, _py_event_p(model, w[j], w[j + 1])))
    assert got == sorted(want)


def test_kn_score_docs_and_log_table(spark):
    train = spark.createDataFrame(DOCS, "doc_id long, text string")
    lm = bigram_kn(train)
    score = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
    scored, logtab = kn_score_docs(score, lm, keep_below_micro=12_000_000)
    tab = {r.p_micro: r.nll_micro for r in logtab.collect()}
    # log table pinned against math.log with HALF_UP rounding
    for p, nll in tab.items():
        assert nll == math.floor(-math.log(p / MICRO) * MICRO + 0.5), p
    model = _py_kn_model(DOCS)
    got = {r.doc_id: r for r in scored.collect()}
    assert set(got) == {i for i, _ in SCORE_DOCS}
    for i, t in SCORE_DOCS:
        w = t.split()
        ps = [_py_event_p(model, w[j], w[j + 1]) for j in range(len(w) - 1)]
        r = got[i]
        assert r.kn_bigrams == len(ps)
        want_sum = sum(tab[p] for p in ps)
        assert r.nll_sum_micro == want_sum
        if ps:
            assert r.avg_nll_micro == want_sum // len(ps)
        else:
            assert r.avg_nll_micro == FLOOR_NLL_MICRO
        assert r.kn_keep == (r.avg_nll_micro <= 12_000_000)
    # seen-bigram doc scores far better than the unknown-word doc
    assert got[4].avg_nll_micro < got[6].avg_nll_micro


def test_kn_discount_guard(spark):
    with pytest.raises(ValueError, match="discount_micro"):
        bigram_kn(_docs(spark), discount_micro=MICRO)


def test_bigram_plan_has_no_join_before_agg(spark):
    """Bigram expansion must be a narrow per-row transform — no
    positional self-join of the token table."""
    plan = bigram_pairs(_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan


def test_df_merge_equals_retrain(spark):
    """merge_df_counts + idf_from_counts over (old, new-batch) must be
    bit-identical to tfidf_keywords' idf retrained on the union."""
    from metal_history_knowledge_graph_spark.operators.keywords import (
        idf_from_counts,
        merge_df_counts,
        tfidf_keywords,
    )

    old = _docs(spark)
    new = spark.createDataFrame(
        [(10, "the zebra ran"), (11, "cat zebra")],
        "doc_id long, text string",
    )
    _kw, idf_old, n_old = tfidf_keywords(old, k=2)
    merged_counts, n_merged = merge_df_counts(idf_old, new, n_old)
    inc = {r["term"]: (r["df"], r["idf_micro"])
           for r in idf_from_counts(merged_counts, n_merged).collect()}
    _kw2, idf_full, n_full = tfidf_keywords(old.unionByName(new), k=2)
    assert n_merged == n_full == 6
    full = {r["term"]: (r["df"], r["idf_micro"]) for r in idf_full.collect()}
    assert inc == full
    assert inc["zebra"][0] == 2


def test_keyword_plan_shape(spark):
    """idf attaches by broadcast and the top-k window partitions by
    doc_id — no global (unpartitioned) sort in the plan."""
    kw, _idf, _n = tfidf_keywords(_docs(spark), k=2)
    plan = kw._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # every Sort is the window's local per-partition sort, never a
    # global ordering of the corpus
    assert "Sort [doc_id" in plan or "Sort [" in plan
    assert "rangepartitioning" not in plan.lower()


# ---- PMI collocations (ngram_lm.pmi_collocations)


def test_pmi_exact_python_replay(spark):
    """Exact integer replay of the full collocation table in pure
    Python — every count, margin and the two-step floor-divide."""
    from collections import Counter

    from metal_history_knowledge_graph_spark.operators.ngram_lm import (
        pmi_collocations,
    )

    docs = [
        (0, "new york is a city and new york is big"),
        (1, "the city of new york and the big apple"),
        (2, "a big city is a big city"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    c12 = Counter()
    for _, text in docs:
        t = text.split()
        for i in range(len(t) - 1):
            c12[(t[i], t[i + 1])] += 1
    c1, c2 = Counter(), Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        c2[w2] += c
    n = sum(c12.values())
    want = {
        (w1, w2): (c, c1[w1], c2[w2], n,
                   (((1_000_000 * c) // c1[w1]) * n) // c2[w2])
        for (w1, w2), c in c12.items() if c >= 2
    }
    got = {
        (r.w1, r.w2): (r.c12, r.c1, r.c2, r.n_bigrams, r.lift_ppm)
        for r in pmi_collocations(df, min_count=2).collect()
    }
    assert got == want
    # 'new york' is a true collocation: lift far above 1e6 (= PMI 0)
    assert got[("new", "york")][4] > 1_000_000


def test_pmi_min_count_prunes_and_guard(spark):
    from metal_history_knowledge_graph_spark.operators.ngram_lm import (
        pmi_collocations,
    )

    df = spark.createDataFrame(
        [(0, "a b a b c d")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2) for r in pmi_collocations(df, min_count=2).collect()}
    assert got == {("a", "b")}  # "b a", "b c", "c d" occur once
    all_rows = pmi_collocations(df, min_count=1).collect()
    assert len(all_rows) == 4
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(df, min_count=0)
