"""NB bag-of-words quality classifier (operators/quality_clf): the
log-odds weights are pinned against math.log, the integer scoring is
replayed exactly in Python, the classifier actually separates classes
with disjoint vocabulary, and the scoring plan stays broadcast +
single-agg (no sort-merge shuffle of the corpus side)."""

import math

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.quality_clf import (
    MICRO,
    score_documents_nb,
    train_nb_classifier,
)

#: two classes with disjoint content vocabulary plus a shared stopword
LABELED = [
    (0, 1, "good clean prose text"),
    (1, 1, "clean prose text flows"),
    (2, 1, "good text reads well"),
    (3, 0, "spam junk text buy"),
    (4, 0, "junk spam text click"),
]


def _train_df(spark):
    return spark.createDataFrame(
        LABELED, "doc_id long, label int, text string"
    )


def test_weights_pinned_against_math_log(spark):
    weights, params = train_nb_classifier(_train_df(spark))
    # totals: pos docs carry 4+4+4=12 tokens, neg docs 4+4=8
    assert params["total_pos"] == 12 and params["total_neg"] == 8
    assert params["n_pos_docs"] == 3 and params["n_neg_docs"] == 2
    vocab = params["vocab_size"]
    dp, dn = 12 + vocab, 8 + vocab
    rows = {r["term"]: r for r in weights.collect()}
    assert rows["text"]["pos"] == 3 and rows["text"]["neg"] == 2
    for term, r in rows.items():
        expect = math.log((r["pos"] + 1) / dp) - math.log((r["neg"] + 1) / dn)
        assert r["w_micro"] == math.floor(expect * MICRO + 0.5) or \
            r["w_micro"] == -math.floor(-expect * MICRO + 0.5), term
    assert params["prior_micro"] == math.floor(math.log(3 / 2) * MICRO + 0.5)
    assert params["oov_w_micro"] == math.floor(
        math.log(dn / dp) * MICRO + 0.5
    ) or params["oov_w_micro"] == -math.floor(
        -math.log(dn / dp) * MICRO + 0.5
    )


def test_classifier_separates_disjoint_vocab(spark):
    weights, params = train_nb_classifier(_train_df(spark))
    held = spark.createDataFrame(
        [
            (10, "clean prose flows well"),    # positive vocabulary
            (11, "buy spam junk click"),       # negative vocabulary
            (12, ""),                          # token-free → bare prior
            (13, "zzz unseen words only"),     # all-OOV
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in score_documents_nb(
            held, weights, params["prior_micro"], params["oov_w_micro"]
        ).collect()
    }
    assert out[10]["clf_keep"] and out[10]["score_micro"] > 0
    assert not out[11]["clf_keep"] and out[11]["score_micro"] < 0
    # empty doc: score is exactly the prior (pos-majority corpus → keep)
    assert out[12]["score_micro"] == params["prior_micro"]
    assert out[12]["clf_tokens"] == 0
    # all-OOV: prior + 4·oov_w
    assert out[13]["score_micro"] == (
        params["prior_micro"] + 4 * params["oov_w_micro"]
    )


def test_exact_integer_replay(spark):
    weights, params = train_nb_classifier(_train_df(spark))
    w = {r["term"]: r["w_micro"] for r in weights.collect()}
    held = spark.createDataFrame(
        [(20, "good spam zzz text")], "doc_id long, text string"
    )
    row = score_documents_nb(
        held, weights, params["prior_micro"], params["oov_w_micro"]
    ).head()
    expect = params["prior_micro"] + sum(
        w.get(t, params["oov_w_micro"])
        for t in ["good", "spam", "zzz", "text"]
    )
    assert row["score_micro"] == expect
    assert row["clf_tokens"] == 4


def test_single_class_raises(spark):
    df = spark.createDataFrame(
        [(0, 1, "a b"), (1, 1, "c d")], "doc_id long, label int, text string"
    )
    with pytest.raises(ValueError, match="both classes"):
        train_nb_classifier(df)


def test_scoring_plan_broadcasts_weights(spark):
    """The weight join must be a BroadcastHashJoin (vocabulary-sized
    dim) — the corpus side is never shuffled for the join."""
    weights, params = train_nb_classifier(_train_df(spark))
    held = spark.createDataFrame(
        [(30, "good text")], "doc_id long, text string"
    )
    plan = score_documents_nb(
        held, weights, params["prior_micro"], params["oov_w_micro"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.split("AdaptiveSparkPlan")[0]


def test_incremental_update_equals_retrain(spark):
    """update(train(A), B) must be bit-identical to train(A ∪ B) —
    the sufficient statistics are mergeable."""
    from metal_history_knowledge_graph_spark.operators.quality_clf import (
        update_nb_classifier,
    )

    a = _train_df(spark)
    b = spark.createDataFrame(
        [(10, 1, "fresh clean text good"), (11, 0, "junk click text")],
        "doc_id long, label int, text string",
    )
    w_a, p_a = train_nb_classifier(a)
    w_inc, p_inc = update_nb_classifier(w_a, p_a, b)
    w_full, p_full = train_nb_classifier(a.unionByName(b))
    assert p_inc == p_full
    inc = {r["term"]: (r["pos"], r["neg"], r["w_micro"])
           for r in w_inc.collect()}
    full = {r["term"]: (r["pos"], r["neg"], r["w_micro"])
            for r in w_full.collect()}
    assert inc == full
