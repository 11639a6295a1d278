"""DSIR importance resampling (operators/dsir.py): log-ratio fit
pinned against a pure-Python replay, signed floor-divide semantics,
partitioning determinism, selection order, and the JVM-only plan."""

import math

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.dsir import (
    MICRO,
    default_lr_micro,
    dsir_logratio_table,
    dsir_select,
    dsir_weights,
    gram_buckets,
)

B = 64


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_logratio_matches_python_replay(spark):
    """The only float step (the two ln()s per bucket) must match
    math.log exactly after micro-nat rounding — the same pin
    lm_score's log table carries."""
    target = _docs(spark, [(0, "aa bb aa"), (1, "bb cc")])
    raw = _docs(spark, [(0, "aa bb aa"), (1, "bb cc"), (2, "dd ee dd ee")])
    lr, params = dsir_logratio_table(target, raw, n_buckets=B)
    got = {r.bucket: r.lr_micro for r in lr.collect()}

    def py_buckets(texts):
        import hashlib

        counts = {}
        for t in texts:
            toks = [w for w in t.lower().strip().split() if w]
            grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            for g in grams:
                h = int(hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:15], 16)
                counts[h % B] = counts.get(h % B, 0) + 1
        return counts

    ct = py_buckets(["aa bb aa", "bb cc"])
    cr = py_buckets(["aa bb aa", "bb cc", "dd ee dd ee"])
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    assert params["t_total"] == t_tot and params["r_total"] == r_tot
    expected = {}
    for b in set(ct) | set(cr):
        v = (
            math.log((ct.get(b, 0) + 1) / (t_tot + B))
            - math.log((cr.get(b, 0) + 1) / (r_tot + B))
        ) * MICRO
        # HALF_UP like Spark's F.round
        expected[b] = math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)
    assert got == expected
    u = (
        math.log((r_tot + B) / (t_tot + B)) * MICRO
    )
    assert params["unseen_lr_micro"] == (
        math.floor(u + 0.5) if u >= 0 else -math.floor(-u + 0.5)
    )
    assert params["unseen_lr_micro"] == default_lr_micro(t_tot, r_tot, B)


def test_weights_signed_floor_and_gramless(spark):
    """Docs matching the target weigh positive, off-target negative;
    the per-gram divide FLOORS (ANSI // semantics — -7/2 → -4, never
    -3); gramless docs weigh 0 and survive the left join.
    Token choice matters at B=64: 'zz'/'qq' grams verified
    collision-free against the 'aa'/'bb' target buckets (e.g. the
    original 'zz yy' bigram collided with 'aa bb' in bucket 19 and
    flipped the sign — hashing-trick collisions are real)."""
    target = _docs(spark, [(0, "aa aa aa bb")])
    raw = _docs(spark, [(0, "aa aa aa bb"), (1, "zz qq zz qq zz")])
    lr, params = dsir_logratio_table(target, raw, n_buckets=B)
    scored = {
        r.doc_id: r
        for r in dsir_weights(
            _docs(spark, [(10, "aa aa bb"), (11, "zz qq"), (12, "  ")]),
            lr, n_buckets=B, unseen_lr_micro=params["unseen_lr_micro"],
        ).collect()
    }
    assert scored[10].weight_micro > 0 > scored[11].weight_micro
    assert scored[12].n_grams == 0 and scored[12].weight_micro == 0
    assert scored[12].weight_per_gram_micro == 0
    for d in (10, 11):
        r = scored[d]
        assert r.weight_per_gram_micro == math.floor(
            r.weight_micro / r.n_grams
        )
    # bigrams count: "aa aa bb" → 3 unigrams + 2 bigrams
    assert scored[10].n_grams == 5


def test_deterministic_across_partitioning_and_selection_order(spark):
    rows = [(i, f"w{i % 7} w{(i * 3) % 7} common w{i % 5}") for i in range(60)]
    target = _docs(spark, rows[:20])
    raw = _docs(spark, rows)
    lr, params = dsir_logratio_table(target, raw, n_buckets=B)
    a = sorted(
        (r.doc_id, r.weight_micro)
        for r in dsir_weights(_docs(spark, rows), lr, n_buckets=B,
                              unseen_lr_micro=params["unseen_lr_micro"]).collect()
    )
    b = sorted(
        (r.doc_id, r.weight_micro)
        for r in dsir_weights(_docs(spark, rows).repartition(13), lr,
                              n_buckets=B,
                              unseen_lr_micro=params["unseen_lr_micro"]).collect()
    )
    assert a == b
    top = dsir_select(
        dsir_weights(_docs(spark, rows), lr, n_buckets=B,
                     unseen_lr_micro=params["unseen_lr_micro"]), k=10
    ).collect()
    assert len(top) == 10
    ws = [(r.weight_micro, r.doc_id) for r in top]
    assert ws == sorted(ws, key=lambda t: (-t[0], t[1]))


def test_plan_jvm_only_and_broadcast(spark):
    rows = [(i, f"w{i % 7} common") for i in range(30)]
    lr, params = dsir_logratio_table(_docs(spark, rows[:10]),
                                     _docs(spark, rows), n_buckets=B)
    out = dsir_weights(_docs(spark, rows), lr.localCheckpoint(eager=True),
                       n_buckets=B,
                       unseen_lr_micro=params["unseen_lr_micro"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # the ratio-table join


def test_gram_buckets_counts_occurrences(spark):
    """Counts, not sets: a repeated gram contributes each occurrence
    (DSIR's weight is a count-vector dot product)."""
    df = _docs(spark, [(1, "aa aa aa")])
    # grams: aa, aa, aa, "aa aa", "aa aa" → 5 occurrences
    assert gram_buckets(df, n_buckets=B).count() == 5
