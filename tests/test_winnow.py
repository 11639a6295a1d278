"""Winnowing fingerprints (operators/winnow.py): exact-set parity
with a pure-Python Schleimer/Wilkerson/Aiken reference on seeded
random strings; the MOSS detection guarantee (shared substring of
length >= w+k-1 => shared fingerprint value); insertion robustness
that the stride sampler lacks; short/empty-doc edges; candidate-pair
join with the stop-fingerprint cap."""

import hashlib
import random
import re

import pytest

from metal_history_knowledge_graph_spark.operators.winnow import (
    winnow_candidate_pairs,
    winnow_fingerprints,
    winnow_probe,
)


def _h(gram: str) -> int:
    return int(hashlib.md5(("win:" + gram).encode()).hexdigest()[:15], 16)


def ref_winnow(text, k, w):
    norm = re.sub(r"\s+", " ", text.strip(" ").lower())
    if not norm:
        return set()
    if len(norm) < k:
        return {(1, _h(norm))}
    hs = [_h(norm[i : i + k]) for i in range(len(norm) - k + 1)]
    out = set()
    for j in range(max(1, len(hs) - w + 1)):
        s = hs[j : j + w]
        m = min(s)
        ri = len(s) - 1 - s[::-1].index(m)  # rightmost minimum
        out.add((j + ri + 1, m))
    return out


def _run(spark, rows, k=5, w=4):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }


def test_matches_python_reference(spark):
    rng = random.Random(7)
    rows = [
        (i, " ".join(rng.choice("ab cde fgh ijk lm".split())
                     for _ in range(rng.randint(1, 40))))
        for i in range(30)
    ]
    got = _run(spark, rows, k=5, w=4)
    want = {(i, p, f) for i, t in rows for (p, f) in ref_winnow(t, 5, 4)}
    assert got == want


def test_detection_guarantee(spark):
    # any shared substring of length >= w + k - 1 must contribute at
    # least one shared fingerprint VALUE (the MOSS guarantee)
    k, w = 5, 4
    shared = "xxqzjvwkpyyt"  # length 12 >= w + k - 1 = 8
    rows = [(0, "aaaa " + shared + " bbbb"), (1, "cc " + shared + " dddddd")]
    fps = _run(spark, rows, k=k, w=w)
    vals0 = {f for (i, p, f) in fps if i == 0}
    vals1 = {f for (i, p, f) in fps if i == 1}
    assert vals0 & vals1


def test_insertion_robustness_vs_stride(spark):
    # winnowing selections are local: a 3-char front insertion keeps
    # most fingerprint VALUES (positions shift); the stride sampler's
    # sets diverge almost completely on the same perturbation
    from metal_history_knowledge_graph_spark.operators.textstats import (
        rolling_fingerprints,
    )

    rng = random.Random(11)
    base = "".join(rng.choice("abcdefgh ") for _ in range(400))
    rows = [(0, base), (1, "zq " + base)]
    fps = _run(spark, rows, k=8, w=6)
    v0 = {f for (i, p, f) in fps if i == 0}
    v1 = {f for (i, p, f) in fps if i == 1}
    assert len(v0 & v1) / len(v0) > 0.8
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r.doc_id: set(r.fingerprints)
         for r in rolling_fingerprints(df, window=8, keep_every=8).collect()}
    assert len(s[0] & s[1]) / len(s[0]) < 0.3


def test_short_and_empty_docs(spark):
    rows = [(0, "ab"), (1, ""), (2, None), (3, "   ")]
    got = _run(spark, rows, k=5, w=4)
    assert got == {(0, 1, _h("ab"))}


def test_density_bound(spark):
    # expected density 2/(w+1); allow generous slack on one sample
    rng = random.Random(3)
    text = "".join(rng.choice("abcdefghij klmnop ") for _ in range(2000))
    k, w = 8, 12
    fps = _run(spark, [(0, text)], k=k, w=w)
    n_grams = len(re.sub(r"\s+", " ", text.strip(" ").lower())) - k + 1
    density = len(fps) / n_grams
    assert 0.5 * 2 / (w + 1) < density < 2.5 * 2 / (w + 1)


def test_candidate_pairs_and_stop_cap(spark):
    boiler = "the same licence header on every page here"
    rows = [
        (0, boiler + " unique zebra quokka xylophone content"),
        (1, boiler + " unique zebra quokka xylophone content"),
        (2, boiler + " completely different trailing material"),
        (3, "nothing in common with anything else at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=6, w=4)
    pairs = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in winnow_candidate_pairs(fps, min_shared=2).collect()
    }
    assert (0, 1) in pairs  # exact dup pair shares everything
    assert pairs[(0, 1)] == max(pairs.values())
    # boilerplate fingerprints live in >2 docs; capping df at 2 keeps
    # the true dup pair but severs the boilerplate-only (0,2)/(1,2)
    capped = {
        (r.doc_a, r.doc_b)
        for r in winnow_candidate_pairs(fps, min_shared=2, max_df=2).collect()
    }
    assert (0, 1) in capped
    assert (0, 2) not in capped and (1, 2) not in capped


def test_probe_equals_rebuild_restricted(spark):
    """Incremental probe decision-identity: probing new docs against
    an existing index yields EXACTLY the rebuilt union's pairs that
    touch a new doc — same shared counts, same max_df cap effect
    (the cap is recomputed over union df, so an fp pushed over the
    cap BY the new batch disappears from probe results too)."""
    rng = random.Random(31)
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (i, base[: rng.randint(20, len(base))] + f" tail{i % 7}")
        for i in range(24)
    ]
    old = [(i, t) for i, t in rows if i < 16]
    new = [(i, t) for i, t in rows if i >= 16]
    odf = spark.createDataFrame(old, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    adf = spark.createDataFrame(rows, "doc_id long, text string")
    for max_df in (None, 10):
        idx = winnow_fingerprints(odf, k=5, w=4)
        nfp = winnow_fingerprints(ndf, k=5, w=4)
        probe = {
            (r.doc_a, r.doc_b, r.shared_fps)
            for r in winnow_probe(
                idx, nfp, min_shared=2, max_df=max_df
            ).collect()
        }
        rebuild = {
            (r.doc_a, r.doc_b, r.shared_fps)
            for r in winnow_candidate_pairs(
                winnow_fingerprints(adf, k=5, w=4),
                min_shared=2,
                max_df=max_df,
            ).collect()
            if r.doc_a >= 16 or r.doc_b >= 16
        }
        assert probe == rebuild and probe  # non-vacuous


def test_bad_params_raise(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
