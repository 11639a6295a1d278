"""BPE training (operators/bpe.py): full merge-trajectory pinned
against a pure-Python reference (same count-desc / lexicographic
tie-break), the greedy non-overlap application rule, and apply ≡
training's final segmentation."""

import re
from collections import Counter

from metal_history_knowledge_graph_spark.operators.bpe import (
    EOW,
    apply_bpe,
    bpe_train,
)


def _py_word_counts(texts):
    c = Counter()
    for t in texts:
        if t:
            c.update(w for w in re.split(r"\s+", t.lower().strip()) if w)
    return c


def _py_apply(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _py_bpe(texts, n_merges):
    vocab = {
        w: (list(w) + [EOW], n) for w, n in _py_word_counts(texts).items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.values():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            w: (_py_apply(syms, *best), n) for w, (syms, n) in vocab.items()
        }
    return merges, {w: syms for w, (syms, n) in vocab.items()}


TEXTS = [
    "low lower lowest",
    "new newer newest newest",
    "low low low new new",
    "wider wide widest",
    None,
    "",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_merge_trajectory_matches_reference(spark):
    merges, vocab = bpe_train(_df(spark), n_merges=8)
    py_merges, py_vocab = _py_bpe(TEXTS, 8)
    assert merges == py_merges
    got = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got == py_vocab


def test_greedy_nonoverlap_rule(spark):
    """'aaaa' with merge (a,a): left-to-right pairs -> ['aa','aa',EOW],
    never the overlapping ['a','aa','a'] reading."""
    df = spark.createDataFrame([(0, "aaaa aaa")], "doc_id long, text string")
    merges, vocab = bpe_train(df, n_merges=1)
    assert merges == [("a", "a")]
    got = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got["aaaa"] == ["aa", "aa", EOW]
    assert got["aaa"] == ["aa", "a", EOW]


def test_apply_matches_training_segmentation(spark):
    """apply_bpe on the training corpus reproduces the final vocab
    segmentation word for word."""
    df = _df(spark)
    merges, vocab = bpe_train(df, n_merges=6)
    seg = {r["word"]: r["syms"] for r in vocab.collect()}
    toks = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(df, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        if not t or not t.strip():
            continue
        want = []
        for w in re.split(r"\s+", t.lower().strip()):
            want.extend(seg[w])
        assert toks[i] == want, i


def test_early_stop_when_no_pairs(spark):
    """Single-char words + EOW still pair (c, EOW); after exhausting
    them no pairs remain and training stops early."""
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    merges, vocab = bpe_train(df, n_merges=10)
    assert len(merges) == 2  # (a,EOW), (b,EOW) — then nothing left
    got = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got == {"a": ["a" + EOW], "b": ["b" + EOW]}


def test_pair_counts_plan_two_exchanges_jvm_only(spark):
    """Exactly the two necessary shuffles — the corpus-scale word
    groupBy and the vocabulary-scale pair groupBy — and zero Python
    anywhere in the statistics path."""
    from metal_history_knowledge_graph_spark.operators.bpe import (
        pair_counts,
        segment_vocab,
        word_counts,
    )

    docs = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    plan = (
        pair_counts(segment_vocab(word_counts(docs)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 2
    assert "Python" not in plan
