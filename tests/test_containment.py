"""containment_pairs (exact asymmetric set-containment join): equality
with brute force on seeded corpora, the quote-in-long-doc case Jaccard
misses, directionality, and exact threshold boundaries (the integer
micro-unit ceil — IEEE ceil(0.9*10) is 10, the exact one too, but
ceil(0.8*5) is 5 in floats and 4 exactly)."""

import itertools
import random

from metal_history_knowledge_graph_spark.operators.dedup import (
    containment_pairs,
)


def _brute(docs, t):
    sets = {i: set(s.lower().split()) for i, s in docs if s and s.split()}
    out = {}
    for a, b in itertools.permutations(sorted(sets), 2):
        if not sets[a]:
            continue
        c = len(sets[a] & sets[b]) / len(sets[a])
        if c >= t:
            out[(a, b)] = round(c, 4)
    return out


def _spark(spark, docs, t):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, threshold=t).collect()
    }


def test_exact_vs_bruteforce_random(spark):
    rng = random.Random(19)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.sample(vocab, rng.randint(2, 20))))
        for i in range(150)
    ]
    for t in (0.8, 0.9):
        assert _spark(spark, docs, t) == _brute(docs, t), t


def test_quote_in_long_doc_directional(spark):
    """A 4-word quote fully inside a 40-word page: containment 1.0
    one way, small the other; Jaccard would be 0.1."""
    page_words = " ".join(f"p{i}" for i in range(36))
    docs = [
        (0, "alpha beta gamma delta"),
        (1, page_words + " alpha beta gamma delta"),
    ]
    got = _spark(spark, docs, 0.9)
    assert got == {(0, 1): 1.0}


def test_exact_threshold_boundary(spark):
    """|A∩B|/|A| = exactly 0.8 with |A|=5 — the float-ceil trap:
    ceil(0.8·5) must be 4, not 5, or the candidate is pruned."""
    docs = [
        (0, "a b c d e"),        # A: 5 words
        (1, "a b c d x y z"),    # shares 4 -> containment 0.8 exactly
    ]
    got = _spark(spark, docs, 0.8)
    assert got[(0, 1)] == 0.8
