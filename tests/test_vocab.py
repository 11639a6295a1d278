"""Vocabulary build + OOV coverage (operators/vocab.py) and Bloom
OR-merge linearity (operators/bloom.bloom_merge)."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)
from metal_history_knowledge_graph_spark.operators.vocab import (
    build_vocab,
    vocab_coverage,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "aa aa aa bb bb cc"),
            (1, "aa bb cc dd"),
            (2, "xx yy zz"),
            (3, None),
        ],
        "doc_id int, text string",
    ).cache()


def test_vocab_frequency_and_tiebreak(docs):
    v = build_vocab(docs, size=3).collect()
    # freqs: aa=4 bb=3 cc=2 dd=1 xx=1 yy=1 zz=1 → top-3 aa,bb,cc
    assert [(r.term, r.freq, r.vrank) for r in v] == [
        ("aa", 4, 1), ("bb", 3, 2), ("cc", 2, 3)
    ]
    # tie at the boundary breaks lexicographically: size=4 adds dd
    v4 = {r.term for r in build_vocab(docs, size=4).collect()}
    assert v4 == {"aa", "bb", "cc", "dd"}


def test_vocab_coverage_accounting(docs):
    v = build_vocab(docs, size=3)  # {aa, bb, cc}
    got = {
        r.doc_id: (r.n_tokens, r.oov_tokens, r.oov_bp)
        for r in vocab_coverage(docs, v).collect()
    }
    assert got[0] == (6, 0, 0)
    assert got[1] == (4, 1, 2500)
    assert got[2] == (3, 3, 10000)
    assert got[3] == (0, 0, 0)  # NULL text → zero accounting


def test_vocab_deterministic_across_partitionings(docs):
    a = build_vocab(docs, size=3).collect()
    b = build_vocab(docs.repartition(7), size=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bloom_merge_equals_whole_build(spark):
    members = spark.range(300).select(
        F.concat(F.lit("m_"), F.col("id")).alias("key")
    )
    half_a = members.filter(F.col("id") < 150)
    half_b = members.filter(F.col("id") >= 150)
    merged = bloom_merge(
        bloom_build(half_a, "key", m_bits=2048, k=4),
        bloom_build(half_b, "key", m_bits=2048, k=4),
    )
    whole = bloom_build(members, "key", m_bits=2048, k=4)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }
    # and the merged filter still has no false negatives
    fn = bloom_probe(members, merged, "key", m_bits=2048, k=4).filter(
        ~F.col("maybe_member")
    ).count()
    assert fn == 0
