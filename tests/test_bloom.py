"""Distributed Bloom filter (operators/bloom.py): the no-false-
negative invariant, false positives bounded at sane sizing,
determinism across partitionings, absent-block handling, and the
JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)


@pytest.fixture(scope="module")
def keys(spark):
    members = spark.range(200).select(
        F.concat(F.lit("member_"), F.col("id")).alias("key")
    )
    others = spark.range(2000).select(
        F.concat(F.lit("other_"), F.col("id")).alias("key")
    )
    return members.cache(), others.cache()


def test_bloom_no_false_negatives(keys):
    members, _ = keys
    blocks = bloom_build(members, "key", m_bits=4096, k=5)
    probed = bloom_probe(members, blocks, "key", m_bits=4096, k=5)
    assert probed.filter(~F.col("maybe_member")).count() == 0


def test_bloom_false_positive_rate_bounded(keys):
    members, others = keys
    # ~20 bits/key, k=5 → theoretical FP ≈ 0.2^5 ≈ 0.03%; allow 2%
    blocks = bloom_build(members, "key", m_bits=4096, k=5)
    fp = bloom_probe(others, blocks, "key", m_bits=4096, k=5).filter(
        F.col("maybe_member")
    ).count()
    assert fp <= 0.02 * 2000


def test_bloom_rejects_everything_when_empty(spark, keys):
    _, others = keys
    empty = spark.createDataFrame([], "key string")
    blocks = bloom_build(empty, "key", m_bits=4096, k=5)
    probed = bloom_probe(others, blocks, "key", m_bits=4096, k=5)
    assert probed.filter(F.col("maybe_member")).count() == 0


def test_bloom_partitioning_invariant(keys):
    members, others = keys
    a = bloom_build(members, "key", m_bits=2048, k=4)
    b = bloom_build(members.repartition(13), "key", m_bits=2048, k=4)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    pa = {
        r.key: r.maybe_member
        for r in bloom_probe(others, a, "key", m_bits=2048, k=4).collect()
    }
    pb = {
        r.key: r.maybe_member
        for r in bloom_probe(
            others.repartition(7), b, "key", m_bits=2048, k=4
        ).collect()
    }
    assert pa == pb


def test_bloom_probe_keeps_all_input_columns(spark):
    members = spark.createDataFrame([("a",), ("b",)], ["key"])
    probe = spark.createDataFrame(
        [("a", 1), ("zz", 2)], ["key", "payload"]
    )
    blocks = bloom_build(members, "key", m_bits=1024, k=3)
    out = {
        r.key: (r.payload, r.maybe_member)
        for r in bloom_probe(probe, blocks, "key", m_bits=1024, k=3).collect()
    }
    assert out["a"] == (1, True)
    assert out["zz"][0] == 2


def test_bloom_plan_jvm_side(keys):
    members, others = keys
    blocks = bloom_build(members, "key", m_bits=4096, k=5)
    plan = (
        bloom_probe(others, blocks, "key", m_bits=4096, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
