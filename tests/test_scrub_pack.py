"""PII scrubbing, benchmark decontamination, and sequence packing
(operators/scrub.py, contamination.py, packing.py).

Driver-scale value parity lives in test_oracle_parity (q_pii_redact,
q_contamination, q_pack_stats); these pin the semantics on crafted
edge cases and the plan shapes (narrow scrub, broadcast contamination
probe, partitioned packing window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.contamination import (
    contamination,
    ngram_set,
)
from metal_history_knowledge_graph_spark.operators.packing import (
    pack_sequences,
    shard_manifest,
)
from metal_history_knowledge_graph_spark.operators.scrub import (
    pii_density,
    redact_pii,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# --- PII scrub ----------------------------------------------------------------


def test_redact_pii_classes_and_chain_order(spark):
    df = _docs(spark, [
        (1, "mail a.b-c%d@sub.example.org now", "a"),
        (2, "call 555-123-4567 or 800.555.1212 today", "a"),
        (3, "host 192.168.1.254 up", "a"),
        (4, "none here", "b"),
        # email domain dots must NOT later match as IPv4 (email is
        # redacted first — chain order is part of the contract)
        (5, "x@1.2.3.4.example.com and 10.0.0.1", "b"),
        (6, "", "b"),
    ])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 0, 0)
    assert out[1]["redacted"] == "mail <EMAIL> now"
    assert (out[2]["n_phone"], out[2]["redacted"]) == (
        2, "call <PHONE> or <PHONE> today")
    assert (out[3]["n_ipv4"], out[3]["redacted"]) == (1, "host <IP> up")
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ipv4"]) == (0, 0, 0)
    assert out[4]["redacted"] == "none here"
    assert out[5]["n_email"] == 1 and out[5]["n_ipv4"] == 1
    assert out[5]["redacted"] == "<EMAIL> and <IP>"
    assert out[6]["redacted"] == ""


def test_redact_pii_is_narrow(spark):
    df = _docs(spark, [(1, "a@b.co", "a")])
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one Project, no shuffle


def test_pii_density_rollup(spark):
    df = redact_pii(_docs(spark, [
        (1, "a@b.co and c@d.org", "s1"),
        (2, "clean", "s1"),
        (3, "555-123-4567", "s2"),
        (4, "clean", "s1"),
    ]))
    rows = {r["source"]: r for r in pii_density(df).collect()}
    assert rows["s1"]["n_docs"] == 3
    assert rows["s1"]["total_email"] == 2
    assert rows["s1"]["n_docs_with_pii"] == 1
    assert rows["s1"]["pii_doc_bp"] == 3333
    assert rows["s2"]["total_phone"] == 1 and rows["s2"]["pii_doc_bp"] == 10000


# --- contamination ------------------------------------------------------------


def test_ngram_set_short_and_duplicate_grams(spark):
    df = _docs(spark, [
        (1, "a b c d", "s"),          # 4 words < n=5 → no grams
        (2, "a b c d e a b c d e a b c d e", "s"),  # repeats dedup
    ])
    grams = ngram_set(df, n=5).collect()
    assert not [g for g in grams if g["doc_id"] == 1]
    d2 = {g["gram"] for g in grams if g["doc_id"] == 2}
    assert "a b c d e" in d2
    n_grams = ngram_set(df, n=5).groupBy("doc_id").count().collect()
    assert {r["doc_id"]: r["count"] for r in n_grams}[2] == 5  # distinct only


def test_contamination_flags_and_zero_rows(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog", "s"),
        (2, "completely different words with no overlap at all here", "s"),
        (3, "too short", "s"),
    ])
    benchmark = _docs(spark, [(99, "quick brown fox jumps over anything", "b")])
    out = {r["doc_id"]: r for r in contamination(docs, benchmark, n=5).collect()}
    assert out[1]["contaminated"] and out[1]["n_hit"] == 1  # 'quick brown fox jumps over'
    assert out[1]["n_grams"] == 5
    assert not out[2]["contaminated"] and out[2]["n_hit"] == 0
    assert (out[3]["n_grams"], out[3]["n_hit"], out[3]["contaminated"]) == (0, 0, False)


def test_contamination_probe_is_broadcast(spark):
    docs = _docs(spark, [(1, "a b c d e f", "s")])
    bench = _docs(spark, [(2, "a b c d e", "b")])
    plan = contamination(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # gram probe never shuffles the corpus


# --- sequence packing ---------------------------------------------------------


def test_pack_sequences_hand_example(spark):
    # single shard, capacity 10; keys order the stream: 4, 8, 5 tokens
    df = spark.createDataFrame(
        [(1, 4), (2, 8), (3, 5)], "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in pack_sequences(
        df, "doc_id", "n_tokens", capacity=10, n_shards=1).collect()}
    assert (out[1]["seq_first"], out[1]["offset_in_seq"], out[1]["n_seqs"]) == (0, 0, 1)
    # doc 2 starts at 4, ends at 11 → spans seqs 0..1
    assert (out[2]["seq_first"], out[2]["offset_in_seq"], out[2]["n_seqs"]) == (0, 4, 2)
    # doc 3 starts at 12, ends at 16 → seq 1
    assert (out[3]["seq_first"], out[3]["offset_in_seq"], out[3]["n_seqs"]) == (1, 2, 1)
    man = shard_manifest(pack_sequences(
        df, "doc_id", "n_tokens", capacity=10, n_shards=1)).collect()
    assert (man[0]["n_docs"], man[0]["n_seqs"]) == (3, 2)


def test_pack_sequences_zero_token_doc_counts_as_one(spark):
    df = spark.createDataFrame([(1, 0), (2, 3)], "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in pack_sequences(
        df, "doc_id", "n_tokens", capacity=4, n_shards=1).collect()}
    assert (out[1]["seq_first"], out[1]["n_seqs"]) == (0, 1)
    assert (out[2]["offset_in_seq"], out[2]["n_seqs"]) == (1, 1)


def test_pack_sequences_partition_invariant(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tokens"))
    a = pack_sequences(df, "doc_id", "n_tokens", 64, 8)
    b = pack_sequences(df.repartition(13), "doc_id", "n_tokens", 64, 8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_window_is_partitioned(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit(5).alias("n_tokens"))
    plan = pack_sequences(df, "doc_id", "n_tokens", 64, 8) \
        ._jdf.queryExecution().executedPlan().toString()
    # the cumsum window must be hash-partitioned by shard, never a
    # global SinglePartition sort funnel
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan


def test_pack_sequences_validates_params(spark):
    import pytest

    df = spark.createDataFrame([(1, 4)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tokens", capacity=0, n_shards=1)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tokens", capacity=8, n_shards=0)


def test_shard_manifest_total_tokens(spark):
    df = spark.createDataFrame(
        [(1, 4), (2, 8), (3, 5)], "doc_id long, n_tokens long")
    packed = pack_sequences(df, "doc_id", "n_tokens", capacity=10, n_shards=1)
    man = shard_manifest(packed, tokens_col="n_tokens").collect()[0]
    assert (man["n_docs"], man["n_seqs"], man["total_tokens"]) == (3, 2, 17)


def test_contamination_single_scan_no_join_back(spark):
    """The per-doc report must come from ONE corpus scan (explode_outer
    carries gram-less docs) — no second scan joined back."""
    docs = _docs(spark, [(1, "a b c d e f", "s"), (2, "x", "s")])
    bench = _docs(spark, [(9, "a b c d e", "b")])
    out = contamination(docs, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one scan of the docs relation: its own generator; the
    # broadcast side scans `bench` only
    assert plan.count("Generate explode") <= 2  # docs outer + bench inner
    assert "SortMergeJoin" not in plan
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2] and rows[2]["n_grams"] == 0 and not rows[2]["contaminated"]


def test_pack_sequences_negative_tokens_fail_fast(spark):
    """Negative token counts signal corrupt input: raise (per-row
    raise_error in the clamp expression), never silently clamp — a
    masked negative would skew every later document's offset."""
    import pytest

    df = spark.createDataFrame([(1, 4), (2, -3)], "doc_id long, n_tokens long")
    packed = pack_sequences(df, "doc_id", "n_tokens", capacity=8, n_shards=1)
    with pytest.raises(Exception, match="negative n_tokens"):
        packed.collect()
    # zero still clamps to 1 (documented behaviour unchanged)
    ok = spark.createDataFrame([(1, 0)], "doc_id long, n_tokens long")
    row = pack_sequences(ok, "doc_id", "n_tokens", capacity=8, n_shards=1).collect()[0]
    assert row.n_seqs == 1
