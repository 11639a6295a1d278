"""Composed training-export plan (plans/export.py). Full-value parity
(every gate verdict + packing assignment, bit for bit) is
q_training_export in test_oracle_parity at sf0.001 and sf0.01; these
pin the gate semantics on crafted documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.plans.export import training_export


def _mk_text(words):
    return " ".join(words)


def test_training_export_gates(spark):
    good = _mk_text(f"word{i}" for i in range(40))          # passes quality
    short = _mk_text(f"word{i}" for i in range(5))          # < 30 words
    bench_text = _mk_text(f"eval{i}" for i in range(40))    # the benchmark doc
    leaky = bench_text + " trailing extra words here now"   # overlaps benchmark
    docs = spark.createDataFrame(
        [
            (1, good + " mail me a@b.co please"),
            (2, good + " mail me a@b.co please"),  # exact dup of 1 post-redaction
            (3, short),
            (4, leaky),
            (5, bench_text),
        ],
        "doc_id long, text string",
    )
    benchmark = docs.filter(F.col("doc_id") == 5)
    out = {r["doc_id"]: r for r in training_export(
        docs, benchmark, capacity=16, n_shards=2).collect()}
    assert len(out) == 5  # one decision row per input doc
    # doc 1 survives everything: canonical, clean, sided, packed
    assert out[1]["keep_quality"] and out[1]["is_canonical"]
    assert not out[1]["contaminated"] and out[1]["side"] in ("train", "test")
    assert out[1]["n_pii"] == 1
    # doc 2: same redacted text -> duplicate, loses to min-key 1
    assert out[2]["keep_quality"] and not out[2]["is_canonical"]
    assert out[2]["side"] is None and out[2]["shard"] is None
    # doc 3: quality-dropped, never reaches dedup
    assert not out[3]["keep_quality"] and not out[3]["is_canonical"]
    assert out[3]["side"] is None
    # docs 4 and 5 overlap the benchmark -> contaminated, dropped
    assert out[4]["contaminated"] and out[4]["side"] is None
    assert out[5]["contaminated"] and out[5]["side"] is None
    # packing columns only on train survivors
    for k, r in out.items():
        if r["side"] == "train":
            assert r["shard"] is not None and r["n_seqs"] >= 1
        else:
            assert r["seq_first"] is None


def test_training_export_packing_is_contiguous(spark):
    """Across many survivors the packed train stream must be gap-free
    per shard (the pack_sequences invariant survives the composition's
    filters)."""
    docs = spark.createDataFrame(
        [(i, _mk_text(f"w{i}x{j}" for j in range(30 + i % 7))) for i in range(200)],
        "doc_id long, text string",
    )
    benchmark = docs.filter(F.col("doc_id") == 199)
    out = training_export(docs, benchmark, capacity=32, n_shards=4)
    train = sorted(
        ((r["shard"], r["doc_id"], r["seq_first"] * 32 + r["offset_in_seq"])
         for r in out.collect() if r["side"] == "train"),
    )
    running = {}
    docs_tokens = {i: 30 + i % 7 for i in range(200)}
    for shard, doc_id, start in train:
        assert start == running.get(shard, 0)
        running[shard] = start + docs_tokens[doc_id]
