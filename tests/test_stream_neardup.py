"""Streaming near-dup-gated ingest (streaming/incremental.
stream_neardup_ingest): within-batch group collapse, cross-batch
probe against the growing persisted index, exactly-once admission,
and the invariant that the admitted corpus is near-dup-free."""

import os
import shutil
import uuid

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from metal_history_knowledge_graph_spark.streaming.incremental import (
    stream_neardup_ingest,
)

#: distinct word-salads — pairwise 3-shingle Jaccard 0
_TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta",
    "one two three four five six seven eight nine",
    "red orange yellow green blue indigo violet pink",
    "mon tue wed thu fri sat sun jan feb mar apr",
    "north south east west up down left right mid",
    "cat dog bird fish horse cow sheep goat duck",
    "spark flink trino beam kafka hive druid pinot",
    "oak elm ash birch pine fir cedar maple willow",
]


def _run_batch(spark, src, out, cp, rows):
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_neardup_ingest(spark, stream, out, cp, threshold=0.9)
    q.awaitTermination(300)


def test_stream_neardup_ingest(spark):
    root = f"/tmp/stream_neardup_{uuid.uuid4().hex[:8]}"
    src, out, cp = f"{root}/src", f"{root}/out", f"{root}/cp"
    try:
        # batch 0: 4 distinct docs + 2 exact copies (within-batch dups)
        _run_batch(spark, src, out, cp, [
            (0, _TEXTS[0]), (1, _TEXTS[1]), (2, _TEXTS[2]), (3, _TEXTS[3]),
            (100, _TEXTS[0]), (101, _TEXTS[1]),
        ])
        acc = spark.read.parquet(f"{out}/accepted")
        got0 = {r["doc_id"]: r["group_size"] for r in acc.collect()}
        # min-id reps survive; copies collapse into their groups
        assert set(got0) == {0, 1, 2, 3}
        assert got0[0] == 2 and got0[1] == 2 and got0[2] == 1

        # batch 1: 2 fresh + 1 cross-batch copy of doc 3 → dropped
        _run_batch(spark, src, out, cp, [
            (20, _TEXTS[4]), (21, _TEXTS[5]), (200, _TEXTS[3]),
        ])
        acc = spark.read.parquet(f"{out}/accepted")
        assert set(r["doc_id"] for r in acc.collect()) == {0, 1, 2, 3, 20, 21}

        # batch 2: a copy of batch-1 content (the index GREW) + fresh;
        # plus a within-batch group whose REP duplicates stored
        # content → the whole group drops (SemDeDup-style verdict)
        _run_batch(spark, src, out, cp, [
            (300, _TEXTS[4]),                 # dup of doc 20
            (301, _TEXTS[6]),                 # fresh
            (302, _TEXTS[5]), (303, _TEXTS[5]),  # group rep 302 is a dup
        ])
        acc = spark.read.parquet(f"{out}/accepted")
        ids = sorted(r["doc_id"] for r in acc.collect())
        assert ids == [0, 1, 2, 3, 20, 21, 301]

        # invariants: exactly-once admission, near-dup-free corpus
        assert acc.groupBy("doc_id").count().filter("count > 1").count() == 0
        assert minhash_lsh_pairs(
            acc.select("doc_id", "text"), threshold=0.9).count() == 0
        # the index holds band rows for admitted docs ONLY
        idx_docs = set(
            r["doc"] for r in
            spark.read.parquet(f"{out}/index").select("doc").distinct()
            .collect()
        )
        assert idx_docs == set(ids)

        # replay with no new data: nothing changes (exactly-once)
        stream = spark.readStream.schema(
            "doc_id long, text string").parquet(src)
        q = stream_neardup_ingest(spark, stream, out, cp, threshold=0.9)
        q.awaitTermination(300)
        assert sorted(
            r["doc_id"] for r in
            spark.read.parquet(f"{out}/accepted").collect()
        ) == ids
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stream_neardup_crash_replay(spark):
    """A committed batch whose index append was lost (crash between
    marker and append) re-derives the index rows from the committed
    partition on replay — and never re-runs the verdicts."""
    root = f"/tmp/stream_neardup_{uuid.uuid4().hex[:8]}"
    src, out, cp = f"{root}/src", f"{root}/out", f"{root}/cp"
    try:
        _run_batch(spark, src, out, cp, [(0, _TEXTS[0]), (1, _TEXTS[1])])
        # simulate the crash: wipe the index (sequenced AFTER the
        # marker, so a real crash can lose exactly this) and the
        # stream checkpoint so batch 0 replays
        shutil.rmtree(f"{out}/index")
        shutil.rmtree(cp)
        stream = spark.readStream.schema(
            "doc_id long, text string").parquet(src)
        q = stream_neardup_ingest(spark, stream, out, cp, threshold=0.9)
        q.awaitTermination(300)
        # index restored from the committed partition; accepted unchanged
        assert set(
            r["doc"] for r in
            spark.read.parquet(f"{out}/index").select("doc").distinct()
            .collect()
        ) == {0, 1}
        assert spark.read.parquet(f"{out}/accepted").count() == 2
    finally:
        shutil.rmtree(root, ignore_errors=True)
