"""Streaming ingest (foreachBatch into the batch append path) and
watermarked windowed aggregation."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.sources.corpus import generate_pages
from metal_history_knowledge_graph_spark.streaming.incremental import (
    stream_ingest_pages,
    windowed_event_counts,
)


def test_stream_ingest_exactly_once(spark, store, tmp_path):
    src = str(tmp_path / "pages_stream")
    cp = str(tmp_path / "cp")
    # land a first batch of pages
    generate_pages(spark, 20, seed=3).write.mode("append").parquet(src)
    q = stream_ingest_pages(spark, src, store, cp, run_id="s1")
    q.awaitTermination(300)
    n1 = store.read("chunks").select("url").distinct().count()
    assert n1 == 20

    # land 10 more pages (ids 20..29 via a bigger gen, overlapping urls
    # for 0..19 to prove idempotence)
    generate_pages(spark, 30, seed=3).write.mode("append").parquet(src)
    q = stream_ingest_pages(spark, src, store, cp, run_id="s1")
    q.awaitTermination(300)
    n2 = store.read("chunks").select("url").distinct().count()
    assert n2 == 30
    dup = (
        store.read("chunks").groupBy("url", "chunk_index").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_windowed_event_counts_batch_parity(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(events, window="1 hour").collect()
    total = sum(r.n for r in out)
    assert total == events.count()
    for r in out:
        assert r.window_start < r.window_end


def test_windowed_event_counts_streaming(spark, tmp_path):
    src = str(tmp_path / "ev")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)
    # watermarks require TIMESTAMP (not NTZ): read with explicit schema
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory").queryName("wincounts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    # append mode only emits windows closed by the watermark; the tail
    # windows stay open — so we check a prefix property, not totals
    rows = spark.sql("select * from wincounts").collect()
    batch = {(r.window_start, r.event_type): r.n
             for r in windowed_event_counts(
                 spark.read.schema(schema).parquet(src), window="1 hour").collect()}
    for r in rows:
        assert batch[(r.window_start, r.event_type)] == r.n
