"""Streaming: incremental page ingest (Structured Streaming →
foreachBatch → the batch pipeline's append path) and windowed event
aggregation."""
