"""Sequence packing for training export: assign every document a
position in a stream of fixed-capacity token sequences.

Trainers consume fixed-length sequences (e.g. 512/4096 tokens); the
standard export (GPT-2 onward) concatenates documents and chunks the
stream at the capacity boundary, letting documents span sequence
borders. This operator computes that assignment *deterministically and
in parallel*: documents are hashed into ``n_shards`` independent
streams (shard = the unit of both parallelism and file layout — one
output file per shard), and within a shard the stream order is the
(unique) document key.

Scale shape: the only shuffle is one hash repartition by ``shard``;
inside each shard a *partitioned* window cumsum (never a global
window — the classic single-task funnel this module exists to avoid)
yields each document's start offset in the shard's token stream.
Shard count is chosen like output-file count (thousands at 100 TB),
so each window partition is a bounded, file-sized slice.

Everything is integer arithmetic on a cross-engine hash (md5, as in
``operators/sampling``), so re-runs, resumed runs, and the DuckDB
oracle (`__spark_entry__.q_pack_stats`) reproduce the assignment
bit-for-bit — an interrupted export can skip finished shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import assign_shards


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    capacity: int,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Concat-then-chunk packing assignment.

    Adds per row (requires ``key_col`` unique and ``tokens_col`` ≥ 1;
    zero-token rows are counted as 1 so the arithmetic stays in the
    non-negative range where Spark's truncating ``div`` and the
    oracle's flooring ``//`` agree):

    * ``shard``      — md5-bucket of the key mod ``n_shards``
    * ``seq_first``  — index (within the shard) of the first sequence
      this document occupies
    * ``offset_in_seq`` — token offset of the document's first token
      inside that sequence
    * ``n_seqs``     — how many sequences the document spans
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # clamp zeros to 1 (documented), but FAIL FAST on negative counts —
    # they signal corrupt input, and silently clamping them would skew
    # the offsets of every later document in the shard
    toks = (
        F.when(
            F.col(tokens_col) < 0,
            F.raise_error(F.concat(
                F.lit(f"pack_sequences: negative {tokens_col} for {key_col}="),
                F.col(key_col).cast("string"),
            )),
        )
        .otherwise(F.greatest(F.col(tokens_col), F.lit(1)))
        .cast("long")
    )
    # shard assignment is sampling.assign_shards — the ONE shard
    # formula every resumable export shares
    out = assign_shards(df, key_col, n_shards, seed).withColumn("_toks", toks)
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("_toks").over(w), F.lit(0)).cast("long")
    cap = F.lit(int(capacity)).cast("long")
    out = out.withColumn("_start", start)
    return (
        out.withColumn("seq_first", F.expr(f"_start div {int(capacity)}"))
        .withColumn("offset_in_seq", (F.col("_start") % cap).cast("long"))
        .withColumn(
            "n_seqs",
            (
                F.expr(f"(_start + _toks - 1) div {int(capacity)}")
                - F.col("seq_first") + F.lit(1)
            ).cast("long"),
        )
        .drop("_start", "_toks")
    )


def shard_manifest(packed: DataFrame, tokens_col: str | None = None) -> DataFrame:
    """Per-shard export manifest over a :func:`pack_sequences` output:
    document count, the number of sequences the shard's stream occupies
    (``n_seqs`` — including the trailing partial sequence, i.e.
    ``ceil(total_tokens / capacity)``), and, when ``tokens_col`` is
    given (the same column :func:`pack_sequences` consumed, which it
    passes through), the total token count. The bookkeeping a
    resumable exporter checks before skipping a finished shard. One
    vocabulary-sized aggregation."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.max(F.col("seq_first") + F.col("n_seqs") - 1).alias("last_seq"),
    ]
    if tokens_col is not None:
        # the same >=1 clamp pack_sequences applies
        aggs.append(
            F.sum(F.greatest(F.col(tokens_col), F.lit(1)).cast("long"))
            .alias("total_tokens")
        )
    out = packed.groupBy("shard").agg(*aggs)
    cols = [
        F.col("shard"),
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("last_seq") + 1).cast("long").alias("n_seqs"),
    ]
    if tokens_col is not None:
        cols.append(F.col("total_tokens"))
    return out.select(*cols)
