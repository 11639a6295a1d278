"""Distributed Bloom filter — a shuffle-free membership pre-filter
for 100 TB anti-join / decontamination passes.

The filter is a *sparse block table* ``(block_id, bits)``: bit
positions are md5-derived (the repo's cross-engine hash pattern,
sampling.hash_bucket), OR-folded per 32-bit block with a plain
``bit_or`` partial aggregation. Build is one explode + one partial
agg; probe is a per-row constant fan-out (k positions) joined against
the block table and folded back with an all-bits-set test. Nothing
touches the driver; the block table for a 10⁹-key filter at 10 bits
per key is ~300 M blocks ≈ a few GB spread across executors — or
broadcastable when the member set is benchmark-sized (the
decontamination case).

Cross-engine exactness: positions use
``conv(substr(md5('bloom:' || i || '|' || key), 1, 15), 16, 10) %
m_bits`` (60 hash bits, BIGINT-safe) and blocks are 32-bit (values
< 2³², so BIGINT arithmetic shifts never touch the sign bit in either
engine). The whole build AND probe replay in DuckDB (q_bloom_probe).

False positives only, never false negatives — standard Bloom
semantics: a "maybe" must be verified by the exact join it pre-prunes
(or accepted, for decontamination where over-dropping is safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import md5_mod

BLOCK_BITS = 32


def _position(key: Column, i: int, m_bits: int) -> Column:
    """The i-th Bloom position for ``key`` in ``[0, m_bits)``."""
    return md5_mod(key, f"bloom:{i}|", m_bits)


def _positions(key: Column, k: int, m_bits: int) -> Column:
    return F.array(*[_position(key, i, m_bits) for i in range(k)])


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 7
) -> DataFrame:
    """Build the sparse block table ``(block_id, bits)`` over the
    distinct values of ``key_col``. One explode (k rows per key) and
    one ``bit_or`` partial agg — map-side combine collapses each
    partition's blocks before the shuffle."""
    pos = df.select(key_col).distinct().select(
        F.explode(_positions(F.col(key_col), k, m_bits)).alias("_pos")
    )
    return (
        pos.select(
            # integer `div`, not FP /: a double round-trip misroutes
            # positions >= 2^53 (legal at large m_bits) off the
            # oracle's `//`
            F.expr(f"_pos div {BLOCK_BITS}").alias("block_id"),
            # PySpark's shiftleft() only takes a literal bit count;
            # the SQL form accepts a column
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {BLOCK_BITS} AS INT))"
            ).alias("_mask"),
        )
        .groupBy("block_id")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Block-wise OR of two same-shape filters — Bloom filters over
    the same (m_bits, k) are OR-mergeable, so per-shard builds combine
    without touching the data (the streaming/incremental path; same
    contract as cms.cms_merge)."""
    return (
        a.unionByName(b)
        .groupBy("block_id")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    blocks: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe every row of ``df`` against a ``bloom_build`` block
    table; adds boolean ``out_col`` (true = possibly in the member
    set, false = definitely not).

    Plan: constant fan-out to k probe positions → equi-join on
    block_id (broadcast when the block table is benchmark-sized, AQE
    decides otherwise) → all-k-bits-set fold per row. An absent block
    is an unset bit (left join, coalesce 0).
    """
    probes = df.select(key_col).distinct().select(
        F.col(key_col).alias("_key"),
        F.explode(_positions(F.col(key_col), k, m_bits)).alias("_pos"),
    )
    hit = (
        probes.withColumn(
            "block_id", F.expr(f"_pos div {BLOCK_BITS}")
        )
        .join(blocks, "block_id", "left")
        .withColumn(
            "_set",
            F.expr(
                "shiftright(coalesce(bits, CAST(0 AS BIGINT)), "
                f"CAST(_pos % {BLOCK_BITS} AS INT)) & 1"
            ),
        )
        .groupBy("_key")
        .agg((F.sum("_set") == k).alias(out_col))
    )
    return df.join(
        hit.withColumnRenamed("_key", key_col), key_col, "left"
    ).withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))
