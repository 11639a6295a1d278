"""Misra-Gries heavy hitters — find every item whose relative
frequency clears a ppm threshold, over key cardinalities too large to
groupBy exactly (the classic two-pass distributed design: bounded
per-partition sketches → candidate set → exact recount of candidates
only).

Completes the repo's mergeable-sketch family (Bloom = membership,
CMS = point frequency, HLL = cardinality, MG = heavy hitters). MG is
the deterministic counter-based summary (Misra & Gries 1982;
mergeability per Agarwal et al., PODS 2012): capacity-k counters
undercount any item by at most N/(k+1), so every item with
freq > N/(k+1) survives with positive weight — the candidate set
provably contains ALL true heavy hitters.

Determinism / oracle design: the sketch pass is partitioning-
dependent (weights vary with split boundaries) but the OUTPUT is not
— pass 2 recounts candidates exactly and filters on
``freq · 1e6 ≥ threshold_ppm · N`` in pure BIGINT, and the MG
guarantee (capacity sized 2× above 1e6/threshold_ppm) ensures no true
heavy hitter is missing from the candidate set. A DuckDB oracle
therefore computes the answer DIRECTLY (exact groupBy + the same
integer filter) with no exports: if the sketch ever dropped a true
heavy hitter, the row would be missing and the oracle would catch it.

Scale shape (100 TB): pass 1 is one Arrow-batched ``mapInPandas``
(per-batch vectorized value_counts folded into ≤ k counters — the
legitimately-stateful sketch construction, the SURVEY §2.11 UDF
shape) emitting ≤ k rows per partition; candidates aggregate to
≤ k · partitions rows (vocabulary-sized — broadcastable); pass 2 is
one broadcast semi-join + partial-agg count. No full groupBy over the
raw key space ever happens.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: parts-per-million scale for the frequency threshold.
PPM = 1_000_000


def mg_partition_summaries(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries: each input partition
    reduces to ≤ ``capacity`` (item, weight) rows with
    ``weight(x) ≥ freq_partition(x) − N_partition/(capacity+1)``.

    Per Arrow batch the update is vectorized (``value_counts`` then a
    single mergeable-summary prune: subtract the (capacity+1)-th
    largest weight, drop non-positives — Agarwal et al.'s merge rule,
    which preserves the MG undercount bound)."""
    import pandas as pd

    cap = int(capacity)
    if cap < 1:
        raise ValueError(f"capacity must be ≥ 1: {cap}")

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[key_col].value_counts()
            for item, cnt in vc.items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > cap:
                # mergeable-summary prune: subtract the (cap+1)-th
                # largest weight from everything, keep positives
                sub = sorted(counters.values(), reverse=True)[cap]
                counters = {
                    x: w - sub for x, w in counters.items() if w - sub > 0
                }
        yield pd.DataFrame(
            {"item": list(counters.keys()),
             "weight": [int(w) for w in counters.values()]}
        )

    return (
        df.select(F.col(key_col).cast("string").alias(key_col))
        .mapInPandas(summarize, "item string, weight long")
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_ppm: int,
    capacity: int | None = None,
) -> DataFrame:
    """Every item with ``freq/N ≥ threshold_ppm/1e6``, with its EXACT
    count — (item, freq), BIGINT, deterministic regardless of
    partitioning.

    ``capacity`` defaults to ``2·1e6/threshold_ppm`` (2× the bound
    that guarantees candidate completeness); passing a smaller value
    raises rather than silently risking missed hitters."""
    t = int(threshold_ppm)
    if not 0 < t <= PPM:
        raise ValueError(f"threshold_ppm must be in (0, 1e6]: {t}")
    needed = math.ceil(PPM / t)
    cap = int(capacity) if capacity is not None else 2 * needed
    if cap < needed:
        raise ValueError(
            f"capacity {cap} cannot guarantee completeness at "
            f"{t} ppm — need ≥ {needed}"
        )
    n = df.count()
    if n == 0:
        return df.sparkSession.createDataFrame([], "item string, freq long")
    candidates = (
        mg_partition_summaries(df, key_col, cap)
        .groupBy("item")
        .agg(F.sum("weight").alias("_w"))
        .select("item")
    )
    keyed = df.select(F.col(key_col).cast("string").alias("item"))
    exact = (
        keyed.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return (
        exact.filter(F.col("freq") * PPM >= F.lit(t * n))
        .orderBy(F.desc("freq"), "item")
    )
