"""Generalized suffix array over a document collection by distributed
prefix doubling (Larsson–Sadakane / Manber–Myers doubling, the
standard massively-parallel suffix-array construction — each round
re-ranks suffixes by their first 2h characters using only the
previous round's ranks, so the whole build is O(log maxlen) rounds of
joins and sorts, never a string comparison longer than one char).

This is the index structure behind exact-substring training-data
dedup (Lee et al. 2022 build one to find all duplicated substrings);
the k-gram reformulation of that pass lives in ``operators/spans.py``
— this module provides the exact structure itself for consumers that
need suffix order (longest-repeat mining, BWT, substring counting).

Semantics: the GENERALIZED suffix array — one suffix per (doc,
position), suffixes never cross document boundaries, and identical
suffix strings in different documents share a dense rank. That makes
the oracle a one-liner (``dense_rank() OVER (ORDER BY substr(text,
pos))``) and needs no concatenation sentinels.

Scale shape: one row per character position — the honest distributed
formulation (a 100 TB corpus is ~10¹⁴ positions; real deployments
build per-shard generalized arrays or rank only k-gram anchors, both
of which this operator supports by feeding it a document subset). Per
round: one self equi-join on (doc, pos+h) (8-byte keys), one distinct
over rank pairs, one RANGE-partitioned per-partition sort for the
global dense re-rank (no single-reducer window — ranks are assembled
from per-partition row_numbers plus broadcast partition offsets, the
two-phase distributed-sort pattern), one join-back. Lineage is cut
per round with ``localCheckpoint`` exactly like pagerank/label_propagation
(the repo's fixed-point idiom, graph_algos.py). Rounds stop early the
moment every rank is unique (max rank == n−1 — one 1-row agg per
round, the same driver-probe budget as connected_components).

No Python rows anywhere: the only driver state is the alphabet (the
distinct single characters — vocabulary-sized by definition) and the
per-partition count vector (≤ shuffle partitions rows per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _global_dense_rank(keys: DataFrame, cols: list[str]) -> DataFrame:
    """0-based global rank of DISTINCT ``keys`` rows under the
    lexicographic order of ``cols``, without a global window: range
    partition → per-partition row_number → add broadcast partition
    offsets. Equal keys never straddle a range boundary (input is
    distinct), so per-partition row_numbers + offsets ARE the global
    dense ranks."""
    spark = keys.sparkSession
    p = keys.repartitionByRange(*cols)
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in cols])
    local = (
        p.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(w))
        .localCheckpoint(eager=True)  # feeds the count probe AND the join
    )
    counts = {
        r["_pid"]: r["n"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offs, acc = [], 0
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    if not offs:
        return local.select(*cols, F.lit(0).cast("long").alias("_grank")).limit(0)
    off_df = spark.createDataFrame(offs, "_pid int, _off long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .select(*cols, (F.col("_off") + F.col("_lr") - 1).alias("_grank"))
    )


def suffix_ranks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rounds: int = 64,
) -> DataFrame:
    """``(id, pos, suffix_rank)`` — the dense 0-based rank of the
    suffix ``text[pos:]`` (1-based ``pos``) among ALL suffixes of all
    documents; equal suffix strings share a rank. NULL/empty texts
    contribute nothing.

    ``max_rounds`` bounds the doubling loop (round r compares
    prefixes of length 2^r, so 64 covers any text); the loop exits
    early once ranks are all-distinct, which for natural text happens
    around log2(longest repeated substring).
    """
    chars = (
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) >= 1))
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length(text_col)),
                    lambda i: F.col(text_col).substr(i, F.lit(1)),
                )
            ),
        )
        .select("_id", (F.col("pos") + 1).alias("_pos"), F.col("col").alias("_c"))
    )
    chars = chars.localCheckpoint(eager=True)  # alphabet probe + first rank
    # initial ranks: order of the single character. The alphabet is
    # vocabulary-sized (≤ charset); driver sort is by codepoint, which
    # equals Spark's UTF8 binary order (UTF-8 preserves codepoint order).
    alphabet = sorted(r["_c"] for r in chars.select("_c").distinct().collect())
    spark = df.sparkSession
    cmap = spark.createDataFrame(
        [(c, i) for i, c in enumerate(alphabet)], "_c string, _r long"
    )
    r = chars.join(F.broadcast(cmap), "_c").select(
        "_id", "_pos", F.col("_r").alias("_rank")
    ).localCheckpoint(eager=True)
    stats = r.agg(
        F.count(F.lit(1)).alias("n"), F.max("_pos").alias("maxlen")
    ).collect()[0]
    n = stats["n"]
    if n == 0:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, pos int, suffix_rank long"
        )
    max_len = stats["maxlen"]  # longest suffix = longest text
    h = 1
    for _ in range(max_rounds):
        if h >= max_len:
            break  # prefixes of length h cover every whole suffix —
            # ranks are final even where duplicate strings share one
        if r.agg(F.max("_rank")).collect()[0][0] == n - 1:
            break  # every rank unique — suffix order is final
        shifted = r.select(
            "_id", (F.col("_pos") - h).alias("_pos"), F.col("_rank").alias("_r2")
        )
        pairs = (
            r.join(shifted, ["_id", "_pos"], "left")
            .select(
                "_id",
                "_pos",
                F.col("_rank").alias("_r1"),
                # suffix shorter than h+1 chars: sorts before any
                # continuation (prefix-of sorts first in byte order)
                F.coalesce(F.col("_r2"), F.lit(-1)).alias("_r2"),
            )
            .localCheckpoint(eager=True)  # feeds distinct AND join-back
        )
        keys = _global_dense_rank(pairs.select("_r1", "_r2").distinct(), ["_r1", "_r2"])
        r = (
            pairs.join(keys, ["_r1", "_r2"])
            .select("_id", "_pos", F.col("_grank").alias("_rank"))
            .localCheckpoint(eager=True)
        )
        h *= 2
    return r.select(
        F.col("_id").alias(id_col),
        F.col("_pos").cast("int").alias("pos"),
        F.col("_rank").cast("long").alias("suffix_rank"),
    )


def suffix_array(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rounds: int = 64,
) -> DataFrame:
    """The suffix array view of :func:`suffix_ranks`: rows ``(sa_rank,
    id, pos)`` — position ``sa_rank`` in suffix order holds suffix
    ``(id, pos)``. Where duplicate suffixes share a dense rank, the
    tie is broken by ``(id, pos)`` so the array is a total order
    (documented: a true SA over distinct suffixes; equal strings are
    interchangeable)."""
    ranks = suffix_ranks(df, text_col, id_col, max_rounds)
    w = Window.partitionBy("_pid").orderBy("suffix_rank", id_col, "pos")
    p = ranks.repartitionByRange("suffix_rank", id_col, "pos")
    local = (
        p.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(w))
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offs, acc = [], 0
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    if not offs:
        return ranks.select(
            F.lit(0).cast("long").alias("sa_rank"), id_col, "pos"
        ).limit(0)
    off_df = ranks.sparkSession.createDataFrame(offs, "_pid int, _off long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .select(
            (F.col("_off") + F.col("_lr") - 1).alias("sa_rank"), id_col, "pos"
        )
    )
