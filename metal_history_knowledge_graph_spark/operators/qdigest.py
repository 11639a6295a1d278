"""Q-digest — the MERGEABLE quantile sketch (Shrivastava et al.,
SenSys 2004; Agarwal et al. "Mergeable summaries", PODS 2012) the
sketch family (bloom/cms/hll/kmv) was missing: rank/quantile queries
with error ≤ log₂(σ)/k · n from a summary of O(k·log σ) dyadic nodes,
where per-shard digests fold into the corpus digest by nodewise count
addition + one recompression — no rescan.

Why q-digest and not GK/KLL/t-digest: those are ORDER-DEPENDENT (the
summary depends on insertion order), so a Spark run could never be
replayed by a SQL oracle and would not even be deterministic across
its own partitionings. Q-digest is a pure function of the value
HISTOGRAM: leaf counts live at the bottom of a fixed binary tree over
the integer domain [0, 2^bits), and compression walks levels leaf →
root, merging both children into their parent whenever
``cnt(left) + cnt(right) + cnt(parent) ≤ n div k`` — applied
synchronously per level, which makes the digest deterministic,
partition-independent, and bit-exactly replayable in chained SQL CTEs.

Scale shape: the ONLY data-sized operation is the initial
``groupBy(value).count()`` histogram (partial-agg, map-side combine
collapses hot values). Compression iterates ``bits`` times over the
DIGEST-sized table (≤ distinct clipped values, shrinking every
level), each step one small join + agg with lineage cut. Quantile
extraction is a window over the final digest (bounded rows). Exact
quantiles (operators/quantiles.exact_quantiles) stay the oracle-grade
tool; this is the streaming/incremental path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def qdigest_build(
    df: DataFrame,
    value_col: str,
    bits: int = 12,
    k: int = 32,
) -> DataFrame:
    """Build the q-digest of ``value_col`` (clipped to [0, 2^bits −
    1]; negative/NULL raise — corrupt input). Returns digest rows
    ``(nid, lvl, cnt)``: node ``nid`` at level ``lvl`` covers the
    dyadic interval of width ``2^(bits−lvl)`` starting at
    ``(nid − 2^lvl)·2^(bits−lvl)``; leaves are level ``bits``.
    Compression threshold is ``n div k`` (k = compression factor:
    digest size O(k·bits), rank error ≤ bits·n div k)."""
    v = F.col(value_col).cast("long")
    bad = df.filter(v.isNull() | (v < 0)).limit(1).count()
    if bad:
        raise ValueError(
            f"qdigest_build: null/negative {value_col} values — corrupt input"
        )
    top = (1 << bits) - 1
    leaves = (
        df.select(
            (F.lit(1 << bits) + F.least(v, F.lit(top))).alias("nid")
        )
        .groupBy("nid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("lvl", F.lit(bits).cast("int"))
    )
    n = leaves.agg(F.sum("cnt")).collect()[0][0] or 0
    return _compress(leaves, bits, n // k)


def qdigest_merge(
    parts: list[DataFrame], bits: int = 12, k: int = 32
) -> DataFrame:
    """Fold shard digests into the corpus digest: nodewise count sum,
    then one recompression at the merged total's threshold — the
    mergeable-summaries property (PODS 2012 §3.2). Node counts may sit
    at internal levels here (unlike a fresh build), which the
    compression loop handles via the parent term."""
    merged = parts[0].select("nid", "lvl", "cnt")
    for p in parts[1:]:
        merged = merged.unionByName(p.select("nid", "lvl", "cnt"))
    summed = merged.groupBy("nid", "lvl").agg(F.sum("cnt").alias("cnt"))
    n = summed.agg(F.sum("cnt")).collect()[0][0] or 0
    return _compress(summed, bits, n // k)


def _compress(nodes: DataFrame, bits: int, thr: int) -> DataFrame:
    """Synchronous leaf→root q-digest compression: at child level l,
    every parent whose ``children_sum + parent_cnt ≤ thr`` absorbs
    both children. Each level is one digest-sized join + agg."""
    # coalesce per level: the three-way union would otherwise ACCUMULATE
    # partitions (rest + kept + parents each carry their own), ending at
    # levels×3×P tasks for a digest-sized table
    n_parts = max(int(nodes.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "8")) // 2, 4)
    cur = nodes.localCheckpoint(eager=True)
    if thr <= 0:
        return cur
    for l in range(bits, 0, -1):
        ch = cur.filter(F.col("lvl") == l)
        rest = cur.filter(F.col("lvl") != l)
        par_sum = ch.groupBy(F.expr("nid div 2").alias("p")).agg(
            F.sum("cnt").alias("cs")
        )
        existing = rest.filter(F.col("lvl") == l - 1).select(
            F.col("nid").alias("p"), F.col("cnt").alias("pcnt")
        )
        dec = par_sum.join(existing, "p", "full").select(
            "p",
            F.coalesce(F.col("cs"), F.lit(0)).alias("cs"),
            F.coalesce(F.col("pcnt"), F.lit(0)).alias("pcnt"),
        ).withColumn("mrg", (F.col("cs") + F.col("pcnt")) <= F.lit(thr))
        kept_children = ch.join(
            dec.filter(F.col("mrg")).select(F.col("p")),
            ch["nid"] == F.col("p") * 2,
            "left_anti",
        ).join(
            dec.filter(F.col("mrg")).select(F.col("p")),
            ch["nid"] == F.col("p") * 2 + 1,
            "left_anti",
        )
        parents = dec.filter(
            (F.col("cs") + F.col("pcnt")) > 0
        ).select(
            F.col("p").alias("nid"),
            F.lit(l - 1).cast("int").alias("lvl"),
            F.when(F.col("mrg"), F.col("cs") + F.col("pcnt"))
            .otherwise(F.col("pcnt"))
            .cast("long")
            .alias("cnt"),
        ).filter(F.col("cnt") > 0)
        cur = (
            rest.filter(F.col("lvl") != l - 1)
            .unionByName(kept_children.select("nid", "lvl", "cnt"))
            .unionByName(parents)
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
    return cur


def qdigest_quantiles(
    digest: DataFrame, bits: int, qs_permille: list[int]
) -> DataFrame:
    """Quantile answers from a digest: nodes sorted by (interval hi
    ASC, lvl DESC — narrower first), counts prefix-summed; the
    q-quantile is the hi endpoint of the first node where the running
    count reaches ``ceil(q·n)`` (integer: ``(q_pm·n + 999) div
    1000``). Returns ``(q_permille, value, n_total)`` — every number
    deterministic, window runs over digest-sized input only."""
    d = digest.withColumn(
        "hi",
        F.expr(
            f"CAST((nid - shiftleft(1L, lvl)) * shiftleft(1L, {bits} - lvl)"
            f" + shiftleft(1L, {bits} - lvl) - 1 AS BIGINT)"
        ),
    )
    w = Window.orderBy("hi", F.desc("lvl"), "nid").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = d.withColumn("run", F.sum("cnt").over(w))
    total = cum.agg(F.sum("cnt").alias("_n"))
    qdf = digest.sparkSession.createDataFrame(
        [(int(q),) for q in qs_permille], "q_permille long"
    )
    tgt = qdf.join(F.broadcast(total), F.lit(True), "left").select(
        "q_permille",
        F.expr("(q_permille * _n + 999L) div 1000").alias("_tgt"),
        F.col("_n"),
    )
    hit = (
        cum.join(F.broadcast(tgt), F.col("run") >= F.col("_tgt"))
        .groupBy("q_permille", "_n")
        .agg(F.min("hi").alias("value"))
    )
    return hit.select(
        "q_permille", "value", F.col("_n").cast("long").alias("n_total")
    )
