"""KMV (k-minimum-values / bottom-k) distinct sketches — the mergeable
cardinality estimator that, unlike HyperLogLog (operators/hll.py), also
supports SET-OVERLAP estimation: two groups' bottom-k signatures yield
an unbiased Jaccard estimate (Beyer et al. SIGMOD 2007; Cohen–Kaplan
"summarizing data using bottom-k sketches", PODC 2007), which is what
"how much does host A's vocabulary overlap host B's" needs at corpus
scale where exact per-pair distinct intersection is a full shuffle of
the universe.

Every number is a deterministic integer: item hashes are the repo's
shared md5 scheme (``sampling.md5_mod``, 56 bits here — replayable in
ANSI SQL), the k-th minimum is an integer, and the estimator
``(k−1)·2^56 div h_k`` is a BIGINT floor-divide. Groups with fewer
than k distinct items keep their EXACT count (the sketch saw every
hash) — flagged in the ``exact`` column.

Scale shape: the sketch is built with one distinct + one window
PARTITIONED by group (parallelism = #groups; the window input is
already collapsed to distinct (group, hash) pairs). Sketches are
row-sets of ≤ k per group — vocabulary-sized downstream. Merging is
union + re-cut (pure row operations, no driver state), so per-day /
per-shard sketches fold incrementally like the Bloom/CMS/HLL family.
The pairwise Jaccard joins sketches ON THE HASH VALUE — output is
bounded by k·|groups|² only for groups that actually share hashes,
never a cross join of the universe.

No counterpart in the reference repo (its Kuzu store has COUNT
DISTINCT only); this is a training-data/crawl addition per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.sampling import md5_mod

#: hash domain: 56 bits (14 hex chars) — sized so the Beyer estimator
#: numerator (k−1)·2^56 stays BIGINT-safe for k ≤ 128 in BOTH engines
#: (60 bits would overflow 2^63 at k = 9; DuckDB would silently promote
#: to HUGEINT while Spark wrapped — a cross-engine trap). 56-bit
#: birthday bound: ~2^28 ≈ 268M distinct items per group before
#: collisions bias the k-th minimum — far above any per-group
#: vocabulary this sketch is pointed at.
DOMAIN = 1 << 56
MAX_K = 128


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Bottom-k sketch per group: the k smallest distinct 56-bit md5 hashes of
    ``item_col`` within each ``group_col``, as long-form rows
    ``(group, h, rn)`` with rn = 1..k ascending by h. Deterministic,
    partition-independent, mergeable (see :func:`kmv_merge`)."""
    if not 1 < k <= MAX_K:
        raise ValueError(
            f"kmv_sketch: k must be in (1, {MAX_K}] (BIGINT estimator "
            f"bound), got {k}"
        )
    h = md5_mod(F.col(item_col), f"kmv:{seed}|", DOMAIN, hex_chars=14)
    pairs = (
        df.select(F.col(group_col).alias("grp"), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_merge(parts: list[DataFrame], k: int) -> DataFrame:
    """Fold per-shard sketches into the corpus sketch: union, re-dedup
    hashes, re-cut bottom-k. Identical to sketching the concatenated
    input (bottom-k of a union is the bottom-k of per-part bottom-ks),
    so daily sketches maintain a rolling corpus sketch without
    rescanning history."""
    merged = parts[0].select("grp", "h")
    for p in parts[1:]:
        merged = merged.unionByName(p.select("grp", "h"))
    w = Window.partitionBy("grp").orderBy("h")
    return (
        merged.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_distinct(sketch: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate per group from a :func:`kmv_sketch`:
    ``(grp, n_distinct_est, exact)`` — groups holding < k hashes are
    exact (the sketch is exhaustive); otherwise the unbiased KMV
    estimator ``(k−1)·2^56 div h_k`` (Beyer et al. 2007 Thm 1), a pure
    BIGINT floor-divide."""
    agg = sketch.groupBy("grp").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("_hk"),
    )
    return agg.select(
        "grp",
        F.when(F.col("_n") < k, F.col("_n"))
        .otherwise(
            F.expr(f"CAST(({k} - 1) * {DOMAIN}L div greatest(_hk, 1L) "
                   "AS BIGINT)")
        )
        .cast("long")
        .alias("n_distinct_est"),
        (F.col("_n") < k).alias("exact"),
    )


def kmv_jaccard(
    sketch: DataFrame, k: int, min_shared: int = 1
) -> DataFrame:
    """Pairwise Jaccard estimate between ALL group pairs from one
    sketch table: for pair (a, b), take the bottom-k of the MERGED
    hash sets (the union's sketch — computable from the two sketches
    alone) and count how many of those hashes occur in both sides:
    ``J ≈ shared_in_cut / cut_size`` (Cohen–Kaplan coordinated
    bottom-k). Output ``(grp_a, grp_b, shared_in_cut, cut_size,
    jaccard_permille)`` with grp_a < grp_b, integer ‰.

    Plan: self-join on the HASH VALUE to find shared hashes (bounded
    by the sketch rows, never the universe), a union + re-window for
    the merged cut, one join to flag membership. ``min_shared`` prunes
    pairs with no overlap evidence before the output."""
    a = sketch.select(F.col("grp").alias("ga"), "h")
    b = sketch.select(F.col("grp").alias("gb"), "h")
    # merged bottom-k per unordered pair: union of the two sketches'
    # hashes, deduped, re-cut at k
    pairs = (
        a.join(b, "h")
        .filter(F.col("ga") < F.col("gb"))
        .select("ga", "gb")
        .distinct()
    )
    # hashes of the union, tagged with which sides hold them
    uni = (
        pairs.join(a.withColumnRenamed("h", "ha"), "ga")
        .select("ga", "gb", F.col("ha").alias("h"),
                F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(b.withColumnRenamed("h", "hb"), "gb")
            .select("ga", "gb", F.col("hb").alias("h"),
                    F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    cut = uni.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    out = cut.groupBy("ga", "gb").agg(
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1)
            .otherwise(0)
        ).alias("shared_in_cut"),
        F.count(F.lit(1)).alias("cut_size"),
    )
    return (
        out.filter(F.col("shared_in_cut") >= min_shared)
        .select(
            F.col("ga").alias("grp_a"),
            F.col("gb").alias("grp_b"),
            F.col("shared_in_cut").cast("long").alias("shared_in_cut"),
            F.col("cut_size").cast("long").alias("cut_size"),
            F.expr("CAST(shared_in_cut * 1000L div cut_size AS BIGINT)")
            .alias("jaccard_permille"),
        )
    )
