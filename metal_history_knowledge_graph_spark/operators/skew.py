"""Skew-aware aggregation utilities.

Hot keys are intrinsic to this workload: 'Black Sabbath' appears in a
large fraction of all pages (the corpus generator plants ≥10% skew on
purpose). Three lines of defense, in order:

1. **Partial (map-side) aggregation** — free from Spark's hash
   aggregate for algebraic aggs (count/sum/min/max): a hot key is
   combined within each input partition before the shuffle. This is
   why the mention pre-agg (canonicalize.surface_forms) survives a
   10⁶-mention entity.
2. **AQE skew handling** — enabled in session.py for join-side skew.
3. **Explicit two-phase salting** (this module) — for aggregations
   whose buffers grow with group size (collect_list/collect_set,
   percentile sketches), where partial agg doesn't bound the reduce
   side: add a salt ∈ [0, n) to the key, aggregate (key, salt) partials
   in parallel, then merge the n partials per key.

``salted_agg`` is semantics-preserving for any commutative,
mergeable aggregation — the equality with the naive plan is pinned by
tests/test_skew.py on a synthetic 10⁵-row hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 32, col_name: str = "_salt") -> DataFrame:
    """Uniform per-row salt, deterministic for a fixed input
    partitioning. Derived from ``xxhash64(monotonically_increasing_id)``
    — NOT from ``spark_partition_id`` alone: if the input arrives
    already hash-partitioned by the very keys being salted (e.g.
    straight out of an upstream groupBy on them), every row of a hot
    key shares one partition, a partition-id salt collapses to a
    single value, and the skew treatment silently does nothing. The
    row-sequence hash spreads a hot key across all ``n_salts`` values
    regardless of how the input is partitioned."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) with
    ``partial_aggs``, then groupBy(keys) with ``final_aggs`` merging
    the partials. Caller supplies matched partial/final pairs, e.g.::

        salted_agg(df, ["k"],
                   [F.count(F.lit(1)).alias("c"),
                    F.collect_set("v").alias("vs")],
                   [F.sum("c").alias("c"),
                    F.array_distinct(F.flatten(F.collect_list("vs"))).alias("vs")])
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_collect_set(
    df: DataFrame, keys: list[str], value_col: str, n_salts: int = 32,
    out_col: str | None = None,
) -> DataFrame:
    """The common case: per-key distinct-value collection that would
    otherwise funnel a hot key's every row through one reducer."""
    out_col = out_col or f"{value_col}_set"
    return salted_agg(
        df, keys,
        [F.collect_set(value_col).alias("_partial")],
        [F.array_sort(F.array_distinct(F.flatten(F.collect_list("_partial")))).alias(out_col)],
        n_salts,
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-safe equi-join WITHOUT broadcast: for the case where the
    dimension side is too large to broadcast but the fact side has hot
    keys (one famous band = millions of rows landing on one reducer of
    a shuffled join).

    The big side gets a uniform salt; the small side is replicated once
    per salt value (|small| × n_salts rows — cheap when small ≪ big);
    the join key becomes (keys…, salt), so a hot key's rows spread over
    ``n_salts`` reducers instead of one. Semantics-preserving for
    ``inner`` and ``left`` joins (every (key, salt) pair exists on the
    replicated side exactly once per small-side row).

    Prefer, in order: broadcast (dim fits), AQE skew-join splitting
    (session default), then this explicit treatment — it composes with
    pre-aggregation and works when AQE's runtime stats miss the skew.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    b = with_salt(big, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [*keys, "_salt"], how).drop("_salt")


def salted_count_distinct(
    df: DataFrame, keys: list[str], value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per key without a single-reducer hot spot:
    dedupe on (key, value) first, then count. No explicit salt column
    is needed — the (key, value) distinct IS the spread (hot keys fan
    out across reducers by value, and the map-side partial aggregation
    collapses repeats before the shuffle); the follow-up count per key
    receives at most |distinct values| rows per key."""
    return (
        df.select(*keys, value_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
