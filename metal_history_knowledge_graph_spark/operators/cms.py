"""Count-min sketch — bounded-state frequency estimation (Cormode &
Muthukrishnan 2005) for heavy-hitter screening over cardinalities too
large to groupBy exactly, and for mergeable per-shard frequency state
(sketches of two corpus shards add cell-wise).

The sketch is a *sparse cell table* ``(row, col, cnt)`` — d hash rows
× w counters, md5-derived columns (the repo's cross-engine hash
pattern, sampling.hash_bucket), built with one constant fan-out
explode (d rows per occurrence) and one partial-agg count. Estimates
are ``min`` over the d cells (classic CMS: overcounts only, never
undercounts). Both build and estimate replay exactly in DuckDB
(q_cms_estimate pins estimates next to exact counts).

Scale: the cell table is at most d·w rows regardless of input size —
a 5×65536 sketch is ~300k cells for ANY corpus, broadcastable at
probe time; the build shuffle carries (row, col) pairs with map-side
combine, so 10¹² token occurrences reduce to ≤ d·w cells per
partition before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import md5_mod


def _cms_col(key: Column, row: int, w: int) -> Column:
    """Column index of ``key`` in hash row ``row`` (md5-derived, 60
    hash bits, BIGINT-safe, exactly reproducible in ANSI SQL)."""
    return md5_mod(key, f"cms:{row}|", w)


def _cells(key: Column, d: int, w: int) -> Column:
    """The d ``struct(row, col)`` cells of ``key`` — the ONE place the
    cell derivation lives; build and estimate must agree or every
    estimate is silently wrong."""
    return F.array(
        *[
            F.struct(F.lit(i).alias("row"), _cms_col(key, i, w).alias("col"))
            for i in range(d)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, d: int = 5, w: int = 1 << 16
) -> DataFrame:
    """Build the sparse cell table ``(row, col, cnt)`` counting every
    input row's key (pre-aggregate duplicates upstream if the input
    carries a count column — see ``cms_build_weighted``)."""
    cells = df.select(F.explode(_cells(F.col(key_col), d, w)).alias("_c"))
    return (
        cells.select("_c.row", "_c.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_build_weighted(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    d: int = 5,
    w: int = 1 << 16,
) -> DataFrame:
    """Build from pre-aggregated ``(key, weight)`` rows — the shape a
    per-shard word-count table already has; sums weights per cell."""
    cells = df.select(
        F.col(weight_col).alias("_w"),
        F.explode(_cells(F.col(key_col), d, w)).alias("_c"),
    )
    return (
        cells.select("_c.row", "_c.col", "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two same-shape sketches (CMS is a linear
    sketch — per-shard sketches merge without touching the data)."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    sketch: DataFrame,
    key_col: str,
    d: int = 5,
    w: int = 1 << 16,
    out_col: str = "est_count",
) -> DataFrame:
    """Estimate each row's key frequency: min over the d cells
    (missing cell → 0). Adds ``out_col``; never undercounts.

    Probe plan: constant fan-out to d cells, broadcast-join against
    the (≤ d·w row) sketch, min-fold per key.
    """
    probes = df.select(key_col).distinct().select(
        F.col(key_col).alias("_key"),
        F.explode(_cells(F.col(key_col), d, w)).alias("_c"),
    ).select("_key", "_c.row", "_c.col")
    est = (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("_key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )
    return df.join(
        est.withColumnRenamed("_key", key_col), key_col, "left"
    ).withColumn(
        # NULL keys never match the probe join-back — account them as
        # 0, not NULL (bloom_probe makes the same choice with False)
        out_col, F.coalesce(F.col(out_col), F.lit(0).cast("long"))
    )
