"""Trending-term (burst) detection between consecutive corpus
windows — the temporal text statistic a crawl scheduler feeds on:
terms whose occurrence RATE jumped against the previous snapshot mark
emerging topics (recrawl those hosts first), while collapsing terms
mark decay (Kleinberg 2002's burst model is the continuous version;
this is the two-window rate-ratio screen production pipelines
actually run per snapshot).

Determinism / oracle design: everything is integer counts and ppb/ppm
fixed-point floor-divides — no floats, no exports; a DuckDB oracle
re-derives the whole table from raw text. Rates are normalized by
window token totals (windows differ in size), with add-one smoothing
on the previous window so new-born terms score finite, comparable
bursts:

    rate_ppb(w)   = (1e9 · c_w)        div N_w
    prev_ppb(w−1) = (1e9 · (c_{w−1}+1)) div N_{w−1}
    burst_ppm     = (1e6 · rate_ppb)   div prev_ppb

Bounds: 1e9·c needs c < 9.2·10⁹ occurrences of ONE term in ONE
window — beyond any single-snapshot term count in practice; the ppm
scale-up is bounded by 1e6·1e9 < 2^63. Precision: rare terms floor to
0 ppb against a ≥ 9.2·10⁹-token window — the ``min_count`` screen
(default 3) removes exactly those rows anyway.

Scale shape (per-snapshot corpora): one narrow tokenize+explode, one
(window, term) partial-agg groupBy, a window-sized totals dim
(broadcast — snapshots number in the dozens), and one shifted
equi-join of the counts table against itself on (term, window−1).
No global sort; the top-k cut is the caller's TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens

PPB = 1_000_000_000
MICRO = 1_000_000


def burst_terms(
    df: DataFrame,
    window_col: str = "window",
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Per-(window, term) burst scores against the PREVIOUS window:
    (window, term, c, n_tokens, prev_c, prev_n, burst_ppm), one row
    per term with ``c ≥ min_count`` in a window whose predecessor
    (``window − 1``) exists in the data. Windows are dense integers —
    derive them upstream (epoch-day, snapshot id); a missing
    predecessor window yields no rows rather than an infinite burst.

    Terms absent from the previous window enter with prev_c = 0 and
    score against the smoothed floor — the born-this-window case the
    screen exists to catch.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be ≥ 1: {min_count}")
    toks = df.select(
        F.col(window_col).cast("long").alias("w"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    counts = (
        toks.groupBy("w", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = counts.groupBy("w").agg(F.sum("c").cast("long").alias("n"))
    cur = (
        counts.filter(F.col("c") >= int(min_count))
        .join(F.broadcast(totals), "w")
    )
    prev = counts.select(
        (F.col("w") + 1).alias("w"),
        F.col("term"),
        F.col("c").alias("prev_c"),
    )
    prev_tot = totals.select(
        (F.col("w") + 1).alias("w"), F.col("n").alias("prev_n")
    )
    return (
        cur.join(F.broadcast(prev_tot), "w")  # inner: predecessor must exist
        .join(prev, ["w", "term"], "left")
        .withColumn("prev_c", F.coalesce(F.col("prev_c"), F.lit(0)).cast("long"))
        .withColumn(
            "burst_ppm",
            # greatest(1, ·): a > 1e9·(prev_c+1)-token previous window
            # floors the smoothed rate to 0 ppb — clamp to 1 so the
            # divide never hits zero (Spark's div-by-0 is NULL but
            # DuckDB's // raises; the clamp keeps both engines on the
            # same finite number).
            F.expr(
                f"({MICRO} * (({PPB} * c) div n))"
                f" div greatest(1L, ({PPB} * (prev_c + 1)) div prev_n)"
            ),
        )
        .select(
            F.col("w").alias("window"), "term", "c",
            F.col("n").alias("n_tokens"), "prev_c", "prev_n", "burst_ppm",
        )
    )
