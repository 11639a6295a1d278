"""Exact distributed quantiles WITHOUT a global sort — the profiling
primitive `percentile_approx` cannot give you (its answer depends on
an error bound) and `orderBy().limit()` cannot afford (a total sort
of 100 TB to read one row).

Design: deterministic sampled pivots + exact rank passes.

1. A deterministic md5 hash sample over the DISTINCT VALUES
   (``sampling.hash_bucket`` — NOT ``df.sample``, whose output changes
   with partitioning) yields a driver-sized pivot candidate set.
2. ONE full pass computes the EXACT rank of every pivot
   (``count(x ≤ pivot)`` for all pivots in a single partial-agg
   aggregate — pivots are inlined literals, so the pass is a narrow
   scan + one 1-row agg, whole-stage-codegen comparisons only).
3. Each requested quantile is bracketed between adjacent pivots; the
   final pass scans only rows INSIDE brackets (a pushed-down range
   filter), aggregates per-VALUE counts (so heavy duplicate values
   cost one row each, never one row per duplicate), and resolves the
   order statistic with a running sum over the bracket's sorted
   distinct values — bounded window state. The operator RAISES if a
   bracket's distinct-value population exceeds ``max_bracket`` instead
   of silently degrading (raise ``sample_rate`` — more pivots, thinner
   brackets).

The answer is the exact order statistic ``value at row ⌈q·N⌉`` of the
full sorted column — deterministic, partitioning-independent, and
directly checkable by any engine's row_number() replay, which is what
the DuckDB oracle does (no exports, no approximation to excuse).

Scale shape at 100 TB: two scans + one filtered scan; no shuffle wider
than a 1-row agg and the per-bracket distinct-value groupBy (map-side
combined). The driver only ever holds pivots and per-bracket answers.

Reference analogue: the degree-distribution percentile queries
(SURVEY §2.8's percentile family) — exact instead of approximate, at
cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import hash_bucket


def exact_quantiles(
    df: DataFrame,
    col: str,
    quantiles_permille: list[int],
    sample_rate: float = 0.01,
    max_bracket: int = 10_000_000,
) -> DataFrame:
    """(q_permille, value, rank): for each requested quantile q (in
    permille), the EXACT order statistic at 1-based rank
    ``max(1, ceil(q/1000 · N))`` over the non-null values of ``col``
    (value keeps the input column's type).

    Raises if any bracket the final pass must resolve holds more than
    ``max_bracket`` DISTINCT values (raise ``sample_rate`` instead)."""
    qs = sorted(set(int(q) for q in quantiles_permille))
    if not qs or qs[0] < 0 or qs[-1] > 1000:
        raise ValueError(f"quantiles_permille must be within [0, 1000]: {qs}")
    vtype = dict(df.dtypes)[col]
    out_schema = f"q_permille int, value {vtype}, rank long"
    vals = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    n = vals.count()
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], out_schema)
    # integer ceil — float division could misround at 10^12-row scale
    targets = {q: max(1, (q * n + 999) // 1000) for q in qs}

    # 1. deterministic pivot candidates (driver-sized)
    cutoff = max(1, int(sample_rate * 1_000_000))
    pivots = sorted(
        r["v"]
        for r in vals.select("v").distinct().filter(
            hash_bucket(F.col("v").cast("string"), seed=0, domain="quant:")
            < cutoff
        ).collect()
    )

    # 2. one pass: exact rank of every pivot (count of rows ≤ pivot)
    pivot_ranks: list[int] = []
    if pivots:
        rank_row = vals.agg(
            *[
                F.sum((F.col("v") <= F.lit(p)).cast("long")).alias(f"r{i}")
                for i, p in enumerate(pivots)
            ]
        ).head()
        pivot_ranks = [int(rank_row[f"r{i}"]) for i in range(len(pivots))]

    # 3. bracket each target between adjacent pivots; identical
    #    (lo, hi) brackets are deduped so several quantiles landing
    #    between the same pivots share one range
    uniq: dict[tuple, int] = {}
    b_lo_val: list = []
    b_lo_rank: list[int] = []
    b_hi_val: list = []
    wanted = []  # (bracket_idx, offset_within_bracket, q, target)
    for q in qs:
        t = targets[q]
        lo_val, lo_rank, hi_val = None, 0, None
        for p, r in zip(pivots, pivot_ranks):
            if r < t:
                lo_val, lo_rank = p, r
            else:
                hi_val = p
                break
        key = (lo_val, hi_val)
        if key not in uniq:
            uniq[key] = len(b_lo_val)
            b_lo_val.append(lo_val)
            b_lo_rank.append(lo_rank)
            b_hi_val.append(hi_val)
        wanted.append((uniq[key], t - b_lo_rank[uniq[key]], q, t))

    # 4. final pass: per-value counts inside brackets, running sum
    #    over sorted distinct values, answer = min value whose
    #    cumulative count reaches the offset
    tag = None
    keep = None
    for bi in range(len(b_lo_val)):
        cond = F.lit(True)
        if b_lo_val[bi] is not None:
            cond = cond & (F.col("v") > F.lit(b_lo_val[bi]))
        if b_hi_val[bi] is not None:
            cond = cond & (F.col("v") <= F.lit(b_hi_val[bi]))
        t_ = F.when(cond, F.lit(bi))
        tag = t_ if tag is None else F.coalesce(tag, t_)
        keep = cond if keep is None else (keep | cond)
    grp = (
        vals.filter(keep)
        .withColumn("_b", tag)
        .groupBy("_b", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["_b"]: r["d"]
        for r in grp.groupBy("_b").agg(
            F.count(F.lit(1)).alias("d")).collect()
    }
    too_big = {b: c for b, c in sizes.items() if c > max_bracket}
    if too_big:
        raise RuntimeError(
            f"exact_quantiles: bracket(s) exceed max_bracket="
            f"{max_bracket} distinct values: {too_big} — raise sample_rate"
        )
    w = (
        Window.partitionBy("_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grp.withColumn("_cum", F.sum("_c").over(w))
    cond = None
    for bi, off, _q, _t in wanted:
        c = (F.col("_b") == bi) & (F.col("_cum") >= off) & (
            F.col("_cum") - F.col("_c") < off
        )
        cond = c if cond is None else (cond | c)
    hit_rows = cum.filter(cond).select("_b", "v", "_c", "_cum").collect()
    answers: dict[tuple[int, int], object] = {}
    for r in hit_rows:
        for bi, off, q, t in wanted:
            if r["_b"] == bi and r["_cum"] >= off and r["_cum"] - r["_c"] < off:
                answers[(bi, off)] = r["v"]
    out = [(int(q), answers[(bi, off)], int(t)) for bi, off, q, t in wanted]
    return spark.createDataFrame(out, out_schema)
