"""One-sided CUSUM change-point detection over keyed time series —
the ONSET detector next to the level detectors already in the catalog
(operators/anomaly flags points that are outliers NOW; operators/
trends' burst scores rank windows; CUSUM answers "WHEN did this
host's fetch rate shift", accumulating small persistent drifts that
no single-point test sees — Page 1954, the standard process-control
formulation).

The textbook recurrence ``S_t = max(0, S_{t-1} + (x_t − k))`` looks
inherently sequential, but it has a closed form over prefix sums (the
max-drawdown identity)::

    S_t = P_t − min_{i ≤ t} P_i,      P_t = Σ_{j ≤ t} (x_j − k)

so the whole detector is TWO window functions per key — a running sum
and a running min — in exact BIGINT arithmetic (``drift`` k and
``threshold`` h are integers in the value's own units; scale your
values to integers first, the engine-wide fixed-point discipline).
A DuckDB window replay is therefore bit-exact (q_cusum).

Scale shape: one window PARTITIONED BY the series key, ordered by
time — every partition holds one key's bounded history (per-host
daily counts: thousands of rows, never corpus-sized), the same
contract as sessionization/funnel. No driver state, no iteration.

``alarm`` marks every tick with S_t > h; ``onset_ts`` (via
:func:`cusum_onsets`) reports the FIRST alarm per key — the number a
recrawl planner or incident report actually wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    drift: int,
    threshold: int,
) -> DataFrame:
    """Input rows + (cusum, alarm): the one-sided positive CUSUM
    statistic and its threshold flag, per key in time order. Ties on
    ``ts_col`` are broken by ``value_col`` then input order via a
    final ``row_number``-free composite ordering — supply unique
    timestamps per key for a total order (the fixture discipline)."""
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(value_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col(value_col).cast("long") - F.lit(int(drift))).over(w)
    df2 = df.withColumn("_p", p)
    # S_t = P_t − min(0, min_{i≤t} P_i): the empty-prefix baseline is
    # 0 (S_0 = 0), so the running min must include a virtual 0 floor.
    runmin = F.min("_p").over(w)
    s = F.col("_p") - F.least(F.lit(0).cast("long"), runmin)
    return (
        df2.withColumn("cusum", s.cast("long"))
        .withColumn("alarm", F.col("cusum") > threshold)
        .drop("_p")
    )


def cusum_onsets(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    drift: int,
    threshold: int,
) -> DataFrame:
    """(key, onset_ts, onset_cusum): the first alarm tick per key;
    keys that never alarm are absent. One min-struct partial agg over
    the scored rows — no second window."""
    scored = cusum_scores(df, key_col, ts_col, value_col, drift, threshold)
    return (
        scored.filter(F.col("alarm"))
        .groupBy(key_col)
        .agg(
            F.min(F.struct(F.col(ts_col), F.col("cusum"))).alias("_first")
        )
        .select(
            key_col,
            F.col(f"_first.{ts_col}").alias("onset_ts"),
            F.col("_first.cusum").alias("onset_cusum"),
        )
    )
