"""Single-pass table profiling: per-column row/null/distinct counts and
min/max — the data-quality census a pipeline runs on every landed batch
(the Deequ/Great-Expectations-style profile, and the reference's
``verify counts`` step generalized from tables to columns).

Scale shape: ONE scan. All per-column aggregates ride in a single
``agg`` (count / count-nonnull / distinct / min / max per column), so
Spark computes the whole profile in one partial-agg pass whose output
is a single row — no per-column jobs, no shuffle of data rows, just
the one-row combine. The wide single row is then unpivoted driver-side
via ``stack`` into the (column, metric...) report shape.

Distinct counts: ``exact=False`` (default) uses HyperLogLog
(``approx_count_distinct``, rsd 5%) — the sketch is a regular
aggregate, so the whole profile stays one partial-agg pass with no
data shuffle (plan-gated in test_profile). ``exact=True`` uses true
``countDistinct``; note multiple exact distincts make Catalyst plan an
``Expand`` (the input is replicated once per distinct aggregate and
shuffled) — fine at small/gate scales, which is why the driver oracle
(`__spark_entry__.q_profile`) runs exact mode, but the sketch is the
100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType

PROFILE_SCHEMA = (
    "column string, n_rows long, n_null long, n_distinct long, "
    "min_value string, max_value string"
)


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = False
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null,
    n_distinct, min_value, max_value). min/max are rendered as strings
    so one report covers heterogeneous column types (nulls for types
    without an ordering, e.g. maps)."""
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    types = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))
    # internal aliases are index-based and the report name rides as an
    # escaped string literal, so arbitrary column names (spaces, dots,
    # quotes) cannot break the agg aliases or the stack expression
    aggs = [F.count(F.lit(1)).alias("__n")]
    for j, c in enumerate(cols):
        # backtick-quote so dots in a name are not parsed as nesting
        col = df["`{}`".format(c.replace("`", "``"))]
        aggs.append(F.count(col).alias(f"__nn_{j}"))
        if isinstance(types.get(c), MapType):
            # maps are unorderable and un-distinct-able: the profile
            # reports nulls for them instead of aborting the census
            nul = F.lit(None)
            aggs.append(nul.cast("long").alias(f"__nd_{j}"))
            aggs.append(nul.cast("string").alias(f"__min_{j}"))
            aggs.append(nul.cast("string").alias(f"__max_{j}"))
            continue
        aggs.append(
            (F.countDistinct(col) if exact
             else F.approx_count_distinct(col)).alias(f"__nd_{j}")
        )
        aggs.append(F.min(col).cast("string").alias(f"__min_{j}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{j}"))
    wide = df.agg(*aggs)
    # unpivot the single wide row: stack(n, 'col1', __nn_0, ...) —
    # pure expression work on one row. Escape backslashes then quotes:
    # the default SQL parser processes \-escapes inside literals.
    parts = ", ".join(
        "'{}', __nn_{j}, __nd_{j}, __min_{j}, __max_{j}".format(
            c.replace("\\", "\\\\").replace("'", "\\'"), j=j)
        for j, c in enumerate(cols)
    )
    return wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {parts}) as "
        "(column, __nn, n_distinct, min_value, max_value)",
    ).select(
        "column",
        F.col("__n").cast("long").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value", "max_value",
    )
