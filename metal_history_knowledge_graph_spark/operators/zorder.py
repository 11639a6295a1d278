"""Z-order (Morton) data layout — multi-column pruning for lakehouse
tables (Delta's OPTIMIZE ZORDER BY, Iceberg's sort-order zorder()).

``io.TableStore.compact(sort_cols=...)`` gives single-key layouts:
files cover disjoint ranges of ONE column, so min/max footer stats
prune lookups on that column only. A 100 TB fact table queried by
BOTH user_id and ts needs locality in both: Z-order interleaves the
bits of the (range-normalized) key columns so rows close in the
Morton curve are close in EVERY key dimension — each of N files then
covers ~N^(-1/d) of each dimension's range, and parquet min/max
stats prune scans filtered on ANY of the keys (not just the first).

All arithmetic is BIGINT (min/max normalization by integer multiply/
divide, bit interleave unrolled into literal shift/mask terms), so
the z-value is bit-identical on any engine — q_zorder replays it in
DuckDB via the same unrolled expression; the layout property
(per-file range shrink on BOTH columns, read from parquet footer
stats) is pinned in test_zorder with the same pyarrow harness as the
sorted-compaction test.

Scale shape: one tiny min/max aggregate (d×2 values, inlined as
literals), a narrow z-value projection, and ONE repartitionByRange
on z — the same shuffle a plain sorted rewrite costs.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(norms: list[Column], bits: int) -> Column:
    """Morton code: bit j of column i lands at position j·d + i —
    unrolled into d·bits literal shift/mask terms (each a handful of
    codegen'd integer ops; the normalization sub-expressions are
    plain arithmetic, cheap to repeat)."""
    d = len(norms)
    z = F.lit(0).cast("long")
    for i, n in enumerate(norms):
        for j in range(bits):
            bit = F.shiftright(n, j).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, j * d + i)
    return z


def zorder_minmax(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """One d×2-value aggregate: {col: (lo, hi)} as Python ints."""
    row = df.agg(
        *[F.min(c).cast("long").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    return {c: (int(row[f"lo_{c}"]), int(row[f"hi_{c}"])) for c in cols}


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zval",
    minmax: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Add the Morton code of ``cols`` (integer-valued, non-null) as
    ``out_col``. ``minmax`` may be passed to pin the normalization
    (e.g. from a previous snapshot, so appended batches land on the
    same curve); otherwise one aggregate computes it."""
    if len(cols) * bits > 62:
        raise ValueError(
            f"zorder: {len(cols)} cols x {bits} bits exceeds BIGINT"
        )
    mm = minmax or zorder_minmax(df, cols)
    norms = []
    for c in cols:
        lo, hi = mm[c]
        span = hi - lo
        if span <= 0:
            norms.append(F.lit(0).cast("long"))
        else:
            top = (1 << bits) - 1
            # clamp to [0, top]: with a PINNED minmax an appended row
            # outside the snapshot range would otherwise overflow the
            # bit budget — the high bit is silently dropped by the
            # interleave (aliasing new data next to the oldest) and a
            # negative norm sign-extends to garbage. Clamped rows land
            # at the curve's edge, which is the right place for
            # out-of-range appends.
            norms.append(
                F.expr(
                    f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST({top} AS BIGINT), "
                    f"CAST((CAST({c} AS BIGINT) - {lo}) * {top} "
                    f"DIV {span} AS BIGINT)))"
                )
            )
    return df.withColumn(out_col, _interleave(norms, bits))


def zorder_sql(
    cols: list[str], mm: dict[str, tuple[int, int]], bits: int = 16
) -> str:
    """The SAME unrolled z-value as ANSI SQL (DuckDB `>>`/`&`/`<<`,
    `//` floor division) — the oracle-side twin of ``with_zorder``."""
    d = len(cols)
    terms = []
    for i, c in enumerate(cols):
        lo, hi = mm[c]
        span = hi - lo
        if span <= 0:
            continue
        top = (1 << bits) - 1
        norm = (
            f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST({top} AS BIGINT), "
            f"((CAST({c} AS BIGINT) - ({lo})) * {top} // {span})))"
        )
        for j in range(bits):
            terms.append(f"((({norm} >> {j}) & 1) << {j * d + i})")
    return "(" + " + ".join(terms) + ")" if terms else "0"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files range-partitioned
    and sorted by the Morton code — the OPTIMIZE ZORDER analogue.
    Each output file covers a compact curve segment ⇒ narrow min/max
    footer ranges in EVERY zorder column."""
    z = with_zorder(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, col_index: int) -> list[tuple]:
    """(min, max) of one column per parquet file — footer stats only,
    the pruning surface a scan actually uses (pyarrow metadata; test
    harness + monitors, not a data read)."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_index).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out
