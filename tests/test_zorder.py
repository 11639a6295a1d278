"""Z-order layout (operators/zorder.py): Morton-code math pinned
against a pure-Python interleave, the locality property — per-file
footer ranges shrink on BOTH columns vs a single-key sort — measured
from real parquet metadata, and snapshot-pinned normalization for
appended batches."""

import pytest

from metal_history_knowledge_graph_spark.operators.zorder import (
    file_column_ranges,
    with_zorder,
    write_zordered,
    zorder_minmax,
)


def _py_z(x, y, lox, hix, loy, hiy, bits=16):
    top = (1 << bits) - 1
    nx = (x - lox) * top // (hix - lox) if hix > lox else 0
    ny = (y - loy) * top // (hiy - loy) if hiy > loy else 0
    z = 0
    for j in range(bits):
        z += ((nx >> j) & 1) << (2 * j)
        z += ((ny >> j) & 1) << (2 * j + 1)
    return z


GRID = [(i, x, y) for i, (x, y) in enumerate(
    (a * 7 % 64, a * 13 % 64) for a in range(1024)
)]


def test_zvalue_matches_python(spark):
    df = spark.createDataFrame(GRID, "id long, x long, y long")
    got = {r["id"]: r["zval"] for r in with_zorder(df, ["x", "y"]).collect()}
    mm = zorder_minmax(df, ["x", "y"])
    (lox, hix), (loy, hiy) = mm["x"], mm["y"]
    for i, x, y in GRID:
        assert got[i] == _py_z(x, y, lox, hix, loy, hiy), (i, x, y)


def test_locality_both_columns(spark, tmp_path):
    """8 z-ordered files: average per-file footer range must shrink
    well below the global range on BOTH x and y — a single-key sort
    by x leaves y's per-file ranges at ~the global span."""
    df = spark.createDataFrame(GRID, "id long, x long, y long")
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["x", "y"], n_files=8)
    # control: plain sort by x only
    xpath = str(tmp_path / "x")
    (
        df.repartitionByRange(8, "x").sortWithinPartitions("x")
        .write.parquet(xpath)
    )

    def avg_span(path, col_idx):
        rng = file_column_ranges(path, col_idx)
        assert len(rng) >= 6
        return sum(hi - lo for lo, hi in rng) / len(rng)

    # schema order: id, x, y -> x is col 1, y col 2
    assert avg_span(zpath, 1) < 0.45 * 63   # x local in z layout
    assert avg_span(zpath, 2) < 0.45 * 63   # y ALSO local in z layout
    assert avg_span(xpath, 1) < 0.30 * 63   # x very local in x sort
    assert avg_span(xpath, 2) > 0.80 * 63   # but y unpruned — the gap
    # content unchanged
    assert (
        spark.read.parquet(zpath).selectExpr("sum(x)", "sum(y)").collect()
        == df.selectExpr("sum(x)", "sum(y)").collect()
    )


def test_pinned_minmax_for_appends(spark):
    """Passing a snapshot's minmax keeps new batches on the SAME
    curve: z-values of overlapping keys are identical."""
    df = spark.createDataFrame(GRID, "id long, x long, y long")
    mm = zorder_minmax(df, ["x", "y"])
    batch = spark.createDataFrame(GRID[:50], "id long, x long, y long")
    a = {r["id"]: r["zval"]
         for r in with_zorder(df, ["x", "y"]).collect()}
    b = {r["id"]: r["zval"]
         for r in with_zorder(batch, ["x", "y"], minmax=mm).collect()}
    assert all(a[i] == b[i] for i in b)


def test_too_many_bits_raises(spark):
    df = spark.createDataFrame([(1, 1, 1)], "a long, b long, c long")
    with pytest.raises(ValueError, match="exceeds BIGINT"):
        with_zorder(df, ["a", "b", "c"], bits=21)


def test_pinned_minmax_out_of_range_clamps(spark):
    """Appends OUTSIDE the pinned snapshot range clamp to the curve's
    edges — above-hi rows get the MAX z (never alias next to the
    oldest data by dropped high bits), below-lo rows the MIN."""
    df = spark.createDataFrame(GRID, "id long, x long, y long")
    mm = zorder_minmax(df, ["x", "y"])
    outside = spark.createDataFrame(
        [(9001, 1000, 1000), (9002, -50, -50), (9003, 63, 63)],
        "id long, x long, y long",
    )
    z = {r["id"]: r["zval"]
         for r in with_zorder(outside, ["x", "y"], minmax=mm).collect()}
    top_z = (1 << 32) - 1  # all 32 interleaved bits set
    assert z[9001] == top_z       # clamped to (65535, 65535)
    assert z[9002] == 0           # clamped to (0, 0)
    assert 0 < z[9003] <= top_z   # in-range max corner unaffected
