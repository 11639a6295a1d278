"""AMS sketches: sign/sketch determinism vs a pure-Python replay,
estimator quality on a skewed corpus, and shard mergeability."""

import hashlib
import math

from metal_history_knowledge_graph_spark.operators.ams import (
    ams_sketch,
    f2_estimate,
    join_size_estimate,
)


def _sign(seed, v):
    nib = hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[0]
    return 1 if nib in "13579bdf" else -1


def _py_sketch(vals, k=9):
    return {j: sum(_sign(j, v) for v in vals) for j in range(k)}


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


VALS = [f"k{i % 7}" for i in range(50)] + ["hot"] * 30


def test_sketch_matches_python(spark):
    got = {r["j"]: r["z"] for r in ams_sketch(_df(spark, VALS), "v").collect()}
    assert got == _py_sketch(VALS)


def test_f2_report(spark):
    row = f2_estimate(_df(spark, VALS), "v").collect()[0]
    # exact F2: 7 keys with f in {8,7}, plus hot=30
    fs = {}
    for v in VALS:
        fs[v] = fs.get(v, 0) + 1
    exact = sum(f * f for f in fs.values())
    assert row["f2_exact"] == exact
    zs = _py_sketch(VALS)
    zsq = sorted(z * z for z in zs.values())
    assert row["f2_est"] == zsq[math.ceil(9 / 2) - 1]
    assert row["err_ppm"] == abs(row["f2_est"] - exact) * 10**6 // exact
    # median-of-9 on this skew should land within ~3x
    assert row["f2_est"] < 3 * exact and 3 * row["f2_est"] > exact


def test_join_size_report(spark):
    a = _df(spark, [f"k{i % 5}" for i in range(40)])
    b = _df(spark, [f"k{i % 8}" for i in range(24)])
    row = join_size_estimate(a, "v", b, "v").collect()[0]
    # exact: keys k0-k4 on both sides: f_a = 8, f_b = 3 each -> 5*24
    assert row["join_exact"] == 120
    za = _py_sketch([f"k{i % 5}" for i in range(40)])
    zb = _py_sketch([f"k{i % 8}" for i in range(24)])
    prods = sorted(za[j] * zb[j] for j in range(9))
    assert row["join_est"] == prods[4]


def test_shard_merge_is_addition(spark):
    half1, half2 = VALS[:40], VALS[40:]
    s1 = {r["j"]: r["z"] for r in ams_sketch(_df(spark, half1), "v").collect()}
    s2 = {r["j"]: r["z"] for r in ams_sketch(_df(spark, half2), "v").collect()}
    full = {r["j"]: r["z"] for r in ams_sketch(_df(spark, VALS), "v").collect()}
    assert {j: s1[j] + s2[j] for j in s1} == full
