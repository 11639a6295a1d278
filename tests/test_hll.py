"""HyperLogLog (operators/hll.py): register/rho derivation pinned
against a pure-Python md5 reference, merge == build-on-union,
integer-core arithmetic checked by hand, and estimate accuracy
within the theoretical 1.04/√m band on three cardinalities."""

import hashlib
import math

from metal_history_knowledge_graph_spark.operators.hll import (
    HASH_BITS,
    hll_build,
    hll_estimate,
    hll_estimate_py,
    hll_integer_core,
    hll_merge,
    hll_sliding_distinct,
)


def _py_sketch(keys, p):
    """Reference sketch: same md5 prefix/15-hex-char derivation."""
    m = 1 << p
    rem_bits = HASH_BITS - p
    regs = {}
    for k in keys:
        h = int(hashlib.md5(f"hll|{k}".encode()).hexdigest()[:15], 16)
        reg, v = h % m, h // m
        rho = rem_bits + 1 if v == 0 else rem_bits + 1 - v.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_registers_match_python_reference(spark):
    keys = [f"user_{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["register"]: r["maxrho"]
        for r in hll_build(df, "k", p=8).collect()
    }
    assert got == _py_sketch(keys, 8)


def test_merge_equals_build_on_union(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "k string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(250, 750)], "k string"
    )
    merged = {
        (r["register"], r["maxrho"])
        for r in hll_merge(
            hll_build(a, "k", p=10), hll_build(b, "k", p=10)
        ).collect()
    }
    union = {
        (r["register"], r["maxrho"])
        for r in hll_build(a.unionByName(b), "k", p=10).collect()
    }
    assert merged == union


def test_integer_core_manual(spark):
    """One known key at p=4: core arithmetic checked cell by cell."""
    p, m = 4, 16
    rem = HASH_BITS - p
    df = spark.createDataFrame([("x",)], "k string")
    core = hll_integer_core(hll_build(df, "k", p=p), p=p).collect()[0]
    regs = _py_sketch(["x"], p)
    (reg, rho), = regs.items()
    assert core["n_present"] == 1 and core["v_zero"] == m - 1
    assert core["s_scaled"] == (m - 1) * (1 << (rem + 1)) + (
        1 << (rem + 1 - rho)
    )


def test_estimate_accuracy_and_python_pin(spark):
    """Estimates within 3·1.04/√m of truth at three cardinalities,
    and the Spark float path equals the Python formula."""
    p = 12
    tol = 3 * 1.04 / math.sqrt(1 << p)
    for n in (300, 5000, 40000):
        df = spark.createDataFrame(
            [(f"k{i % n}",) for i in range(n + 1000)], "k string"
        )
        core_df = hll_integer_core(hll_build(df, "k", p=p), p=p)
        core = core_df.collect()[0]
        est = hll_estimate(core_df, p=p).collect()[0]["estimate"]
        py = hll_estimate_py(
            core["n_present"], core["v_zero"], core["s_scaled"], p=p
        )
        assert abs(est - round(py, 2)) < 1e-6
        assert abs(est - n) / n < tol, (n, est)


def test_grouped_sketch(spark):
    """Per-group registers must equal per-group Python sketches."""
    rows = [("ev_a", f"u{i}") for i in range(400)] + [
        ("ev_b", f"u{i}") for i in range(150)
    ]
    df = spark.createDataFrame(rows, "g string, k string")
    got = {}
    for r in hll_build(df, "k", p=8, group_cols=("g",)).collect():
        got.setdefault(r["g"], {})[r["register"]] = r["maxrho"]
    assert got["ev_a"] == _py_sketch([f"u{i}" for i in range(400)], 8)
    assert got["ev_b"] == _py_sketch([f"u{i}" for i in range(150)], 8)


def test_sliding_windows_equal_direct_window_sketches(spark):
    """Each sliding-window core must equal the core of a sketch built
    DIRECTLY on that window's raw keys (the mergeability property the
    operator rests on), with gaps in the bucket sequence honored."""
    import random

    rng = random.Random(17)
    rows = [
        (rng.randrange(40), rng.choice([1, 2, 3, 5, 9]))  # day 4 absent
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "user long, day int")
    got = {
        r.day: (r.n_buckets, r.n_present, r.v_zero, r.s_scaled)
        for r in hll_sliding_distinct(
            df, "user", "day", window=3, p=6
        ).collect()
    }
    days = sorted({d for _, d in rows})
    assert set(got) == set(days)
    for end in days:
        in_win = [d for d in days if end - 3 < d <= end]
        keys = [u for u, d in rows if d in in_win]
        wdf = spark.createDataFrame([(k,) for k in keys], "user long")
        want = hll_integer_core(hll_build(wdf, "user", p=6), p=6).collect()[0]
        assert got[end] == (
            len(in_win), want.n_present, want.v_zero, want.s_scaled
        ), end


def test_build_plan_single_exchange_jvm_only(spark):
    """One shuffle (the register groupBy), zero Python — the sketch
    build must stay a narrow map + partial-agg at any scale."""
    ev = spark.createDataFrame([(1,)], "user_id long")
    from metal_history_knowledge_graph_spark.operators.hll import hll_build

    plan = (
        hll_build(ev, "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Python" not in plan
