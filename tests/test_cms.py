"""Count-min sketch (operators/cms.py): overcount-only invariant,
exactness at collision-free width, weighted build ≡ raw build,
linear-merge property, partitioning invariance, JVM-only plan."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.cms import (
    cms_build,
    cms_build_weighted,
    cms_estimate,
    cms_merge,
)


@pytest.fixture(scope="module")
def stream(spark):
    # 30 distinct keys, key_i appears i+1 times (deterministic skew)
    rows = [(f"k{i:02d}",) for i in range(30) for _ in range(i + 1)]
    return spark.createDataFrame(rows, ["key"]).cache()


def _exact(stream):
    return {
        r.key: r.n
        for r in stream.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_cms_never_undercounts(stream):
    sketch = cms_build(stream, "key", d=3, w=16)  # tight → collisions
    exact = _exact(stream)
    probe = stream.select("key").distinct()
    est = {
        r.key: r.est_count
        for r in cms_estimate(probe, sketch, "key", d=3, w=16).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)


def test_cms_exact_when_wide(stream):
    sketch = cms_build(stream, "key", d=5, w=1 << 16)
    exact = _exact(stream)
    probe = stream.select("key").distinct()
    est = {
        r.key: r.est_count
        for r in cms_estimate(probe, sketch, "key", d=5, w=1 << 16).collect()
    }
    assert est == exact


def test_cms_absent_key_estimates_zero_when_wide(spark, stream):
    sketch = cms_build(stream, "key", d=5, w=1 << 16)
    probe = spark.createDataFrame([("never_seen",)], ["key"])
    [row] = cms_estimate(probe, sketch, "key", d=5, w=1 << 16).collect()
    assert row.est_count == 0


def test_cms_weighted_equals_raw(stream):
    raw = cms_build(stream, "key", d=4, w=32)
    counts = stream.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    weighted = cms_build_weighted(counts, "key", "n", d=4, w=32)
    assert {tuple(r) for r in raw.collect()} == {
        tuple(r) for r in weighted.collect()
    }


def test_cms_merge_is_linear(stream):
    half_a = stream.filter(F.col("key") < "k15")
    half_b = stream.filter(F.col("key") >= "k15")
    merged = cms_merge(
        cms_build(half_a, "key", d=4, w=32),
        cms_build(half_b, "key", d=4, w=32),
    )
    whole = cms_build(stream, "key", d=4, w=32)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_cms_partitioning_invariant(stream):
    a = cms_build(stream, "key", d=3, w=16)
    b = cms_build(stream.repartition(11), "key", d=3, w=16)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_cms_streaming_incremental_merge(spark, tmp_path, stream):
    """CMS maintained over a file stream via foreachBatch + cms_merge
    equals the batch sketch over the union — the linear-sketch
    property is what makes the operator streaming-native (per-batch
    build, cell-wise merge, no reprocessing of history)."""
    src = str(tmp_path / "cms_stream")
    cp = str(tmp_path / "cms_cp")
    half_a = stream.filter(F.col("key") < "k15")
    half_b = stream.filter(F.col("key") >= "k15")
    half_a.write.mode("append").parquet(src)

    state = {"sketch": None}

    def sink(batch_df, _bid):
        s = cms_build(batch_df, "key", d=4, w=32)
        state["sketch"] = (
            s if state["sketch"] is None
            else cms_merge(state["sketch"], s)
        )
        # materialize now: the next merge must not re-read this batch
        state["sketch"] = state["sketch"].localCheckpoint(eager=True)

    def run():
        q = (
            spark.readStream.schema("key string").parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()
    half_b.write.mode("append").parquet(src)
    run()

    whole = cms_build(stream, "key", d=4, w=32)
    assert {tuple(r) for r in state["sketch"].collect()} == {
        tuple(r) for r in whole.collect()
    }


def test_cms_plan_jvm_side(stream):
    sketch = cms_build(stream, "key", d=3, w=16)
    plan = (
        cms_estimate(stream.select("key").distinct(), sketch, "key", d=3, w=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
