"""Single-pass table profiler (operators/profile.py). Driver-scale
value parity is q_profile in test_oracle_parity; these pin null
accounting, exact-vs-approx mode, and the one-scan plan shape."""

from __future__ import annotations

from metal_history_knowledge_graph_spark.operators.profile import profile_table


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "b", 5.0), (4, None, 2.5)],
        "id long, s string, v double",
    )


def test_profile_exact_metrics(spark):
    rows = {r["column"]: r for r in profile_table(_df(spark), exact=True).collect()}
    assert set(rows) == {"id", "s", "v"}
    assert (rows["id"]["n_rows"], rows["id"]["n_null"], rows["id"]["n_distinct"]) == (4, 0, 4)
    assert (rows["id"]["min_value"], rows["id"]["max_value"]) == ("1", "4")
    assert (rows["s"]["n_null"], rows["s"]["n_distinct"]) == (1, 2)
    assert (rows["s"]["min_value"], rows["s"]["max_value"]) == ("a", "b")
    assert (rows["v"]["n_null"], rows["v"]["n_distinct"]) == (1, 2)
    assert rows["v"]["min_value"] == "2.5"


def test_profile_approx_mode_and_column_subset(spark):
    rows = {r["column"]: r
            for r in profile_table(_df(spark), columns=["s"]).collect()}
    assert set(rows) == {"s"}
    # HLL is exact at tiny cardinalities
    assert rows["s"]["n_distinct"] == 2


def test_profile_is_one_scan(spark):
    plan = profile_table(_df(spark))._jdf.queryExecution().executedPlan().toString()
    # a single aggregation pass: every Exchange is the one-row combine
    # (SinglePartition), never a hash repartition of the data
    assert "hashpartitioning" not in plan
    assert plan.count("LocalTableScan") <= 1 or plan.count("Scan") <= 1


def test_profile_exotic_column_names(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)]).toDF("a b", "it's.weird")
    rows = {r["column"]: r for r in profile_table(df, exact=True).collect()}
    assert set(rows) == {"a b", "it's.weird"}
    assert rows["it's.weird"]["n_null"] == 1
    assert rows["a b"]["n_distinct"] == 2
