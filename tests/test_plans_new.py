"""Plan-quality gates for the round-4 continuation operator families
(the .explain-driven contract: broadcast where a side is
fleet/vocabulary-sized, keyed windows never global, range-partitioned
two-phase sorts instead of single-reducer windows, equi-joins never
degenerating to cartesian products)."""

import contextlib
import io

from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_hrw_assign_broadcasts_fleet_no_smj(spark):
    from metal_history_knowledge_graph_spark.operators.shard import hrw_assign

    df = spark.createDataFrame(
        [(f"h{i}.com",) for i in range(50)], "host string"
    )
    p = plan_of(hrw_assign(df, "host", [f"c{i}" for i in range(8)]))
    # fleet side is broadcast (nested-loop on purpose: true cross join
    # against an 8-row dim), never a shuffled join
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p
    # the argmax is a partial-aggregated group-by, present twice
    assert p.count("HashAggregate") >= 2


def test_bitext_pairs_equi_join_no_cartesian(spark):
    from metal_history_knowledge_graph_spark.operators.bitext import (
        parallel_url_pairs,
    )

    df = spark.createDataFrame(
        [(f"http://a.com/en/{i}",) for i in range(20)]
        + [(f"http://a.com/de/{i}",) for i in range(20)],
        "url string",
    )
    p = plan_of(parallel_url_pairs(df))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_calibration_range_partitioned_no_global_window(spark):
    from metal_history_knowledge_graph_spark.operators.calibration import (
        calibration_bins,
    )

    df = spark.createDataFrame(
        [(i, i * 7 % 101, i % 2) for i in range(200)],
        "doc_id long, score long, label int",
    )
    out = calibration_bins(df, "score", "label", "doc_id", bins=10)
    p = plan_of(out)
    # the two-phase sort happens BEFORE the localCheckpoint (its
    # rangepartitioning exchange is pinned by the partition-invariance
    # test); the visible tail must be: broadcast partition-offset dim +
    # a bin-keyed partial agg — never a second global sort or SMJ
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p
    assert "hashpartitioning(bin" in p


def test_markov_window_keyed_by_user(spark):
    from metal_history_knowledge_graph_spark.operators.markov import (
        transition_matrix,
    )

    df = spark.createDataFrame(
        [(1, 1, 1, "a"), (1, 2, 2, "b")],
        "user_id long, ts long, event_id long, event_type string",
    )
    p = plan_of(transition_matrix(df))
    # lead() runs under a user-partitioned window, never an
    # all-rows-in-one-reducer empty partition spec
    assert "Window" in p and "partitionBy=[]" not in p.replace(" ", "")


def test_ndcg_discount_dim_broadcast(spark):
    from metal_history_knowledge_graph_spark.operators.search_quality import (
        ndcg_quality,
    )

    ranking = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], "query_id int, doc string, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, "a", 2)], "query_id int, doc string, gain int"
    )
    p = plan_of(ndcg_quality(ranking, qrels))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_winnow_probe_no_cartesian(spark):
    from metal_history_knowledge_graph_spark.operators.winnow import (
        winnow_fingerprints,
        winnow_probe,
    )

    docs = spark.createDataFrame(
        [(i, "some shared text body %d" % (i % 3)) for i in range(12)],
        "doc_id long, text string",
    )
    idx = winnow_fingerprints(docs.filter(F.col("doc_id") < 8), k=5, w=4)
    nfp = winnow_fingerprints(docs.filter(F.col("doc_id") >= 8), k=5, w=4)
    p = plan_of(winnow_probe(idx, nfp, max_df=10))
    assert "CartesianProduct" not in p
