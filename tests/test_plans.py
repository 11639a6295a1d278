"""Physical-plan quality gates: the properties that make these plans
survive a 100× scale-up, pinned as assertions so a regression that
silently de-optimizes a plan fails CI.

* filters/column pruning reach the parquet scan (PushedFilters /
  ReadSchema)
* entity/edge per-type queries prune partitions (entity_type / pred
  partition columns)
* id-resolution joins are broadcast, never shuffled
* the chunk/extract stages are narrow (no Exchange before the UDF)
* aggregations have a map-side partial step (two HashAggregates)
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    from metal_history_knowledge_graph_spark.io import TableStore
    from metal_history_knowledge_graph_spark.plans.pipeline import run
    from metal_history_knowledge_graph_spark.sources.corpus import generate_pages

    store = TableStore(spark, str(tmp_path_factory.mktemp("pstore")))
    run(spark, generate_pages(spark, 30, seed=5), store, run_id="p")
    return store


def test_scan_pushdown_tpch(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1995-01-01")
        .select("l_returnflag", "l_quantity")
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: ReadSchema carries only the 3 referenced columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_partition_pruning_entities(spark, graph):
    from metal_history_knowledge_graph_spark.plans.queries import entity_view

    ents = graph.read("entities")
    plan = plan_of(entity_view(ents, "bands"))
    assert "PartitionFilters" in plan
    assert "entity_type" in plan.split("PartitionFilters")[1].splitlines()[0]


def test_partition_pruning_edges(spark, graph):
    edges = graph.read("edges").filter(F.col("pred") == "MEMBER_OF")
    plan = plan_of(edges)
    pf = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "pred" in pf and "MEMBER_OF" in pf


def test_id_resolution_is_broadcast(spark, graph):
    """The (big rels) ⋈ (small resolution map) joins — the famous-band
    hot-key joins — must be broadcast, never a shuffled merge join.
    (The later provenance-attach joins of two vocab-sized aggregates
    are left to AQE, which converts them at runtime.)"""
    from metal_history_knowledge_graph_spark.operators.extract import relationships_of
    from metal_history_knowledge_graph_spark.operators.triples import (
        normalize_predicates,
        resolve_triples,
    )

    rels = normalize_predicates(relationships_of(graph.read("extracted")))
    resolved = resolve_triples(rels, graph.read("resolution"))
    plan = plan_of(resolved)
    assert plan.count("BroadcastHashJoin") >= 2  # subj + obj resolution
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_chunk_stage_is_narrow(spark):
    from metal_history_knowledge_graph_spark.operators.chunk import chunk_pages
    from metal_history_knowledge_graph_spark.sources.corpus import generate_pages

    chunks = chunk_pages(generate_pages(spark, 10, seed=1))
    plan = plan_of(chunks)
    assert "Exchange" not in plan  # generation → chunking: zero shuffles


def test_aggregation_has_partial_step(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_topk_uses_take_ordered(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .orderBy(F.desc("o_totalprice"))
        .limit(5)
    )
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    """Two tables co-bucketed on the join key must join with zero
    shuffle (the bucketed scan's layout satisfies the join's required
    distribution) — the scale path for repeated large-to-large joins."""
    from pyspark.sql import functions as F

    from metal_history_knowledge_graph_spark.io import TableStore

    store = TableStore(spark, str(tmp_path_factory.mktemp("bstore")))
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("a")
    )
    right = spark.range(0, 10_000, 3).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("b")
    )
    store.write_bucketed(left, "left", ["k"], n_buckets=8, sort_cols=["k"])
    store.write_bucketed(right, "right", ["k"], n_buckets=8, sort_cols=["k"])

    bl, br = store.read_bucketed("left"), store.read_bucketed("right")
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(br, "k")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it computes the right thing
        expect = left.join(right, "k").count()
        assert joined.count() == expect
        # control: the same join on plain (non-bucketed) reads shuffles
        plain = left.join(right, "k")
        assert "Exchange" in plan_of(plain)
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pagination_topk_no_global_window(graph):
    """Scale-path pagination must compile to TakeOrderedAndProject —
    no Window over an unpartitioned ordering, no Exchange to a single
    partition carrying the full row set (VERDICT r01 weak #4)."""
    from metal_history_knowledge_graph_spark.plans import queries as Q

    entities = graph.read("entities")
    df = Q.bands_by_country_topk(entities, page=1, page_size=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan

    # same rows as the oracle-compatible window variant
    win = [r.canonical_name
           for r in Q.bands_by_country(entities, page=1, page_size=10).collect()]
    topk = [r.canonical_name for r in df.collect()]
    assert topk == win

    # page 2 agreement as well (offset path)
    win2 = [r.canonical_name
            for r in Q.bands_by_country(entities, page=2, page_size=5).collect()]
    topk2 = [r.canonical_name
             for r in Q.bands_by_country_topk(entities, page=2, page_size=5).collect()]
    assert topk2 == win2


def test_pagination_keyset(graph):
    from metal_history_knowledge_graph_spark.plans import queries as Q

    entities = graph.read("entities")
    p1 = [r.canonical_name for r in Q.bands_keyset_page(entities, page_size=5).collect()]
    assert p1 == sorted(p1)
    p2 = [r.canonical_name
          for r in Q.bands_keyset_page(entities, after_name=p1[-1], page_size=5).collect()]
    assert p2 and p2[0] > p1[-1]
    # keyset pages tile the window-paginated order exactly
    win = [r.canonical_name
           for r in Q.bands_by_country(entities, page=1, page_size=10).collect()]
    assert (p1 + p2) == win


def test_asof_join_single_exchange(spark):
    """asof_join must stay the single-shuffle union-and-carry-forward
    plan: exactly one Exchange subtree family on the session key
    feeding one Window — never a range-join (BroadcastNestedLoopJoin /
    CartesianProduct) blowup."""
    from metal_history_knowledge_graph_spark.operators.temporal import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    plan = plan_of(asof_join(left, right, "user_id", "ts", "event_id", ["value"]))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no join at all: union + window
    # exactly two hash exchanges: right-side (key, ts) dedup + the
    # carry-forward window's key partitioning; both keyed, never single
    assert plan.count("hashpartitioning") == 2, plan
    assert "SinglePartition" not in plan


def test_sessionize_windows_are_partitioned(spark):
    """Every window in the sessionize plan must be partitioned by the
    session key — an unpartitioned Window (Exchange SinglePartition)
    is the classic scale-killer."""
    from metal_history_knowledge_graph_spark.operators.temporal import sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = plan_of(sessionize(ev))
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_latest_snapshot_partial_agg(spark):
    """latest_snapshot must compile to a two-phase hash aggregation
    (map-side partial max(struct) before the shuffle) — the property
    that collapses hot urls early — and never a Window."""
    from metal_history_knowledge_graph_spark.operators.temporal import (
        latest_snapshot,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = plan_of(
        latest_snapshot(ev, "user_id", "ts", "event_id", ["event_type", "value"])
    )
    assert "Window" not in plan
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 2


def test_extracted_kind_partition_pruned(graph):
    """The extracted table is partitioned by row kind; the mention and
    relationship branches must each scan only their partition (the
    filter shows up as a PartitionFilters entry on kind, not a
    post-scan Filter over all rows)."""
    from metal_history_knowledge_graph_spark.operators.extract import (
        mentions_of, relationships_of,
    )

    for branch in (mentions_of, relationships_of):
        plan = plan_of(branch(graph.read("extracted")))
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters")[1].splitlines()[0]
        assert "kind" in pf


def test_mention_scale_aggs_stay_hash_based(graph):
    """The mention-scale aggregations (surface-form variants, triple
    first-occurrence dedup) must be HASH aggregations with a map-side
    partial step — never SortAggregate, which min-over-string/struct
    buffers silently force and which sorts every input partition of
    the mention stream by its grouping keys (see
    functions/plan_hints.py for the pin)."""
    from metal_history_knowledge_graph_spark.operators.canonicalize import (
        surface_forms,
    )
    from metal_history_knowledge_graph_spark.operators.extract import (
        mentions_of, relationships_of,
    )
    from metal_history_knowledge_graph_spark.operators.triples import (
        dedup_relationships, normalize_predicates,
    )

    extracted = graph.read("extracted")
    forms_plan = plan_of(surface_forms(mentions_of(extracted)))
    assert "SortAggregate" not in forms_plan
    # partial + final ObjectHashAggregate pair around one Exchange
    assert forms_plan.count("ObjectHashAggregate") >= 2
    assert "partial_min" in forms_plan

    dedup_plan = plan_of(
        dedup_relationships(normalize_predicates(relationships_of(extracted)))
    )
    assert "SortAggregate" not in dedup_plan
    assert dedup_plan.count("ObjectHashAggregate") >= 2
    assert "partial_min" in dedup_plan


def test_provenance_pair_scan_is_column_pruned(graph):
    """The provenance pair paths are second mention-scale passes; they
    must be CHEAP passes — only the key/url columns may reach the
    parquet scan, never the attr/context payload columns."""
    from metal_history_knowledge_graph_spark.operators.canonicalize import (
        entity_provenance,
    )
    from metal_history_knowledge_graph_spark.operators.extract import mentions_of

    plan = plan_of(
        entity_provenance(
            mentions_of(graph.read("extracted")), graph.read("resolution")
        )
    )
    read_schemas = [
        ln.split("ReadSchema:")[1]
        for ln in plan.splitlines()
        if "ReadSchema:" in ln and "extracted" not in ln.split("ReadSchema:")[0]
    ]
    # the extracted-table scan carries url + name/linked_name (+ the
    # order-key inputs Spark can't prune away) but never the wide
    # payload columns
    extracted_schema = [s for s in read_schemas if "url" in s]
    assert extracted_schema
    for s in extracted_schema:
        assert "rel_context" not in s and "description" not in s
