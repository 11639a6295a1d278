"""Quality monitors (reference scripts/monitoring/quality_monitor.py)."""

import pytest

from metal_history_knowledge_graph_spark.operators import monitor as M
from metal_history_knowledge_graph_spark.plans.pipeline import run
from metal_history_knowledge_graph_spark.sources.corpus import (
    generate_pages,
    generate_truth,
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from metal_history_knowledge_graph_spark.io import TableStore

    store = TableStore(spark, str(tmp_path_factory.mktemp("mstore")))
    run(spark, generate_pages(spark, 40, seed=13), store, run_id="m",
        pair_strategy="lsh")
    return store


def test_extraction_monitor_green_and_alerting(spark, built):
    truth = generate_truth(spark, 40, seed=13)
    entities, edges = built.read("entities"), built.read("edges")
    prf, alerts = M.monitor_extraction_quality(edges, truth, entities)
    assert prf["f1"] >= 0.95
    assert alerts == []
    # threshold breach path: impossible bar -> alert fires
    _, alerts = M.monitor_extraction_quality(
        edges, truth, entities,
        {**M.DEFAULT_THRESHOLDS, "extraction_f1_min": 1.1},
    )
    assert len(alerts) == 1 and "F1 low" in alerts[0]


def test_search_latency_monitor(spark, built):
    from metal_history_knowledge_graph_spark.operators.embeddings import (
        embed_entities,
    )

    entities = built.read("entities")
    metrics, alerts = M.monitor_search_latency(
        spark, entities, embed_entities(entities),
        thresholds={**M.DEFAULT_THRESHOLDS, "search_latency_max_ms": 1e9},
    )
    assert metrics["search_latency_mean_ms"] > 0
    assert metrics["error_rate"] == 0.0
    assert alerts == []
    # Spark overhead >> 0.001 ms -> latency alert fires
    _, alerts = M.monitor_search_latency(
        spark, entities, embed_entities(entities),
        thresholds={**M.DEFAULT_THRESHOLDS, "search_latency_max_ms": 0.001},
    )
    assert alerts and "latency high" in alerts[0]


def test_run_all_monitors_appends_history(spark, built):
    truth = generate_truth(spark, 40, seed=13)
    loose = {**M.DEFAULT_THRESHOLDS, "search_latency_max_ms": 1e9}
    row, alerts = M.run_all_monitors(spark, built, truth, loose)
    assert built.exists(M.HISTORY_TABLE)
    n1 = built.read(M.HISTORY_TABLE).count()
    assert n1 >= 1
    # second run computes growth vs the first snapshot (0% -> stall alert)
    _, alerts2 = M.run_all_monitors(spark, built, truth, loose)
    assert built.read(M.HISTORY_TABLE).count() == n1 + 1
    assert any("growth stalled" in a for a in alerts2)
