"""Validation rules (reference entity_validation.py semantics),
embeddings + semantic/hybrid search."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators import embeddings as E
from metal_history_knowledge_graph_spark.operators import validate as V
from metal_history_knowledge_graph_spark.plans.pipeline import run
from metal_history_knowledge_graph_spark.sources.corpus import generate_pages


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    from metal_history_knowledge_graph_spark.io import TableStore

    store = TableStore(spark, str(tmp_path_factory.mktemp("vstore")))
    run(spark, generate_pages(spark, 50, seed=11), store, run_id="v")
    return store.read("entities").cache(), store.read("edges").cache()


def test_validation_clean_corpus(graph):
    ents, _ = graph
    issues = V.validate_entities(ents)
    errors = issues.filter(F.col("severity") == "error")
    # gazetteer facts are sane: no year-range or duplicate-name errors
    assert errors.filter(F.col("rule") != "missing_name").count() == 0


def test_validation_catches_bad_year(spark):
    bad = spark.createDataFrame(
        [("bands", 1, "Timeless", "timeless", "x",
          '{"formed_year": 1450, "description": "too old"}',
          ["Timeless"], ["timeless"], 1, 1, 0.5, 1, [])],
        "entity_type string, canonical_id long, canonical_name string, "
        "name_norm string, first_seen string, attrs_json string, "
        "variations array<string>, member_forms array<string>, "
        "n_mentions long, n_forms int, confidence double, n_sources long, "
        "source_urls array<string>",
    )
    issues = V.validate_entities(bad).collect()
    rules = {(r.rule, r.severity) for r in issues}
    assert ("year_out_of_range", "error") in rules


def test_quality_score_formula(spark):
    issues = spark.createDataFrame(
        [("a", "x", "error", "r1")] * 3 + [("a", "y", "warning", "r2")] * 4,
        "entity_type string, name string, severity string, rule string",
    )
    assert V.quality_score(issues) == 100 - 15 - 8
    empty = issues.filter(F.lit(False))
    assert V.quality_score(empty) == 100.0


def test_referential_integrity(graph):
    ents, edges = graph
    dangling = V.referential_integrity(ents, edges)
    # every album artist in the corpus is a gazetteer band → none dangle
    assert dangling.count() == 0


def test_graph_consistency(graph):
    ents, edges = graph
    bad = V.graph_consistency(ents, edges).filter(F.col("severity") == "error")
    assert bad.count() == 0


def test_graph_consistency_flags_circular_influence(spark, graph):
    """The reference's 'Circular influence relationships' zero-row
    check (query_pattern_tester.py:546): injecting a mutual
    INFLUENCED_BY pair must surface exactly one error row for it."""
    ents, edges = graph
    cyc = spark.createDataFrame(
        [(101, 202, "A", "B"), (202, 101, "B", "A")],
        "subj_id long, obj_id long, subj_name string, obj_name string",
    ).select(
        "subj_id", "obj_id", "subj_name", "obj_name",
        F.lit("INFLUENCED_BY").alias("pred"),
        F.lit("bands").alias("subj_type"), F.lit("bands").alias("obj_type"),
    )
    augmented = edges.unionByName(cyc, allowMissingColumns=True)
    hits = V.graph_consistency(ents, augmented).filter(
        F.col("rule") == "circular_influence"
    ).collect()
    assert len(hits) == 1 and hits[0]["severity"] == "error"
    # untouched graph stays clean
    assert V.graph_consistency(ents, edges).filter(
        F.col("rule") == "circular_influence"
    ).count() == 0


def test_embeddings_deterministic_and_normalized(spark, graph):
    ents, _ = graph
    vecs = E.embed_entities(ents, dim=32)
    row = vecs.limit(1).collect()[0]
    assert len(row.embedding) == 32
    norm = sum(v * v for v in row.embedding) ** 0.5
    assert abs(norm - 1.0) < 1e-9 or norm == 0.0
    again = E.embed_entities(ents, dim=32).filter(
        F.col("canonical_id") == row.canonical_id
    ).collect()[0]
    assert list(again.embedding) == list(row.embedding)


def test_semantic_search_finds_exact_entity(spark, graph):
    ents, _ = graph
    vecs = E.embed_entities(ents, dim=64).cache()
    sab = ents.filter(
        (F.col("entity_type") == "bands") & (F.col("name_norm") == "black sabbath")
    ).collect()
    if not sab:
        pytest.skip("Sabbath not sampled into this corpus")
    target = sab[0]
    target_text = vecs.filter(F.col("canonical_id") == target.canonical_id).head().embed_text
    hits = E.semantic_search(spark, vecs, target_text, k=3).collect()
    assert hits[0].canonical_id == target.canonical_id


def test_hybrid_search_keyword_boost(spark, graph):
    ents, _ = graph
    vecs = E.embed_entities(ents, dim=64)
    out = E.hybrid_search(spark, ents, vecs, "sabbath", k=5).collect()
    assert out
    names = [r.canonical_name.lower() for r in out]
    assert any("sabbath" in n for n in names)
    scores = [r.final_score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_orphan_nodes(spark):
    from metal_history_knowledge_graph_spark.operators.validate import orphan_nodes

    ents = spark.createDataFrame(
        [("bands", "A", 1), ("bands", "B", 2), ("people", "C", 3), ("genres", "D", 4)],
        "entity_type string, canonical_name string, canonical_id long",
    )
    edges = spark.createDataFrame(
        [("MEMBER_OF", 3, 1)], "pred string, subj_id long, obj_id long"
    )
    got = sorted(
        (r.entity_type, r.canonical_name)
        for r in orphan_nodes(ents, edges).collect()
    )
    assert got == [("bands", "B"), ("genres", "D")]
