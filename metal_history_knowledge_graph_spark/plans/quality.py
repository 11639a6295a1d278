"""Quality measurement: triple precision/recall vs the corpus oracle.

The north rule's gate is triple P/R ≥ 0.95 vs reference semantics. The
synthetic corpus (sources/corpus.py) records every triple its sentences
imply, in canonical gazetteer names; the pipeline may canonicalize an
entity under any of its observed variations (the reference names groups
after the first-seen surface form, ``extraction_pipeline.py:100-107``),
so matching goes through each entity's variation set:

an emitted edge matches a truth triple iff predicates are equal and the
truth's subject/object names are among the subject/object entities'
variations (case-insensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _variation_map(entities: DataFrame, side: str) -> DataFrame:
    return entities.select(
        F.col("canonical_id").alias(f"{side}_id"),
        F.explode(
            F.array_union(
                F.col("variations"), F.array(F.col("canonical_name"))
            )
        ).alias(f"{side}_var"),
    ).withColumn(f"{side}_var", F.lower(F.trim(f"{side}_var"))).distinct()


def triple_matches(edges: DataFrame, truth: DataFrame, entities: DataFrame) -> DataFrame:
    """Edge↔truth match pairs: (edge_key, truth columns)."""
    subj_vars = _variation_map(entities, "subj")
    obj_vars = _variation_map(entities, "obj")
    t = truth.select(
        F.col("pred").alias("t_pred"),
        F.lower(F.trim("subj_name")).alias("t_subj"),
        F.lower(F.trim("obj_name")).alias("t_obj"),
    ).distinct()
    e = (
        edges.select("edge_key", "pred", "subj_id", "obj_id")
        .join(subj_vars, "subj_id")
        .join(obj_vars, "obj_id")
    )
    return e.join(
        t,
        (e.pred == t.t_pred) & (e.subj_var == t.t_subj) & (e.obj_var == t.t_obj),
    )


def triple_prf(edges: DataFrame, truth: DataFrame, entities: DataFrame) -> dict[str, float]:
    """Precision / recall / F1 of emitted triples vs the oracle."""
    matches = triple_matches(edges, truth, entities)
    n_edges = edges.select("edge_key").distinct().count()
    n_truth = (
        truth.select(F.col("pred"), F.lower(F.trim("subj_name")), F.lower(F.trim("obj_name")))
        .distinct()
        .count()
    )
    matched_edges = matches.select("edge_key").distinct().count()
    matched_truth = matches.select("t_pred", "t_subj", "t_obj").distinct().count()
    precision = matched_edges / n_edges if n_edges else 0.0
    recall = matched_truth / n_truth if n_truth else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return dict(
        precision=precision, recall=recall, f1=f1,
        n_edges=n_edges, n_truth=n_truth,
        matched_edges=matched_edges, matched_truth=matched_truth,
    )
