"""Embedding-model swap point (VERDICT r3 #7): the hashing-trick
embed (operators/embeddings.py) is SURVEY-sanctioned as the sandbox
stand-in, but every downstream ANN operator must accept vectors from
a REAL external model — any ``array<double>`` column, any dimension —
without code changes. These tests parametrize (dim, source): a
"model" column stands in for decoder output (deterministic pseudo-
vectors built JVM-side, the same column shape a 1024-d encoder UDF
would append) and drives cosine / LSH / IVF / PQ end-to-end.
"""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.simsearch import (
    cosine_topk,
    ivf_build,
    ivf_topk,
    lsh_build,
    lsh_topk_indexed,
)

N_DOCS = 120


def _model_vectors(spark, dim: int, vec_col: str):
    """Deterministic stand-in for an external embedding model: one
    array<double> column of the requested dimension, values a smooth
    function of (id, component) — swap-equivalent to a real encoder's
    output column."""
    return spark.range(N_DOCS).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.cos(F.col("id") * (j + F.lit(1.0)) * 0.37)
            + F.sin(j * 0.11),
        ).alias(vec_col),
    )


@pytest.mark.parametrize("dim,vec_col", [(16, "embedding"), (1024, "model_vec")])
def test_cosine_and_ivf_take_any_model_column(spark, dim, vec_col):
    """Brute-force cosine and IVF run unchanged on a swapped-in model
    column of any dim/name; full-probe IVF equals the exact result."""
    df = _model_vectors(spark, dim, vec_col).localCheckpoint(eager=True)
    query = [r for r in df.filter(F.col("vec_id") == 7).head()[vec_col]]

    exact = cosine_topk(df, query, k=5, vec_col=vec_col).collect()
    assert exact[0].vec_id == 7 and exact[0].cosine == pytest.approx(1.0)
    assert len(exact) == 5
    assert [r.cosine for r in exact] == sorted(
        (r.cosine for r in exact), reverse=True
    )

    centroids, assigned = ivf_build(df, n_centroids=8, vec_col=vec_col)
    assert all(len(c) == dim for c in centroids)
    full = ivf_topk(assigned, centroids, query, k=5, nprobe=8,
                    vec_col=vec_col).collect()
    assert [(r.vec_id, r.cosine) for r in full] == \
        [(r.vec_id, r.cosine) for r in exact]


@pytest.mark.parametrize("dim,vec_col", [(16, "embedding"), (1024, "model_vec")])
def test_lsh_and_pq_take_any_model_column(spark, dim, vec_col):
    """LSH (dim inferred from the column itself) and PQ (subspaces cut
    from whatever dim arrives) run unchanged on the swapped column."""
    from metal_history_knowledge_graph_spark.operators.pq import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    df = _model_vectors(spark, dim, vec_col).localCheckpoint(eager=True)
    query = [r for r in df.filter(F.col("vec_id") == 3).head()[vec_col]]

    index = lsh_build(df, n_planes=4, num_tables=4, vec_col=vec_col)
    hits = lsh_topk_indexed(index, query, k=5, num_probes=4, n_planes=4,
                            vec_col=vec_col).collect()
    # the query IS a database vector: it shares its own bucket in
    # every table, so self-retrieval is guaranteed
    assert hits and hits[0].vec_id == 3 and hits[0].cosine == pytest.approx(1.0)

    cb = pq_train(df, m=4, ks=8, vec_col=vec_col)
    assert len(cb) == 4 and len(cb[0][0]) == dim // 4
    codes = pq_encode(df, cb, vec_col=vec_col)
    top = pq_topk(codes, cb, query, k=5).collect()
    assert len(top) == 5
    ids = {r.vec_id for r in df.select("vec_id").collect()}
    assert all(r.vec_id in ids for r in top)
