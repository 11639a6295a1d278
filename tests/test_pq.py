"""Product quantization (operators/pq.py): training determinism,
encode/train-final-pass identity, the ADC == dot(query,
reconstruction) algebraic identity, recall against exact cosine
top-k on clustered data, and plan gates (no Python, no shuffle in
encode/score)."""

import math
import random

import pytest

from metal_history_knowledge_graph_spark.operators.pq import (
    pq_encode,
    pq_lut,
    pq_reconstruct,
    pq_topk,
    pq_train,
)


def _clustered_vectors(n=120, d=16, n_clusters=6, seed=3):
    """Deterministic clustered corpus: cluster center + small noise —
    PQ should retrieve same-cluster vectors for a center query."""
    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1, 1) for _ in range(d)] for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        rows.append((i, [v + rng.uniform(-0.05, 0.05) for v in c]))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(df, m=4, ks=8, n_iters=2)
    return df, books, rows


def test_codebook_shape_and_determinism(spark, corpus):
    df, books, _ = corpus
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    assert all(len(c) == 4 for b in books for c in b)
    # Re-training under a different partitioning may reorder the
    # float partial sums (last-bit drift in the means) but must stay
    # the same codebook to 1e-9 — the init and tie rules are exact.
    again = pq_train(df.repartition(7), m=4, ks=8, n_iters=2)
    for s in range(4):
        for c in range(8):
            for a, b in zip(again[s][c], books[s][c]):
                assert abs(a - b) < 1e-9


def test_encode_codes_valid_and_deterministic(spark, corpus):
    df, books, _ = corpus
    codes = {r["vec_id"]: r["codes"] for r in pq_encode(df, books).collect()}
    assert len(codes) == 120
    assert all(len(cs) == 4 and all(0 <= c < 8 for c in cs)
               for cs in codes.values())
    codes2 = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(df.repartition(5), books).collect()
    }
    assert codes2 == codes


def test_adc_equals_dot_of_reconstruction(spark, corpus):
    """score(v) = Σ_s dot(q_s, c_s) == dot(q, concat(c_s)) — exact up
    to fold association (1e-9)."""
    df, books, rows = corpus
    query = rows[0][1]
    codes = pq_encode(df, books)
    scores = {
        r["vec_id"]: r["adc_score"]
        for r in pq_topk(codes, books, query, k=120).collect()
    }
    recon = {
        r["vec_id"]: r["approx_vec"]
        for r in pq_reconstruct(codes, books).collect()
    }
    qn = math.sqrt(sum(v * v for v in query))
    qu = [v / qn for v in query]
    for vid, vec in recon.items():
        want = sum(a * b for a, b in zip(qu, vec))
        assert abs(scores[vid] - round(want, 4)) <= 1e-4, vid


def test_recall_vs_exact_topk(spark, corpus):
    """Quantization collapses a tight cluster to near-identical codes,
    so within-cluster order is not preserved — the meaningful recall
    property is cluster-level: every ADC top-10 hit for a cluster-0
    query must BE a cluster-0 member (= the exact top-20), and the
    query vector itself must be retrieved (ties break to smallest
    id)."""
    from metal_history_knowledge_graph_spark.operators.simsearch import (
        cosine_topk,
    )

    df, books, rows = corpus
    query = rows[0][1]
    exact20 = {r["vec_id"] for r in cosine_topk(df, query, k=20).collect()}
    assert exact20 == {i for i in range(120) if i % 6 == 0}  # cluster 0
    codes = pq_encode(df, books)
    approx = {r["vec_id"] for r in pq_topk(codes, books, query, k=10).collect()}
    assert approx <= exact20, approx - exact20
    assert 0 in approx


def test_encode_plan_narrow_and_jvm_only(spark, corpus):
    df, books, _ = corpus
    plan = (
        pq_encode(df, books)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure narrow map


def test_train_raises_on_bad_dim_or_small_corpus(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=2, ks=1)
    with pytest.raises(ValueError, match="need >="):
        pq_train(df, m=3, ks=4)


def test_lut_matches_manual(corpus):
    _, books, rows = corpus
    query = rows[1][1]
    lut = pq_lut(books, query)
    qn = math.sqrt(sum(v * v for v in query))
    qu = [v / qn for v in query]
    assert abs(lut[2][5] - sum(a * b for a, b in zip(qu[8:12], books[2][5]))) < 1e-12


def test_ivfpq_score_identity_and_probe_subset(spark, corpus):
    """IVF-PQ: (a) every returned id belongs to a probed cluster;
    (b) adc_score == dot(q_unit, centroid_cluster + reconstructed
    residual) up to fold association — the q·c + q·r̂ identity."""
    from metal_history_knowledge_graph_spark.operators.pq import (
        ivfpq_build,
        ivfpq_topk,
        pq_reconstruct,
    )

    df, _, rows = corpus
    query = rows[0][1]
    centroids, books, enc = ivfpq_build(
        df, n_centroids=6, coarse_iters=2, m=4, ks=8, pq_iters=2
    )
    got = ivfpq_topk(enc, centroids, books, query, k=10, nprobe=2).collect()
    assert len(got) == 10
    qn = math.sqrt(sum(v * v for v in query))
    qu = [v / qn for v in query]
    base = [sum(a * b for a, b in zip(qu, c)) for c in centroids]
    ranked = sorted(range(6), key=lambda c: (-base[c], c))
    probed = set(ranked[:2])
    clusters = {r["vec_id"]: r["cluster"] for r in enc.collect()}
    recon = {
        r["vec_id"]: r["approx_vec"]
        for r in pq_reconstruct(enc, books).collect()
    }
    for r in got:
        cl = clusters[r["vec_id"]]
        assert cl in probed
        want = base[cl] + sum(a * b for a, b in zip(qu, recon[r["vec_id"]]))
        assert abs(r["adc_score"] - round(want, 4)) <= 1e-4


def test_ivfpq_cluster_recall(spark, corpus):
    """A cluster-0-center query: the ADC top-10 must all be cluster-0
    members (the nearest coarse cell dominates the base term), and
    the query vector itself must appear in the top-20 — residual
    quantization error may shuffle the within-cluster order but not
    push the query out of its own 20-member cluster."""
    from metal_history_knowledge_graph_spark.operators.pq import (
        ivfpq_build,
        ivfpq_topk,
    )

    df, _, rows = corpus
    query = rows[0][1]
    centroids, books, enc = ivfpq_build(
        df, n_centroids=6, coarse_iters=2, m=4, ks=8, pq_iters=2
    )
    cluster0 = {i for i in range(120) if i % 6 == 0}
    got10 = {
        r["vec_id"]
        for r in ivfpq_topk(enc, centroids, books, query, k=10, nprobe=2).collect()
    }
    assert len(got10) == 10 and got10 <= cluster0, got10 - cluster0
    got20 = {
        r["vec_id"]
        for r in ivfpq_topk(enc, centroids, books, query, k=20, nprobe=2).collect()
    }
    assert 0 in got20
