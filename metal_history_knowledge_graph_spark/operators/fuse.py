"""Rank fusion for hybrid retrieval — combine keyword (BM25) and
vector (cosine ANN) candidate lists without score calibration.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009):
``rrf(d) = Σ_lists w_l / (c + rank_l(d))`` — rank-based, so wildly
different score scales (BM25 vs cosine) fuse without normalization,
and the result is exactly replayable in SQL (integer ranks; the
per-list reciprocal is one IEEE division, the fuse a commutative sum
of ≤ n_lists doubles).

Scale note: fusion operates on *candidate lists* (top-k per retriever,
k ≪ corpus), so the global rank window and the fuse aggregation are
k-sized by construction — the corpus-scale work lives in the
retrievers (bm25_topk's postings prune, simsearch's LSH/IVF probes),
not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_rank(
    df: DataFrame,
    score_col: str,
    id_col: str,
    ascending: bool = False,
) -> DataFrame:
    """1-based dense ordering rank (row_number over score then id —
    deterministic under ties). Input is a k-sized candidate list; the
    single-partition window is bounded by k, not the corpus."""
    order = [
        F.asc(score_col) if ascending else F.desc(score_col),
        F.asc(id_col),
    ]
    return df.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
    weights: list[float] | None = None,
) -> DataFrame:
    """Fuse candidate lists, each carrying ``(id_col, rank)``.

    Returns top-``k`` rows of ``(id_col, rrf_score, n_lists)`` —
    ``rrf_score`` rounded to 6 decimals BEFORE ordering (``id_col``
    tie-break), ``n_lists`` = how many input lists contained the id
    (the "found by both" signal the hybrid merge boosts on).
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if weights is None:
        weights = [1.0] * len(ranked)
    if len(weights) != len(ranked):
        raise ValueError("one weight per ranked list")
    parts = [
        df.select(
            F.col(id_col),
            (F.lit(float(w)) / (F.lit(c) + F.col("rank"))).alias("_part"),
        )
        for df, w in zip(ranked, weights)
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy(id_col)
        .agg(
            F.round(F.sum("_part"), 6).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )
