"""Retrieval-quality benchmark: mean precision@k / recall@k / MRR@k
over a labeled query set.

Re-expresses the reference's search-quality benchmark
(``scripts/search/benchmark_search.py:97-148`` — ``benchmark_quality``:
per-query precision = relevant-found / returned, recall =
relevant-found / expected, reciprocal rank of the FIRST relevant hit,
then plain means) Spark-first:

* rankings for ALL queries come from ONE ``batch_topk`` pass
  (broadcast query set, window rank) instead of the reference's
  per-query search loop;
* the three metrics are one aggregation over the (ranking ⟕ labels)
  join plus one vocabulary-sized mean — no driver iteration, so the
  labeled set can itself be large.

``q_search_quality`` in ``__spark_entry__`` replays the identical
arithmetic in DuckDB end-to-end (clone-injected labels over the
embeddings table), and ``monitor_search_quality`` appends the metrics
to the ``monitor_history`` table next to the latency probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranking_quality(
    ranking: DataFrame,
    labels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval metrics from a ranking table.

    ``ranking``: (query_col, id_col, rank_col) with 1-based ranks —
    e.g. ``simsearch.batch_topk`` output. ``labels``: (query_col,
    id_col) relevant pairs, the ground truth. Returns one row per
    LABELED query: ``n_returned``, ``n_relevant``, ``n_hits``,
    ``precision`` (hits / returned, 0 when the engine returned
    nothing), ``recall`` (hits / relevant), ``rr`` (1/rank of the
    first relevant hit in the top-k, else 0.0 — the reference's
    for/else loop, benchmark_search.py:131-139)."""
    topk = ranking.filter(F.col(rank_col) <= k).select(
        query_col, id_col, rank_col
    )
    lab = labels.select(query_col, id_col).distinct()
    n_rel = lab.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_relevant"))
    hits = topk.join(lab.withColumn("_hit", F.lit(1)), [query_col, id_col], "left")
    per_q = hits.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_returned"),
        F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"),
        F.min(F.when(F.col("_hit") == 1, F.col(rank_col))).alias("_first_rank"),
    )
    # labeled queries the engine returned nothing for still score 0
    return (
        n_rel.join(per_q, query_col, "left")
        .select(
            query_col,
            F.coalesce("n_returned", F.lit(0)).cast("long").alias("n_returned"),
            F.col("n_relevant").cast("long").alias("n_relevant"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.when(
                F.coalesce("n_returned", F.lit(0)) > 0,
                F.coalesce("n_hits", F.lit(0)) / F.col("n_returned"),
            ).otherwise(F.lit(0.0)).alias("precision"),
            (F.coalesce("n_hits", F.lit(0)) / F.col("n_relevant")).alias("recall"),
            F.coalesce(1.0 / F.col("_first_rank"), F.lit(0.0)).alias("rr"),
        )
    )


def mean_ranking_quality(
    ranking: DataFrame,
    labels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc",
    rank_col: str = "rank",
    round_digits: int = 4,
) -> DataFrame:
    """One-row summary: ``mean_precision``, ``mean_recall``, ``mrr``,
    ``n_queries`` — the reference's ``quality_metrics`` dict
    (benchmark_search.py:141-146) as a DataFrame."""
    per_q = ranking_quality(ranking, labels, k, query_col, id_col, rank_col)
    return per_q.agg(
        F.round(F.avg("precision"), round_digits).alias("mean_precision"),
        F.round(F.avg("recall"), round_digits).alias("mean_recall"),
        F.round(F.avg("rr"), round_digits).alias("mrr"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
    )


def dcg_discounts_micro(k: int) -> list[tuple[int, int]]:
    """The nDCG rank discounts ``1/log₂(r+1)`` for ranks 1..k, in
    micro-units with HALF_UP rounding — a k-row constant table, the
    only transcendental in the nDCG path (pinned against math.log2 in
    pytest; an SQL oracle inlines the same constants instead of
    re-deriving logs)."""
    import math

    return [
        (r, math.floor(1_000_000 / math.log2(r + 1) + 0.5))
        for r in range(1, k + 1)
    ]


def ndcg_quality(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc",
    rank_col: str = "rank",
    gain_col: str = "gain",
) -> DataFrame:
    """Per-query nDCG@k with GRADED relevance, exact-integer: one row
    per labeled query — ``dcg_micro`` (Σ gain·discount over the
    engine's top-k), ``idcg_micro`` (the same sum over the query's
    own gains sorted desc — the ideal ordering), ``ndcg_ppm =
    dcg·10⁶ div idcg`` (0 where the query has no positive gain).

    ``qrels``: (query, id, gain) with integer gains ≥ 0 (binary
    labels are gain=1). Scale shape: the discount dim is k rows
    (broadcast); DCG is one (query,id)-keyed join + partial agg; IDCG
    is a per-query window over the labeled set only — never over the
    corpus."""
    spark = ranking.sparkSession
    disc = spark.createDataFrame(
        dcg_discounts_micro(k), "_r int, _disc long"
    )
    lab = (
        qrels.groupBy(query_col, id_col)
        .agg(F.max(gain_col).cast("long").alias("_gain"))
        .localCheckpoint(eager=True)  # feeds DCG join AND IDCG window
    )
    dcg = (
        ranking.filter(F.col(rank_col) <= k)
        .join(
            F.broadcast(disc),
            F.col(rank_col).cast("int") == F.col("_r"),
        )
        .join(lab, [query_col, id_col], "left")
        .groupBy(query_col)
        .agg(
            F.sum(F.coalesce("_gain", F.lit(0)) * F.col("_disc")).alias(
                "dcg_micro"
            )
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(query_col).orderBy(
        F.desc("_gain"), F.col(id_col)
    )
    idcg = (
        lab.withColumn("_pos", F.row_number().over(w))
        .filter((F.col("_pos") <= k) & (F.col("_gain") > 0))
        .join(F.broadcast(disc), F.col("_pos") == F.col("_r"), "left")
        .groupBy(query_col)
        .agg(F.sum(F.col("_gain") * F.col("_disc")).alias("idcg_micro"))
    )
    return (
        lab.select(query_col)
        .distinct()
        .join(dcg, query_col, "left")
        .join(idcg, query_col, "left")
        .select(
            query_col,
            F.coalesce("dcg_micro", F.lit(0)).cast("long").alias("dcg_micro"),
            F.coalesce("idcg_micro", F.lit(0))
            .cast("long")
            .alias("idcg_micro"),
        )
        .withColumn(
            "ndcg_ppm",
            F.when(F.col("idcg_micro") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("dcg_micro * 1000000 DIV idcg_micro")
            ),
        )
    )


def mean_ndcg(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc",
    rank_col: str = "rank",
    gain_col: str = "gain",
) -> DataFrame:
    """One row: ``(n_queries, mean_ndcg_ppm)`` — the floor-divide mean
    over all labeled queries."""
    per_q = ndcg_quality(
        ranking, qrels, k, query_col, id_col, rank_col, gain_col
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.expr("sum(ndcg_ppm) DIV count(1)").cast("long").alias(
            "mean_ndcg_ppm"
        ),
    )


def rbo_suffix_weights_ppb(k: int, p_milli: int = 900) -> list[tuple[int, int]]:
    """Rank-biased-overlap depth weights (Webber, Moffat & Zobel
    2010), precomputed as SUFFIX sums: an item first common to both
    rankings at depth m contributes ``Σ_{d=m..k} (1−p)·p^{d−1}/d`` to
    truncated RBO@k — so RBO is ONE join plus a sum, never a
    per-depth loop. Returned as ``(m, weight_ppb)`` with HALF_UP
    parts-per-billion rounding of each suffix sum (pinned against the
    float formula in pytest; an SQL oracle inlines the constants)."""
    import math

    p = p_milli / 1000.0
    terms = [(1 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    return [
        (m, math.floor(sum(terms[m - 1 :]) * 1_000_000_000 + 0.5))
        for m in range(1, k + 1)
    ]


def rbo_overlap(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 10,
    p_milli: int = 900,
    query_col: str = "query_id",
    id_col: str = "doc",
    rank_col: str = "rank",
) -> DataFrame:
    """Truncated RBO@k per query between two rankings of the same
    query set: ``(query, n_common, rbo_ppb)``. An item ranked ``r_a``
    and ``r_b`` is common from depth ``m = max(r_a, r_b)`` on, so its
    contribution is the pinned suffix weight at ``m`` — the whole
    metric is an inner join on (query, item), a broadcast k-row
    weight join and one sum. Queries present in either ranking with
    no common top-k items score 0."""
    spark = rank_a.sparkSession
    wts = spark.createDataFrame(
        rbo_suffix_weights_ppb(k, p_milli), "_m int, _w long"
    )
    a = rank_a.filter(F.col(rank_col) <= k).select(
        query_col, id_col, F.col(rank_col).alias("_ra")
    )
    b = rank_b.filter(F.col(rank_col) <= k).select(
        query_col, id_col, F.col(rank_col).alias("_rb")
    )
    common = (
        a.join(b, [query_col, id_col])
        .withColumn("_m", F.greatest("_ra", "_rb").cast("int"))
        .join(F.broadcast(wts), "_m")
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("_w").cast("long").alias("rbo_ppb"),
        )
    )
    qs = (
        a.select(query_col)
        .unionByName(b.select(query_col))
        .distinct()
    )
    return qs.join(common, query_col, "left").select(
        query_col,
        F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        F.coalesce("rbo_ppb", F.lit(0)).cast("long").alias("rbo_ppb"),
    )


def search_quality_benchmark(
    spark,
    entities: DataFrame,
    entity_vectors: DataFrame,
    relevance: dict[str, list[str]],
    k: int = 10,
) -> DataFrame:
    """End-to-end quality benchmark against the entity store: embed the
    labeled query texts (same hashing-trick expression as the search
    path), rank with one broadcast ``batch_topk`` pass, match on
    canonical names (the reference compares result names to the
    expected-entity lists). Returns the one-row mean metrics."""
    from .embeddings import embed_texts_df
    from .simsearch import batch_topk

    texts = list(relevance.keys())
    queries = embed_texts_df(spark, texts).select(
        F.col("qid").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ranking = batch_topk(
        entity_vectors, queries, k=k, id_col="canonical_id"
    ).join(
        entities.select("canonical_id", "canonical_name"), "canonical_id"
    ).select("query_id", "canonical_name", "rank")
    labels = spark.createDataFrame(
        [(i, name) for i, t in enumerate(texts) for name in relevance[t]],
        "query_id int, canonical_name string",
    )
    return mean_ranking_quality(
        ranking, labels, k=k, id_col="canonical_name"
    )
