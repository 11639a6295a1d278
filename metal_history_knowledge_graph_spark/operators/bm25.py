"""BM25 keyword retrieval over a document corpus — the inverted-index
ranking pass a large-scale text pipeline pairs with embedding ANN
(operators/simsearch.py) for hybrid retrieval.

Index shape (classic distributed IR):

- ``bm25_index`` materializes term postings ``(term, doc, tf)`` and
  per-document lengths in ONE explode + partial-agg pass; corpus
  constants (N, average doc length) come from the same aggregation.
- ``bm25_topk`` scores a query by *filtering* the postings to the
  query's terms (predicate pushes to the postings scan — at rest this
  is a partition/bucket prune on ``term``), joining the
  vocabulary-sized per-term doc frequencies broadcast-side, one
  per-doc partial-agg sum, and a TakeOrderedAndProject top-k. No
  full-corpus scan at query time once the postings table is stored
  term-partitioned.

Scoring is Lucene-flavored BM25: ``idf = ln(1 + (N - df + 0.5) /
(df + 0.5))``, ``score = Σ idf · tf·(k1+1) / (tf + k1·(1 − b +
b·dl/avgdl))``. Scores are doubles rounded to 4 decimals BEFORE the
ordering with a ``doc_id`` tie-break, so the exact DuckDB oracle
(q_bm25_topk) orders identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens


def bm25_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Build the postings and doc-stats tables.

    Returns ``(postings, doc_stats)`` where postings =
    ``(term, id_col, tf)`` and doc_stats = ``(id_col, dl)``. Both are
    plain DataFrames — persist postings partitioned/bucketed by
    ``term`` (io.TableStore) to make query-time term filters
    partition prunes.
    """
    toks = df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
    postings = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    doc_stats = df.select(
        F.col(id_col), F.size(_tokens(F.col(text_col))).cast("long").alias("dl")
    )
    return postings, doc_stats


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    reuse: bool = True,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under BM25.

    Output: ``(id_col, score)`` with ``score`` rounded to 4 decimals,
    ordered by ``score`` desc then ``id_col`` asc (deterministic under
    rounded ties). Documents matching no query term never score.

    Repeated query terms count once (set semantics, the standard
    bag-of-words-query simplification).
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        return df.select(
            F.col(id_col), F.lit(0.0).alias("score")
        ).limit(0)
    postings, doc_stats = bm25_index(df, text_col, id_col)
    if reuse:
        # both feed two consumers (totals+join / dfreq+join); without
        # the lazy checkpoint each consumer re-runs the explode lineage
        # (repo two-consumer rule). At rest, store postings
        # term-partitioned instead and pass reuse=False.
        doc_stats = doc_stats.localCheckpoint(eager=False)
    totals = doc_stats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = postings.filter(F.col("term").isin(terms))
    if reuse:
        hits = hits.localCheckpoint(eager=False)
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(doc_stats, id_col)
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
                / (F.col("df_t") + F.lit(0.5))
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("part"), 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
