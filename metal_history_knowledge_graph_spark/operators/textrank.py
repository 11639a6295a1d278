"""TextRank keyword ranking (Mihalcea & Tarau 2004) over the corpus
word co-occurrence graph — the graph-based complement to the
frequency-based keyword extractors already in the catalog (TF-IDF
picks per-document salient terms, PMI picks collocations; TextRank
ranks vocabulary by CENTRALITY in the adjacency graph, surfacing the
connective topic terms a corpus-mixture audit wants to see even when
their raw counts are unremarkable).

Design: corpus-level, not per-document — one adjacency graph built by
a single explode + (a, b) partial-agg count, then the existing
edge-weighted PageRank kernel (:func:`graph_algos.pagerank_weighted`,
fixed-point BIGINT) over the symmetrized edges. That keeps the whole
operator inside the engine's proven iterative-graph shape (one
edge⋈rank join + partial agg per iteration, lineage checkpointed) and
makes the oracle a composition of two already-verified replay
patterns: the DuckDB side rebuilds the SAME graph from raw text
(list-unnest adjacent pairs, least/greatest canonicalization) and
replays the SAME (r div W)·w integer trajectory via chained CTEs.

Per-document TextRank on a 100 TB corpus would be millions of tiny
independent graphs — a grouped-applyInPandas shape; the corpus-level
graph is the variant whose cost actually scales with data (vocabulary-
sized state, document-sized edge stream) and whose output feeds
corpus-wide decisions. Tokenization is the shared ``textstats._tokens``
(lowercased whitespace split), identical to the TF-IDF / KN-bigram
families, so vocabularies agree across the text operators.

No reference counterpart (the reference's keyword surface is LLM
extraction); included as part of the text-analysis catalog the brief
asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph_algos import pagerank_weighted
from .textstats import _tokens


def cooccurrence_edges(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(a, b, weight): undirected ADJACENT-pair counts over the whole
    corpus, canonicalized a = least < b = greatest, self-pairs
    (immediate word repeats) dropped. One narrow explode + one
    (a, b)-keyed partial-agg count — the only shuffle, keyed on the
    pair, vocabulary²-bounded output."""
    toks = _tokens(F.col(text_col))
    npairs = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = (
        df.select(
            F.explode(
                F.zip_with(
                    F.slice(toks, F.lit(1), npairs),
                    F.slice(toks, F.lit(2), npairs),
                    lambda a, b: F.struct(
                        F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
                    ),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
    )
    return pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )


def merge_cooccurrence(
    stored: DataFrame, new_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Growing-corpus maintenance: fold a NEW document batch's
    adjacent-pair counts into a stored (a, b, weight) table WITHOUT
    rescanning the old corpus — co-occurrence weights are mergeable
    counts (the bloom/cms/hll/idf merge rule). Merge-then-rank is
    BIT-IDENTICAL to rebuilding from the union (pinned in
    test_textrank): the graph is a pure sum of per-document pair
    multisets, and pagerank_weighted reads only the summed weights."""
    batch = cooccurrence_edges(new_docs, text_col)
    return (
        stored.unionByName(batch)
        .groupBy("a", "b")
        .agg(F.sum("weight").cast("long").alias("weight"))
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    n_iters: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` corpus keywords by weighted PageRank over the
    co-occurrence graph: (term, rank_fixed) with the engine's standard
    (rank DESC, term ASC) deterministic tie-break; rank_fixed is the
    BIGINT fixed-point rank (scale 10^12) straight from the kernel.
    Top-k is an orderBy+limit → TakeOrderedAndProject, never a global
    sort."""
    e = cooccurrence_edges(df, text_col)
    sym = e.select(
        F.col("a").alias("subj_id"), F.col("b").alias("obj_id"), "weight"
    ).unionByName(
        e.select(
            F.col("b").alias("subj_id"), F.col("a").alias("obj_id"), "weight"
        )
    )
    ranks = pagerank_weighted(sym, n_iters=n_iters)
    return (
        ranks.select(F.col("node_id").alias("term"), "rank_fixed")
        .orderBy(F.desc("rank_fixed"), "term")
        .limit(k)
    )
