"""TF-IDF keyword extraction — per-document salient terms, the
document-fingerprinting / topic-tagging primitive of a training-data
pipeline (corpus exploration, mixture audits, per-domain topic
budgets, retrieval-side boosting).

Determinism / oracle design (the ``lm_score`` trusted-export
pattern): ``idf = ln(N / df)`` is evaluated once, in Spark, per
*distinct document-frequency value* (micro-nats, BIGINT) and exported
as a tiny ``(df → idf_micro)`` table — at most one row per distinct
df ≪ vocabulary; scores are the pure BIGINT products
``tf · idf_micro``, so a DuckDB oracle that recomputes tf and df
independently from the raw text and joins the exported log table
lands on bit-identical scores and the identical
``(score DESC, term ASC)`` per-document top-k.

Scale shape (100 TB): tf is one explode + (doc_id, term) partial agg;
df one (term) agg — vocabulary-sized output; idf attaches by
broadcast (or by a term-keyed sort-merge when the vocabulary exceeds
the broadcast budget — only token-shaped rows shuffle, never
documents); the per-doc top-k is a window PARTITIONED BY doc_id, so
every partition holds whole documents and no global sort exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _tokens

#: micro-nats, HALF_UP-rounded — BIGINT everywhere after.
MICRO = 1_000_000


def doc_term_freq(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) — one explode + partial-agg count."""
    return (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def idf_table(tf: DataFrame, n_docs: int,
              id_col: str = "doc_id") -> DataFrame:
    """(term, df, idf_micro) with ``idf_micro = round(ln(N/df)·1e6)``
    as BIGINT. ``df`` is counted over the tf table (a term appears
    once per containing document there), so no second corpus pass."""
    counts = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    return idf_from_counts(counts, n_docs)


def idf_log_table(idf: DataFrame) -> DataFrame:
    """Oracle-facing projection: distinct (df, idf_micro) rows — the
    pure ``df ↦ ln(N/df)`` function as a table."""
    return idf.select("df", "idf_micro").distinct()


def merge_df_counts(
    stored: DataFrame, new_docs: DataFrame, stored_n_docs: int,
    text_col: str = "text", id_col: str = "doc_id",
) -> tuple[DataFrame, int]:
    """Growing-corpus maintenance path: fold a NEW document batch into
    a stored ``(term, df)`` table WITHOUT rescanning the old corpus —
    document frequencies are mergeable counts (the bloom/cms/hll merge
    rule applied to the idf's sufficient statistics).

    Returns ``(df_counts, n_docs)`` for the grown corpus; feed them to
    ``idf_table``-style recomputation (the ln runs only on the
    vocabulary-sized merged table). Merging then rebuilding the idf is
    BIT-IDENTICAL to retraining from scratch on the union — pinned in
    test_keywords_ngram."""
    batch_df = (
        doc_term_freq(new_docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    merged = (
        stored.select("term", "df")
        .unionByName(batch_df)
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    return merged, int(stored_n_docs) + new_docs.count()


def idf_from_counts(df_counts: DataFrame, n_docs: int) -> DataFrame:
    """(term, df, idf_micro) from a (term, df) count table — the log
    step of ``idf_table`` factored out so merged counts rebuild the
    idf without a corpus pass."""
    return df_counts.withColumn(
        "idf_micro",
        F.round(F.log(F.lit(float(n_docs)) / F.col("df")) * MICRO)
        .cast("long"),
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_idf: bool = True,
) -> tuple[DataFrame, DataFrame, int]:
    """Top-``k`` keywords per document by ``tf · idf``.

    Returns ``(keywords, idf, n_docs)`` where ``keywords`` is
    (doc_id, rank, term, tf, score_micro) with rank 1..k per document
    ordered by (score_micro DESC, term ASC) — the deterministic
    tie-break — and ``idf`` is the (term, df, idf_micro) table for
    export/reuse. ``n_docs`` counts ALL input documents (including
    token-free ones), the conventional N of the idf."""
    n_docs = df.count()
    tf = doc_term_freq(df, text_col, id_col)
    idf = idf_table(tf, n_docs, id_col)
    side = idf.select("term", "idf_micro")
    if broadcast_idf:
        side = F.broadcast(side)
    scored = tf.join(side, "term").withColumn(
        "score_micro", (F.col("tf") * F.col("idf_micro")).cast("long")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    kw = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("long").alias("rank"),
                "term", "tf", "score_micro")
    )
    return kw, idf, n_docs
