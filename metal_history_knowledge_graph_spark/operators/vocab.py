"""Vocabulary construction + out-of-vocabulary coverage — the
tokenizer-prep pass of a training-data pipeline: pick the top-V corpus
words, then measure per document how much of it the vocabulary covers
(docs with high OOV rates are misencoded, foreign, or junk; corpora
with high aggregate OOV need a bigger vocab).

Deterministic: vocabulary ties at the frequency boundary break
lexicographically, so the same corpus always yields the same
vocabulary — the property that makes the oracle (q_vocab_coverage) and
resumed runs exact.

Scale: vocabulary selection is one word-count aggregation + a top-V
TakeOrdered (vocabulary-sized result, broadcastable); coverage is one
explode + broadcast semi-join + per-doc partial agg. Nothing driver-
side, no full-corpus sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _tokens


def build_vocab(
    df: DataFrame, text_col: str = "text", size: int = 1 << 15
) -> DataFrame:
    """Top-``size`` words by occurrence count (ties: lexicographic) as
    ``(term, freq, vrank)``."""
    counts = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        counts.orderBy(F.desc("freq"), F.asc("term"))
        .limit(size)
        # rank over the already-vocabulary-sized top-V result — the
        # single-partition window is bounded by `size`, not the corpus
        .withColumn(
            "vrank",
            F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("term"))),
        )
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document coverage of ``vocab``: adds ``n_tokens`` (total
    occurrences), ``oov_tokens`` (occurrences of words outside the
    vocabulary) and ``oov_bp`` (basis points, integer ``div``). Empty
    and NULL texts account as 0/0/0.

    Plan: explode → broadcast LEFT SEMI-shaped join against the
    vocabulary term set → one per-doc partial agg back onto the input.
    """
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    vterms = vocab.select("term").withColumn("_inv", F.lit(True))
    per = (
        toks.join(F.broadcast(vterms), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("oov_tokens"),
        )
    )
    return (
        df.join(per, id_col, "left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
        .withColumn("oov_tokens", F.coalesce(F.col("oov_tokens"), F.lit(0)))
        .withColumn(
            "oov_bp",
            F.expr(
                "CASE WHEN n_tokens > 0"
                " THEN (10000 * oov_tokens) div n_tokens"
                " ELSE CAST(0 AS BIGINT) END"
            ),
        )
    )
