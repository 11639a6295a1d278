"""Linear bag-of-words quality classifier — the fastText-style
"quality gate" of a pretraining-data pipeline (CCNet / RefinedWeb /
Llama-style: score every page with a cheap linear text classifier
trained on a labeled slice, keep pages the model calls high-quality).

The trainable stand-in here is multinomial Naive Bayes with add-one
smoothing: per-term log-odds weights, a document score that is the
class-prior log-odds plus the sum of its tokens' weights, and a
``score > 0`` keep gate. NB log-odds IS a linear classifier over the
bag-of-words indicator space — the same decision family fastText's
(averaged-embedding + linear) head occupies — and unlike SGD training
it is exactly reproducible: the sufficient statistics are integer
token counts, one ``groupBy`` away.

Reference parity: the reference gates extraction quality with rule
scores (``scripts/validation/quality_metrics.py``); this adds the
model-based document gate a 100 TB web-text pipeline runs between the
rule filters and dedup.

Determinism / oracle design (the ``lm_score`` trusted-export pattern):
``ln`` is evaluated once, in Spark, on the vocabulary-sized count
table and exported in micro-nats (``round(ln(·)·1e6)`` as BIGINT)
ALONGSIDE the integer counts it was derived from; document scores are
pure BIGINT sums over that table. A DuckDB oracle re-derives the
per-term counts and the scalar totals from the raw corpus
independently and joins the export ON THE COUNTS TOO — any drift in
the Spark-side training aggregation breaks the equi-join and surfaces
as a score/row mismatch, so the whole training pipeline short of the
pinned-in-pytest log function is replayed, not trusted.

Scale shape (100 TB): training is one explode + partial-agg count per
class over the LABELED slice (labeled sets are small — thousands of
pages); the weight table is vocabulary-sized, so scoring is a narrow
explode → broadcast join → per-doc partial agg — the exact plan shape
of ``lm_score.score_documents``. Nothing driver-side beyond two
scalar rows, no corpus-wide sort, no Python anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens

#: micro-nats: 1e6 · nats, HALF_UP-rounded — BIGINT everywhere after.
MICRO = 1_000_000


def _half_up(x: float) -> int:
    """HALF_UP to match Spark's F.round (Python round() is banker's)."""
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _label_token_counts(
    df: DataFrame, label_col: str, text_col: str
) -> DataFrame:
    """(term, pos, neg) — the per-term sufficient statistics."""
    tok = df.select(
        F.col(label_col).alias("_y"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    return tok.groupBy("term").agg(
        F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).cast("long").alias("pos"),
        F.sum(F.when(F.col("_y") == 0, 1).otherwise(0)).cast("long").alias("neg"),
    )


def _finalize_nb(
    counts: DataFrame, n_pos: int, n_neg: int
) -> tuple[DataFrame, dict]:
    """Weights + params from the sufficient statistics — shared by
    full training and the incremental update, so the two paths cannot
    drift."""
    stats = counts.agg(
        F.coalesce(F.sum("pos"), F.lit(0)).alias("tp"),
        F.coalesce(F.sum("neg"), F.lit(0)).alias("tn"),
        F.count(F.lit(1)).alias("vocab"),
    ).head()
    tp, tn, vocab = int(stats["tp"]), int(stats["tn"]), int(stats["vocab"])
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"both classes required: n_pos={n_pos} n_neg={n_neg}"
        )
    dp, dn = float(tp + vocab), float(tn + vocab)
    weights = counts.withColumn(
        "w_micro",
        F.round(
            (F.log((F.col("pos") + 1) / F.lit(dp))
             - F.log((F.col("neg") + 1) / F.lit(dn))) * MICRO
        ).cast("long"),
    )
    params = {
        "n_pos_docs": int(n_pos),
        "n_neg_docs": int(n_neg),
        "total_pos": tp,
        "total_neg": tn,
        "vocab_size": vocab,
        "prior_micro": _half_up(math.log(n_pos / n_neg) * MICRO),
        "oov_w_micro": _half_up(math.log(dn / dp) * MICRO),
    }
    return weights, params


def train_nb_classifier(
    df: DataFrame, label_col: str = "label", text_col: str = "text"
) -> tuple[DataFrame, dict]:
    """Train the add-one-smoothed NB log-odds weights.

    ``df`` carries one row per labeled document, ``label_col`` ∈
    {0, 1}. Returns ``(weights, params)``:

    * ``weights`` — ``(term, pos, neg, w_micro)`` with ``pos``/``neg``
      the per-class token counts and ``w_micro =
      round((ln((pos+1)/(TP+V)) − ln((neg+1)/(TN+V))) · 1e6)`` as
      BIGINT, where TP/TN are the per-class token totals and V the
      joint vocabulary size.
    * ``params`` — the scalar sufficient statistics plus the derived
      micro-nat constants: ``n_pos_docs``, ``n_neg_docs``,
      ``total_pos``, ``total_neg``, ``vocab_size``, ``prior_micro =
      round(ln(n_pos_docs/n_neg_docs)·1e6)`` and ``oov_w_micro =
      round(ln((TN+V)/(TP+V))·1e6)`` (the zero-count odds both classes
      fall back to).

    Two tiny collected rows (four BIGINTs) — sufficient statistics,
    not data; the per-term log runs JVM-side on the count table.
    """
    # three consumers read this vocabulary-sized table (the scalar
    # stats action, the weight projection's export, the scoring join)
    # — localCheckpoint or the labeled-slice explode re-runs per
    # consumer (the build_triples two-consumer rule)
    counts = _label_token_counts(df, label_col, text_col) \
        .localCheckpoint(eager=True)
    docs = df.agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).alias("nn"),
    ).head()
    return _finalize_nb(counts, int(docs["np"] or 0), int(docs["nn"] or 0))


def update_nb_classifier(
    stored_weights: DataFrame,
    stored_params: dict,
    new_labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
) -> tuple[DataFrame, dict]:
    """Growing-corpus maintenance path: fold a NEW labeled batch into
    a stored classifier WITHOUT rescanning the old corpus — the
    sufficient statistics (per-term class counts + four scalars) are
    mergeable, so the update is one batch tokenization + a
    vocabulary-sized count merge, and the result is BIT-IDENTICAL to
    retraining from scratch on the union (pinned in
    test_quality_clf). ``stored_weights`` is ``train_nb_classifier``
    output (or its parquet export — it carries pos/neg)."""
    batch = _label_token_counts(new_labeled, label_col, text_col)
    merged = (
        stored_weights.select("term", "pos", "neg")
        .unionByName(batch)
        .groupBy("term")
        .agg(F.sum("pos").cast("long").alias("pos"),
             F.sum("neg").cast("long").alias("neg"))
        .localCheckpoint(eager=True)
    )
    docs = new_labeled.agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).alias("nn"),
    ).head()
    return _finalize_nb(
        merged,
        int(stored_params["n_pos_docs"]) + int(docs["np"] or 0),
        int(stored_params["n_neg_docs"]) + int(docs["nn"] or 0),
    )


def score_documents_nb(
    df: DataFrame,
    weights: DataFrame,
    prior_micro: int,
    oov_w_micro: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_weights: bool = True,
) -> DataFrame:
    """Per-document NB log-odds score (micro-nats, exact BIGINT) and
    the keep gate.

    Adds ``clf_tokens`` (BIGINT), ``score_micro`` (BIGINT, prior +
    Σ token weights with OOV fallback; token-free docs carry the bare
    prior) and ``clf_keep = score_micro > 0``.

    Plan: explode → (broadcast) left join on term → one per-doc
    partial agg → join back. ``broadcast_weights=False`` for
    vocabularies beyond the broadcast budget — the sort-merge then
    shuffles only (term) keys of token rows, never documents.
    """
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    side = weights.select("term", "w_micro")
    if broadcast_weights:
        side = F.broadcast(side)
    per = (
        toks.join(side, "term", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("clf_tokens"),
            F.sum(F.coalesce(F.col("w_micro"), F.lit(int(oov_w_micro))))
            .cast("long")
            .alias("_w_sum"),
        )
    )
    out = (
        df.join(per, id_col, "left")
        .withColumn("clf_tokens", F.coalesce(F.col("clf_tokens"), F.lit(0)))
        .withColumn(
            "score_micro",
            (F.lit(int(prior_micro))
             + F.coalesce(F.col("_w_sum"), F.lit(0))).cast("long"),
        )
        .drop("_w_sum")
    )
    return out.withColumn("clf_keep", F.col("score_micro") > 0)
