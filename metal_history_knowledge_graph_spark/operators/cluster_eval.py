"""Clustering-quality evaluation for dedup/canonicalization output —
the two standard extrinsic metrics, both in exactly-replayable
integer arithmetic:

- **pair-counting confusion** (Rand-style): TP/FP/FN/TN over all
  item pairs, where "positive" means "same predicted cluster". All
  four counts are pure BIGINTs from per-cluster and per-cell
  ``C(n, 2)`` sums — never an actual pair enumeration, so a
  10⁹-item clustering costs three partial-aggregated group-bys.
- **B-cubed precision/recall** (Bagga & Baldwin 1998; Amigó et al.
  2009 argue it's the most discriminative clustering metric for
  entity-resolution/dedup): per-item precision = |C(i) ∩ L(i)| /
  |C(i)|. Every item in the same (pred, gold) cell shares the same
  value, so the average is a cell-level sum — items never
  enumerate. Per-item values are kept as ppm via integer division
  (the repo's integer micro-unit idiom, lm_score.py style) so the
  result is deterministic and a DuckDB oracle replays it bit-exactly
  (float summation order can flip low bits; integer sums can't).

Why this belongs in the engine: every dedup family here (exact,
MinHash, SimHash, winnowing, embedding-cosine) emits a clustering;
choosing thresholds/bands without a clustering metric against a
labeled sample is guesswork. This is the dedup sibling of the
search-quality P/R/MRR harness (operators/search_quality.py).

Reference parity note: the reference validates entity dedup with
hand-written expected groups (tests/test_deduplication.py) but has
no clustering metric; beyond-reference surface (SURVEY §6).

Duplicate ids are resolved to their min label on each side first
(deterministic), NULL labels/ids dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _items(
    df: DataFrame, id_col: str, pred_col: str, gold_col: str
) -> DataFrame:
    return (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(pred_col).isNotNull()
            & F.col(gold_col).isNotNull()
        )
        .groupBy(F.col(id_col).alias("_id"))
        .agg(
            F.min(pred_col).alias("_p"),
            F.min(gold_col).alias("_g"),
        )
    )


def _c2(n):
    """Exact C(n, 2) on BIGINTs: n(n−1) is always even, so a right
    shift is the exact halving (no double division anywhere — C(n,2)
    at n = 10⁹ is 5·10¹⁷, past double's 2⁵³ exact range)."""
    x = n.cast("long")
    return F.shiftright(x * (x - F.lit(1)), 1)


def pair_confusion(
    df: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """One row ``(tp, fp, fn, tn)`` of item-PAIR counts: tp = pairs
    together in both clusterings, fp = together in pred only, fn =
    together in gold only, tn = separated in both. Computed from
    C(n,2) sums over the (pred), (gold) and (pred, gold) contingency
    marginals — no pair is ever materialized."""
    items = _items(df, id_col, pred_col, gold_col).localCheckpoint(eager=True)
    cells = items.groupBy("_p", "_g").agg(F.count(F.lit(1)).alias("n"))
    tp = cells.agg(F.sum(_c2(F.col("n"))).cast("long").alias("v"))
    pred_pairs = (
        items.groupBy("_p")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(_c2(F.col("n"))).cast("long").alias("v"))
    )
    gold_pairs = (
        items.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(_c2(F.col("n"))).cast("long").alias("v"))
    )
    total = items.agg(_c2(F.count(F.lit(1))).cast("long").alias("v"))
    return (
        tp.withColumnRenamed("v", "tp")
        .crossJoin(pred_pairs.withColumnRenamed("v", "_pp"))
        .crossJoin(gold_pairs.withColumnRenamed("v", "_gp"))
        .crossJoin(total.withColumnRenamed("v", "_tot"))
        .select(
            "tp",
            (F.col("_pp") - F.col("tp")).alias("fp"),
            (F.col("_gp") - F.col("tp")).alias("fn"),
            (F.col("_tot") - F.col("_pp") - F.col("_gp") + F.col("tp")).alias(
                "tn"
            ),
        )
    )


def bcubed(
    df: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """One row ``(n_items, bcubed_precision_ppm, bcubed_recall_ppm)``.
    Per-item precision/recall in integer ppm (value * 10⁶ floor-div
    cluster size), averaged by another floor division — every item in
    a (pred, gold) cell contributes the same ppm, so the sum is
    cell-count-weighted and the whole metric is three group-bys."""
    items = _items(df, id_col, pred_col, gold_col).localCheckpoint(eager=True)
    cells = items.groupBy("_p", "_g").agg(F.count(F.lit(1)).alias("n"))
    psize = items.groupBy("_p").agg(F.count(F.lit(1)).alias("np"))
    gsize = items.groupBy("_g").agg(F.count(F.lit(1)).alias("ng"))
    per_cell = (
        cells.join(psize, "_p")
        .join(gsize, "_g")
        .select(
            F.col("n"),
            # all-integer: per-item ppm is an exact BIGINT DIV
            (F.col("n") * F.expr("n * 1000000 DIV np")).alias("_prec_sum"),
            (F.col("n") * F.expr("n * 1000000 DIV ng")).alias("_rec_sum"),
        )
    )
    return per_cell.agg(
        F.sum("n").cast("long").alias("_n"),
        F.sum("_prec_sum").alias("_ps"),
        F.sum("_rec_sum").alias("_rs"),
    ).select(
        F.col("_n").alias("n_items"),
        F.expr("_ps DIV _n").cast("long").alias("bcubed_precision_ppm"),
        F.expr("_rs DIV _n").cast("long").alias("bcubed_recall_ppm"),
    )


def cluster_eval(
    df: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """The combined one-row report: pair confusion + pairwise
    precision/recall (ppm, from the exact pair counts) + B-cubed
    precision/recall (ppm)."""
    conf = pair_confusion(df, id_col, pred_col, gold_col)
    b3 = bcubed(df, id_col, pred_col, gold_col)
    # pair counts reach C(10⁹, 2) ≈ 5·10¹⁷; ×10⁶ overflows BIGINT, so
    # the ppm ratios go through DECIMAL(38,0) (DuckDB: HUGEINT)
    return conf.crossJoin(b3).select(
        "n_items",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "CAST(CAST(tp AS DECIMAL(38,0)) * 1000000"
                " DIV (tp + fp) AS BIGINT)"
            )
        )
        .alias("pair_precision_ppm"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "CAST(CAST(tp AS DECIMAL(38,0)) * 1000000"
                " DIV (tp + fn) AS BIGINT)"
            )
        )
        .alias("pair_recall_ppm"),
        "bcubed_precision_ppm",
        "bcubed_recall_ppm",
    )
