"""Kneser-Ney bigram statistics — the n-gram LM-training counts a
text pipeline materializes per corpus snapshot (classic LM baselines,
contamination fingerprints, domain-shift diagnostics, tokenizer
audits).

Interpolated KN with absolute discount d (Chen & Goodman 1999):

    p_kn(w2|w1) = max(c(w1,w2) − d, 0) / c(w1·)
                  + (d · N1+(w1,·) / c(w1·)) · p_cont(w2)
    p_cont(w2)  = N1+(·,w2) / |distinct bigrams|

where ``c(w1·) = Σ_x c(w1,x)`` (the prefix mass), ``N1+(w1,·)`` the
distinct continuations of w1 and ``N1+(·,w2)`` the distinct contexts
of w2 — the "how many different contexts" counts that make KN beat
raw MLE backoff.

Determinism / oracle design: every quantity here is an integer count
or a micro-unit floor-divide over integer counts (d is supplied in
micro-units, default 750 000 = 0.75) — NO logs, NO floats, NO
exports. A DuckDB oracle re-derives the whole table from the raw text
independently; both engines agree bit-exactly. Since the bigram count
is ≥ 1 and d < 1, the discounted numerator ``1e6·c12 − d_micro``
never clips, so ``max(·,0)`` is algebraically dropped.

Scale shape (100 TB): bigram expansion is a narrow per-document
``transform`` over the token array (no self-join); c12 is one
(w1, w2) partial agg; the prefix/continuation tables are single
re-aggregations of the vocabulary²-bounded (actually
distinct-bigram-bounded) c12 table; the scalar distinct-bigram total
attaches via a broadcast 1-row cross-join — nothing driver-side, no
global sort. localCheckpoint on c12 cuts the shared-lineage re-run
(it feeds three consumers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens

#: micro-units: probabilities/discounts scaled by 1e6, BIGINT after.
MICRO = 1_000_000
#: the standard KN absolute discount 0.75, in micro-units.
D_MICRO = 750_000


def bigram_pairs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2) bigram occurrence rows — a per-document array
    transform, never a positional self-join."""
    return (
        df.select(_tokens(F.col(text_col)).alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )


def bigram_kn(
    df: DataFrame,
    text_col: str = "text",
    discount_micro: int = D_MICRO,
) -> DataFrame:
    """The full KN bigram table: (w1, w2, c12, c1, n1_fwd, n1_bwd,
    pcont_micro, pkn_micro), all BIGINT.

    * ``c12`` — bigram count; ``c1`` — prefix mass Σ_x c(w1,x);
    * ``n1_fwd`` — N1+(w1,·); ``n1_bwd`` — N1+(·,w2);
    * ``pcont_micro = (1e6 · n1_bwd) div D`` with D = distinct
      bigram types;
    * ``pkn_micro = (1e6·c12 − d) div c1
      + (((d·n1_fwd) div c1) · pcont_micro) div 1e6``.

    Magnitudes: lambda ≤ d < 1e6, pcont ≤ 1e6 → their product
    < 1e12; the discounted numerator ≤ 1e6·c12 — BIGINT-safe to
    ~9·10¹² bigram occurrences of a single type.
    """
    d = int(discount_micro)
    if not 0 < d < MICRO:
        raise ValueError(f"discount_micro must be in (0, 1e6): {d}")
    c12 = (
        bigram_pairs(df, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .localCheckpoint(eager=True)
    )
    prefix = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1_fwd"),
    )
    cont = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1_bwd")
    )
    totals = c12.agg(F.count(F.lit(1)).cast("long").alias("n_bigram_types"))
    return (
        c12.join(prefix, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pcont_micro",
            F.expr(f"({MICRO} * n1_bwd) div n_bigram_types"),
        )
        .withColumn(
            "pkn_micro",
            F.expr(
                f"({MICRO} * c12 - {d}) div c1"
                f" + ((({d} * n1_fwd) div c1) * pcont_micro) div {MICRO}"
            ),
        )
        .select("w1", "w2", "c12", "c1", "n1_fwd", "n1_bwd",
                "pcont_micro", "pkn_micro")
    )


#: nll_micro of the probability floor (p = 1 micro = 1e-6):
#: round(-ln(1e-6)·1e6). Also the avg for docs with no bigrams.
FLOOR_NLL_MICRO = 13_815_511


def kn_event_probs(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount_micro: int = D_MICRO,
) -> DataFrame:
    """Per-bigram-event KN probability (micro-units) for every
    document in ``df`` under a trained ``lm`` (:func:`bigram_kn`
    output): ``(id, p_micro)`` rows, one per bigram position.

    Backoff ladder (all integer, every rung replayable in SQL):

    * seen (w1, w2)      → ``pkn_micro`` from the LM row;
    * unseen pair, known w1 & w2 → ``λ(w1) · p_cont(w2) div 1e6``
      (the interpolation mass the discount reserved);
    * unknown w1, known w2 → ``p_cont(w2)``;
    * unknown w2 → the floor (1 micro).

    Probabilities are clamped to ≥ 1 micro (a floor-divide rung can
    hit 0 on huge prefix masses; ln needs positivity). Scale: events
    shuffle once on (w1, w2) against the distinct-bigram-bounded LM,
    then once on w1 / w2 against the two vocabulary-sized marginal
    tables — AQE broadcasts the marginals when small."""
    d = int(discount_micro)
    prefix = (
        lm.groupBy("w1")
        .agg(
            F.first("c1").alias("c1"), F.first("n1_fwd").alias("n1_fwd")
        )
        .select("w1", F.expr(f"({d} * n1_fwd) div c1").alias("lambda_micro"))
    )
    cont = lm.groupBy("w2").agg(F.first("n1_bwd").alias("n1_bwd"))
    nbt = lm.agg(F.count(F.lit(1)).cast("long").alias("nbt"))
    cont = cont.crossJoin(F.broadcast(nbt)).select(
        "w2", F.expr(f"({MICRO} * n1_bwd) div nbt").alias("pcont_micro")
    )
    events = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"), _tokens(F.col(text_col)).alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select("_id", "bg.w1", "bg.w2")
    )
    return (
        events.join(lm.select("w1", "w2", "pkn_micro"), ["w1", "w2"], "left")
        .join(prefix, "w1", "left")
        .join(cont, "w2", "left")
        .select(
            F.col("_id").alias(id_col),
            F.greatest(
                F.coalesce(
                    F.col("pkn_micro"),
                    F.when(
                        F.col("lambda_micro").isNotNull()
                        & F.col("pcont_micro").isNotNull(),
                        F.expr(f"(lambda_micro * pcont_micro) div {MICRO}"),
                    ),
                    F.col("pcont_micro"),
                    F.lit(1).cast("long"),
                ),
                F.lit(1).cast("long"),
            ).alias("p_micro"),
        )
    )


def kn_log_table(events: DataFrame) -> DataFrame:
    """``(p_micro, nll_micro)`` over the DISTINCT event probabilities:
    ``nll_micro = round(-ln(p_micro/1e6)·1e6)``. The ln is evaluated
    once per distinct value, in Spark — the exported log *function* a
    SQL oracle joins instead of re-deriving transcendentals
    (lm_score.py trusted-export pattern). ≤ 1e6 rows by construction."""
    return (
        events.select("p_micro")
        .distinct()
        .withColumn(
            "nll_micro",
            F.round(-F.log(F.col("p_micro") / F.lit(float(MICRO))) * MICRO)
            .cast("long"),
        )
    )


def kn_score_docs(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount_micro: int = D_MICRO,
    keep_below_micro: int = 12_000_000,
) -> tuple[DataFrame, DataFrame]:
    """CCNet-style quality gate under the KN bigram LM: score every
    document by average per-bigram NLL (integer micro-nats) and flag
    ``kn_keep = avg ≤ keep_below_micro``. Documents with < 2 tokens
    score the floor NLL (maximally surprising). Returns ``(scored,
    log_table)`` — the log table is what an external replayer needs.
    """
    events = kn_event_probs(
        df, lm, text_col, id_col, discount_micro
    ).localCheckpoint(eager=True)  # feeds the log table AND the per-doc agg
    logtab = kn_log_table(events).localCheckpoint(eager=True)
    per = (
        events.join(logtab, "p_micro")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("kn_bigrams"),
            F.sum("nll_micro").cast("long").alias("nll_sum_micro"),
        )
    )
    scored = (
        df.select(id_col)
        .distinct()
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("kn_bigrams", F.lit(0).cast("long")).alias("kn_bigrams"),
            F.coalesce("nll_sum_micro", F.lit(0).cast("long")).alias(
                "nll_sum_micro"
            ),
            F.when(
                F.col("kn_bigrams") > 0,
                F.expr("nll_sum_micro div kn_bigrams"),
            )
            .otherwise(F.lit(FLOOR_NLL_MICRO).cast("long"))
            .alias("avg_nll_micro"),
        )
        .withColumn("kn_keep", F.col("avg_nll_micro") <= F.lit(keep_below_micro))
    )
    return scored, logtab


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Collocation mining by pointwise mutual information: score every
    bigram by how much more often it occurs than its parts predict —
    the classic phrase detector (Church & Hanks 1990; the word2vec
    phrase pass uses the same lift statistic). Returns (w1, w2, c12,
    c1, c2, n_bigrams, lift_ppm) for bigrams with ``c12 ≥ min_count``.

    PMI = log( p(w1,w2) / (p(w1)·p(w2)) ) with all probabilities
    estimated on the bigram stream (c1 = Σ_x c(w1,x), c2 = Σ_x
    c(x,w2), N = Σ c12). log is monotone, so ranking by PMI equals
    ranking by the RATIONAL lift c12·N / (c1·c2) — which this operator
    emits in parts-per-million fixed point, keeping the whole table
    (and its oracle) in exact BIGINT arithmetic with no cross-engine
    transcendentals:

        lift_ppm = (((1e6 · c12) div c1) · N) div c2

    The two-step divide bounds every intermediate: (1e6·c12) div c1 ≤
    1e6 since c12 ≤ c1, so the product is ≤ 1e6·N — BIGINT-safe to
    N ≈ 9·10¹² bigram tokens (≈ 40 TB of English text; beyond that,
    drop the unit to 1e3 or pre-slice by language/domain as a PMI
    table is per-corpus anyway). The floor happening before ·N costs
    < c1/(1e6·c12) relative precision — sub-ppm for any bigram that
    clears ``min_count`` on a corpus large enough to matter.

    Scale shape: one (w1,w2) partial-agg groupBy over the narrow
    per-document bigram transform (no positional self-join), two
    re-aggregations of the distinct-bigram-bounded c12 table for the
    margins, and a broadcast 1-row cross-join for N — no global sort,
    nothing driver-side. min_count prunes the long tail BEFORE the
    margin joins.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be ≥ 1: {min_count}")
    c12 = (
        bigram_pairs(df, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .localCheckpoint(eager=True)
    )
    left = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    right = c12.groupBy("w2").agg(F.sum("c12").cast("long").alias("c2"))
    totals = c12.agg(F.sum("c12").cast("long").alias("n_bigrams"))
    return (
        c12.filter(F.col("c12") >= int(min_count))
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "lift_ppm",
            F.expr(f"((({MICRO} * c12) div c1) * n_bigrams) div c2"),
        )
        .select("w1", "w2", "c12", "c1", "c2", "n_bigrams", "lift_ppm")
    )
