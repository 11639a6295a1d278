"""DSIR-style data selection via importance resampling — select raw
web documents whose hashed n-gram distribution looks like a TARGET
corpus (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023; the public method behind "pick web pages
that look like Wikipedia" pretraining mixes).

Method: featurize every document as hashed unigram+bigram counts over
``n_buckets`` buckets, fit two add-one-smoothed bag-of-buckets models
(target corpus vs raw corpus), and weight each raw document by its
log-likelihood ratio  Σ_g [ln p_target(bucket(g)) − ln p_raw(bucket(g))]
— positive = looks more like the target. Selection takes the top-k
weights (deterministic; the paper's Gumbel-perturbed resampling needs
float transcendentals that are not bit-stable across engines, so the
sampled variant is deliberately out of the oracle surface — documented
here rather than silently approximated).

Reference parity: the reference repo has no data-selection stage (its
corpus is curated); this is part of the LLM-training-data operator
surface (SURVEY §6-adjacent) next to lm_score's CCNet-style filter —
DSIR selects FOR a target distribution, lm_score gates AGAINST junk.

Determinism / oracle design (the lm_score trusted-export pattern): the
bucket hash is the repo's cross-engine ``md5_mod`` (replayable in
DuckDB), all cross-engine arithmetic is INTEGER micro-nats, and the
only float step — the two ln()s per bucket — happens ONCE in Spark on
the ≤ n_buckets-sized ratio table, which is exported for the oracle to
join (pytest pins the ln against ``math.log``; the oracle recomputes
every document's bucket counts independently).

Scale shape (100 TB): model fit is one explode + partial-agg bucket
count per corpus (output ≤ n_buckets rows — FIXED size, unlike a
vocabulary); scoring is a narrow explode → broadcast join on the
bucket table → per-doc partial agg; selection is a
TakeOrderedAndProject. No corpus-wide sort, no Python, no driver-side
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import md5_mod
from .textstats import _tokens

#: micro-nats: 1e6 · nats, rounded half-up — BIGINT everywhere after
MICRO = 1_000_000
#: hash-feature space; 2^16 buckets is the DSIR paper's default scale
N_BUCKETS_DEFAULT = 65_536


def _grams(text_col: str):
    """Unigrams + bigrams of the whitespace tokens, one array — the
    DSIR featurizer. Bigrams are space-joined token pairs (the same
    string form the oracle rebuilds with generate_series)."""
    toks = _tokens(F.col(text_col))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def gram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> DataFrame:
    """(id, bucket) — one row per gram OCCURRENCE (counts matter:
    DSIR's weight is a dot product of count vectors with the
    log-ratio vector, not a set overlap)."""
    return df.select(
        F.col(id_col),
        F.explode(_grams(text_col)).alias("_g"),
    ).select(
        id_col,
        md5_mod(F.col("_g"), "dsir:", n_buckets).alias("bucket"),
    )


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    return (
        gram_buckets(df.select(F.lit(0).alias("_id"), text_col),
                     text_col=text_col, id_col="_id", n_buckets=n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_logratio_table(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> tuple[DataFrame, dict]:
    """Fit the importance model. Returns ``(lr, params)``:

    * ``lr`` — (bucket, lr_micro): the per-bucket log-ratio

          lr = ln((c_t + 1) / (T + B)) − ln((c_r + 1) / (R + B))

      (add-one smoothing; T/R = total gram occurrences per corpus,
      B = ``n_buckets``) in rounded integer micro-nats. Buckets unseen
      in BOTH corpora are omitted — their ratio is the constant
      ln((R+B)/(T+B)), returned as ``params["unseen_lr_micro"]`` (the
      lm_score OOV convention).
    * ``params`` — {"t_total", "r_total", "unseen_lr_micro"}.

    The two corpus counts are materialized once (eager checkpoint —
    each feeds both its total and the merge join); the totals are one
    tiny collected aggregate each; the ln() runs JVM-side on the
    ≤ B-row table."""
    ct = _bucket_counts(target, text_col, n_buckets) \
        .localCheckpoint(eager=True)
    cr = _bucket_counts(raw, text_col, n_buckets) \
        .localCheckpoint(eager=True)
    t_tot = int(ct.agg(F.coalesce(F.sum("n"), F.lit(0))).head()[0])
    r_tot = int(cr.agg(F.coalesce(F.sum("n"), F.lit(0))).head()[0])
    merged = (
        ct.withColumnRenamed("n", "ct")
        .join(cr.withColumnRenamed("n", "cr"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    lr = (
        F.log((F.col("ct") + 1) / F.lit(float(t_tot + n_buckets)))
        - F.log((F.col("cr") + 1) / F.lit(float(r_tot + n_buckets)))
    )
    table = merged.select(
        "bucket", F.round(lr * MICRO).cast("long").alias("lr_micro")
    )
    return table, {
        "t_total": t_tot,
        "r_total": r_tot,
        "unseen_lr_micro": default_lr_micro(t_tot, r_tot, n_buckets),
    }


def default_lr_micro(t_total: int, r_total: int,
                     n_buckets: int = N_BUCKETS_DEFAULT) -> int:
    """The unseen-bucket constant ln((R+B)/(T+B)) in micro-nats,
    HALF_UP-rounded to match Spark's F.round."""
    import math

    v = math.log((r_total + n_buckets) / (t_total + n_buckets)) * MICRO
    return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)


def dsir_weights(
    df: DataFrame,
    logratios: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS_DEFAULT,
    unseen_lr_micro: int = 0,
    broadcast_table: bool = True,
) -> DataFrame:
    """Input plus ``n_grams`` (BIGINT), ``weight_micro`` (BIGINT: the
    Σ count·lr dot product) and ``weight_per_gram_micro`` (BIGINT;
    gramless docs weigh 0 — no evidence either way). The per-gram
    divide is FLOOR division (``F.floor``, not Spark's ``div``):
    weights are signed and truncation/floor disagree on every negative
    weight, so the semantics must be pinned — floor is chosen, and the
    oracle replays it with exact integer arithmetic
    ``(w - (((w % n) + n) % n)) // n`` because DuckDB's ``//``
    truncates toward zero (measured: ``-7 // 2 = -3``). (Magnitude safety
    for the double-precision floor: |lr| ≤ ~20 nats = 2·10⁷ micro, so
    a 10⁶-gram document stays < 2·10¹³ ≪ 2⁵³.)
    The ratio table is ≤ n_buckets rows — broadcast by default; set
    ``broadcast_table=False`` past the broadcast budget (the join then
    shuffles only (bucket) keys of gram rows, never documents)."""
    occ = gram_buckets(df, text_col=text_col, id_col=id_col,
                       n_buckets=n_buckets)
    side = logratios.select("bucket", "lr_micro")
    if broadcast_table:
        side = F.broadcast(side)
    per = (
        occ.join(side, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("lr_micro"),
                             F.lit(int(unseen_lr_micro))))
            .cast("long").alias("weight_micro"),
        )
    )
    return (
        df.join(per, id_col, "left")
        .withColumn("n_grams", F.coalesce(F.col("n_grams"), F.lit(0)).cast("long"))
        .withColumn("weight_micro",
                    F.coalesce(F.col("weight_micro"), F.lit(0)).cast("long"))
        .withColumn(
            "weight_per_gram_micro",
            F.when(
                F.col("n_grams") > 0,
                F.floor(F.col("weight_micro") / F.col("n_grams")),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )


def dsir_select(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k most-target-like documents: (weight desc, id asc) — a
    total order, so the selection is deterministic under any
    partitioning; physical plan is TakeOrderedAndProject."""
    return weighted.orderBy(
        F.desc("weight_micro"), F.asc(id_col)
    ).limit(k)
