"""AMS (Alon-Matias-Szegedy) tug-of-war sketches: second frequency
moment (F2) and join-size estimation — the query-planning primitives
the other sketches don't give. CMS answers point counts, HLL distinct
counts; F2 = Σ f(x)² measures REPEAT-HEAVINESS (self-join size), and
the inner product Σ f_A(x)·f_B(x) IS the equi-join cardinality — the
number a planner wants BEFORE paying for the shuffle, and a pipeline
wants when deciding whether a dedup/join stage is worth partitioning
differently.

Sketch: k independent counters Z_j = Σ_x f(x)·s_j(x) with 4-wise-ish
sign hashes s_j(x) ∈ {−1, +1}. E[Z_j²] = F2; E[Z_j^A · Z_j^B] =
Σ f_A f_B. The estimator is the MEDIAN over the k estimates (the
classic variance-taming trick, and deterministic — no mean/float).

Determinism / oracle design: s_j(x) = parity of the first hex nibble
of ``md5(j || ':' || x)`` — md5 is the engine-portable hash every
deterministic operator here uses (sampling, HRW, dedup keys), so the
DuckDB oracle replays the ENTIRE sketch: same signs, same sums, same
median, same integer ppm error report. No tolerance compare for an
approximate algorithm — the decision function itself is exact.

Scale shape: ONE narrow pass per table — the k sign expressions are
k sum aggregates inside a single partial agg (map-side combined, no
explode, no shuffle beyond the 1-row result). Sketches are k-integer
rows: mergeable across shards by plain addition (Z is a sum), the
bloom/cms/hll discipline. |Z| ≤ N keeps Z² under 2^63 up to N ~ 3·10⁹
rows per shard; beyond that keep per-shard sketches and merge (the
intended deployment anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex nibbles with odd parity — sign(+1) lane of the md5 sign hash.
_ODD_NIBBLES = ["1", "3", "5", "7", "9", "b", "d", "f"]


def ams_sign(col: Column, seed: int) -> Column:
    """±1 sign for (seed, value): parity of md5's first hex nibble."""
    nib = F.substring(
        F.md5(F.concat(F.lit(str(seed)), F.lit(":"), col.cast("string"))),
        1,
        1,
    )
    return F.when(nib.isin(_ODD_NIBBLES), F.lit(1)).otherwise(F.lit(-1))


def ams_sketch(
    df: DataFrame, col: str, n_estimators: int = 9
) -> DataFrame:
    """(j, z): the k tug-of-war counters of ``col``'s frequency
    vector, in one aggregate pass. NULLs are skipped (no frequency).
    Merge shards by summing z per j."""
    if n_estimators < 1:
        raise ValueError(f"n_estimators must be >= 1, got {n_estimators}")
    c = F.col(col)
    sums = df.filter(c.isNotNull()).agg(
        *[
            F.sum(ams_sign(c, j)).cast("long").alias(f"z{j}")
            for j in range(n_estimators)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                F.coalesce(F.col(f"z{j}"), F.lit(0)).alias("z"),
            )
            for j in range(n_estimators)
        ]
    )
    return sums.select(F.explode(pairs).alias("p")).select("p.j", "p.z")


def _median_of(df: DataFrame, col: str) -> DataFrame:
    """One-row frame holding the exact order-statistic median (rank
    ⌈k/2⌉, ties by j) of a k-row estimator column — k is the
    estimator count, so the unpartitioned window is k-row bounded."""
    n = df.count()
    rank = max(1, -(-n // 2))  # ceil(n/2)
    from pyspark.sql import Window

    w = Window.orderBy(F.col(col), F.col("j"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == rank)
        .select(col)
    )


def f2_estimate(df: DataFrame, col: str, n_estimators: int = 9) -> DataFrame:
    """One row: (f2_est, f2_exact, err_ppm) — the median-of-Z² F2
    estimate next to the exact Σf² ground truth and the integer ppm
    error, so the report IS the accuracy audit. The exact pass is one
    (value)-keyed count agg — drop it at true scale and keep only the
    estimate (the point of the sketch); here it powers the oracle."""
    sk = ams_sketch(df, col, n_estimators).withColumn(
        "zsq", F.col("z") * F.col("z")
    )
    est = _median_of(sk, "zsq").select(
        F.col("zsq").cast("long").alias("f2_est")
    )
    exact = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("f2_exact"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "f2_est",
        "f2_exact",
        F.expr("abs(f2_est - f2_exact) * 1000000 div f2_exact")
        .cast("long")
        .alias("err_ppm"),
    )


def join_size_estimate(
    a: DataFrame, a_col: str, b: DataFrame, b_col: str,
    n_estimators: int = 9,
) -> DataFrame:
    """One row: (join_est, join_exact, err_ppm) — median of Z_j^A·Z_j^B
    estimates |A ⋈ B| on the key, against the exact Σ f_A·f_B ground
    truth (one grouped count per side + a vocabulary-sized join —
    again: the audit lane, not the production lane)."""
    sa = ams_sketch(a, a_col, n_estimators).withColumnRenamed("z", "za")
    sb = ams_sketch(b, b_col, n_estimators).withColumnRenamed("z", "zb")
    prod = sa.join(sb, "j").withColumn("zz", F.col("za") * F.col("zb"))
    est = _median_of(prod, "zz").select(
        F.col("zz").cast("long").alias("join_est")
    )
    fa = a.filter(F.col(a_col).isNotNull()).groupBy(
        F.col(a_col).alias("k")
    ).agg(F.count(F.lit(1)).alias("fa"))
    fb = b.filter(F.col(b_col).isNotNull()).groupBy(
        F.col(b_col).alias("k")
    ).agg(F.count(F.lit(1)).alias("fb"))
    exact = fa.join(fb, "k").agg(
        F.sum(F.col("fa") * F.col("fb")).cast("long").alias("join_exact")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "join_est",
        "join_exact",
        F.expr("abs(join_est - join_exact) * 1000000 div join_exact")
        .cast("long")
        .alias("err_ppm"),
    )
