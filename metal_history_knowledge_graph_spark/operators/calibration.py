"""Score-calibration reliability bins — does a quality/classifier
score actually track the outcome it claims to predict? Every gating
score in a data pipeline (quality_clf log-odds, lm_score NLL,
heuristic quality) should ship with a reliability table before its
threshold goes into production; this is the generic equi-depth
binning report that produces one.

Binning is the deterministic floor formula ``bin = (rownum−1)·B div N
+ 1`` over the (score, id) total order — NOT SQL NTILE (NTILE's
remainder placement differs; the floor formula is engine-identical
and exactly replayable). The global row number comes from the
two-phase distributed sort (range partition → per-partition
row_number → broadcast offsets — the suffix.py/_global_dense_rank
pattern), never a single-reducer window. All outputs integer.

Reference parity note: the reference gates on fixed rule thresholds
(scripts/validation/quality_metrics.py) with no calibration check;
beyond-reference evaluation surface (SURVEY §6) next to
cluster_eval.py and the nDCG harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    bins: int = 10,
) -> DataFrame:
    """Per-bin reliability rows: ``(bin, n, n_pos, pos_rate_ppm,
    score_min, score_max, score_sum)`` for ``bins`` equi-depth bins of
    the integer ``score_col`` (ties broken by ``id_col`` — must be
    unique for a deterministic order), against boolean/0-1
    ``label_col``. NULL scores/labels are dropped."""
    rows = (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            F.col(score_col).cast("long").alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
            F.col(id_col).alias("_id"),
        )
    )
    p = rows.repartitionByRange("_s", "_id")
    w = Window.partitionBy("_pid").orderBy("_s", "_id")
    local = (
        p.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(w))
        .localCheckpoint(eager=True)  # feeds the count probe AND the join
    )
    counts = {
        r["_pid"]: r["n"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    if total == 0:
        return df.sparkSession.createDataFrame(
            [],
            "bin int, n long, n_pos long, pos_rate_ppm long,"
            " score_min long, score_max long, score_sum long",
        )
    offs, acc = [], 0
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(offs, "_pid int, _off long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "bin",
            (
                F.expr(f"(_off + _lr - 1) * {int(bins)} DIV {int(total)}")
                + 1
            ).cast("int"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.expr("CAST(sum(_y) * 1000000 DIV count(1) AS BIGINT)").alias(
                "pos_rate_ppm"
            ),
            F.min("_s").alias("score_min"),
            F.max("_s").alias("score_max"),
            F.sum("_s").cast("long").alias("score_sum"),
        )
    )
