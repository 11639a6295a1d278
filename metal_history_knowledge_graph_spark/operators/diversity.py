"""Corpus-composition concentration metrics — how dominated is a
training corpus by its biggest domains/sources? Dataset cards and
pretraining-mix audits (C4, The Pile, RefinedWeb) all report source
composition; the scheduling side (sampling.mix_sources,
q_temperature_mix) needs the same numbers to pick mixture weights.

Everything is exact integer arithmetic so a DuckDB oracle replays it
bit-identically:

- per-group ``share_ppm`` — floor(weight·10⁶ / total);
- ``simpson_ppm`` — the Simpson/Herfindahl concentration index
  Σ(wᵢ/W)² in ppm, computed as ``Σwᵢ² · 10⁶ div W²`` in
  DECIMAL(38,0) (token masses reach 10¹⁴ at 100 TB, so wᵢ² needs
  int128 — DuckDB HUGEINT);
- ``effective_groups_milli`` — the inverse-Simpson "effective number
  of domains" ×1000 (the standard diversity number: 10⁶ hosts at
  Simpson 0.01 behave like 100 equal ones).

(Shannon entropy is deliberately absent: it needs ln per group and
would drag in the trusted-export pattern for a metric Simpson already
proxies; lm_score.py documents that idiom where it's worth it.)

Scale shape: one partial-aggregated group-by to the vocabulary-sized
group table, one 1-row total via broadcast cross-join, one TakeOrdered
for the top-k slice. Nothing driver-side.

Reference parity note: no composition reporting exists in the
reference (single-source corpus); beyond-reference surface (SURVEY
§6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def group_weights(
    df: DataFrame, group_col: str, weight_col: str | None = None
) -> DataFrame:
    """``(group, weight)`` — row counts, or sums of ``weight_col``
    (NULL weights count 0); NULL groups dropped."""
    w = (
        F.coalesce(F.col(weight_col), F.lit(0)).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    return (
        df.filter(F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("group"), w.alias("_w"))
        .groupBy("group")
        .agg(F.sum("_w").alias("weight"))
    )


def group_shares(
    df: DataFrame, group_col: str, weight_col: str | None = None
) -> DataFrame:
    """``(group, weight, share_ppm)`` with ``share_ppm =
    weight·10⁶ div total``."""
    gw = group_weights(df, group_col, weight_col)
    tot = gw.agg(F.sum("weight").alias("_tot"))
    return gw.crossJoin(F.broadcast(tot)).select(
        "group",
        "weight",
        F.expr(
            "CAST(CAST(weight AS DECIMAL(38,0)) * 1000000"
            " DIV _tot AS BIGINT)"
        ).alias("share_ppm"),
    )


def concentration_report(
    df: DataFrame,
    group_col: str,
    weight_col: str | None = None,
    top_k: int = 10,
) -> DataFrame:
    """One row: ``(n_groups, total_weight, top1_share_ppm,
    top{k}_share_ppm, simpson_ppm, effective_groups_milli)``. Top-k
    mass is by weight desc with group-name tie-break (deterministic)."""
    gw = group_weights(df, group_col, weight_col).localCheckpoint(eager=True)
    top = (
        gw.orderBy(F.desc("weight"), "group")
        .limit(top_k)
        .agg(F.sum("weight").alias("_topw"))
    )
    top1 = (
        gw.orderBy(F.desc("weight"), "group")
        .limit(1)
        .agg(F.sum("weight").alias("_top1w"))
    )
    agg = gw.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("weight").alias("total_weight"),
        F.sum(
            F.col("weight").cast("decimal(38,0)") * F.col("weight")
        ).alias("_sq"),
    )
    return (
        agg.crossJoin(F.broadcast(top1))
        .crossJoin(F.broadcast(top))
        .select(
            "n_groups",
            F.col("total_weight").cast("long").alias("total_weight"),
            F.expr(
                "CAST(CAST(_top1w AS DECIMAL(38,0)) * 1000000"
                " DIV total_weight AS BIGINT)"
            ).alias("top1_share_ppm"),
            F.expr(
                "CAST(CAST(_topw AS DECIMAL(38,0)) * 1000000"
                " DIV total_weight AS BIGINT)"
            ).alias(f"top{top_k}_share_ppm"),
            F.expr(
                "CAST(_sq * 1000000 DIV (CAST(total_weight AS DECIMAL(38,0))"
                " * total_weight) AS BIGINT)"
            ).alias("simpson_ppm"),
        )
        .withColumn(
            "effective_groups_milli",
            F.expr(
                "CASE WHEN simpson_ppm = 0 THEN 0"
                " ELSE CAST(1000000000 DIV simpson_ppm AS BIGINT) END"
            ),
        )
    )
