"""HyperLogLog — bounded-state cardinality estimation (Flajolet et
al. 2007) completing the repo's mergeable-sketch triad: Bloom
(membership, operators/bloom.py), count-min (frequency,
operators/cms.py), HLL (distinct count). Use it where
``count(distinct)`` would shuffle the full key universe: per-domain
unique URLs, per-shard unique n-grams, cross-crawl visitor overlap —
at 100 TB an exact distinct over 10¹² keys is a key-universe-sized
exchange, while the HLL register table is ≤ 2^p rows for ANY input
and sketches of two shards merge with a register-wise max.

The sketch is a *sparse register table* ``(register, maxrho)``:
md5-derived 60-bit hashes (the repo's cross-engine hash pattern,
sampling.md5_mod) — low ``p`` bits pick the register, the remaining
48 bits' leading-zero count (+1) is rho. Build is one narrow map +
one (register)-keyed partial-agg max: 10¹² occurrences reduce to
≤ 2^p rows per partition before the exchange.

Exactness discipline (the LM-score pattern): everything the driver
oracle compares is BIGINT — registers, rho (via the binary-string
length of the 48-bit remainder, ``conv(v,10,2)`` / DuckDB ``bin(v)``,
identical digit strings), and the estimator's integer core
S = Σ_j 2^(49−M_j) (a dyadic-rational sum scaled by 2^49 — exact in
64 bits: 2^12 registers × 2^49 < 2^63). The float-valued final
estimate α_m·m²·2^49/S stays OUT of the oracle and is pinned in
pytest against the Python formula and against true cardinalities
(within the 1.04/√m theoretical error).

Reference analogue: the corpus-stats family (chunk/entity counting in
scripts/analysis) — re-expressed as mergeable bounded state instead
of exact global aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash bits taken from md5 (BIGINT-safe, same budget as bloom/cms)
HASH_BITS = 60
#: rho operates on the (HASH_BITS - p) low-order remainder bits; with
#: the default p=12 that is 48, so rho ∈ [1, 49]
_PREFIX = "hll|"


def _hash60(key: Column) -> Column:
    """60-bit md5-derived hash (DuckDB: ('0x' || substr(md5('hll|' ||
    key), 1, 15))::UBIGINT)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_PREFIX), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def hll_build(
    df: DataFrame, key_col: str, p: int = 12, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Sparse register table ``(*group_cols, register, maxrho)`` —
    the sketch of ``count(distinct key_col)`` (per group when
    ``group_cols`` given). Absent registers mean maxrho = 0."""
    m = 1 << p
    rem_bits = HASH_BITS - p
    src = df.select(*group_cols, _hash60(F.col(key_col)).alias("h"))
    # rho = leading zeros of the rem_bits-wide remainder, + 1:
    # rem_bits − (floor(log2(v)) + 1) + 1 computed EXACTLY via the
    # binary-string length (conv never goes through floats);
    # v = 0 → all bits zero → rho = rem_bits + 1
    return (
        src.select(
            *group_cols,
            (F.col("h") % m).alias("register"),
            F.when(F.expr(f"h div {m}") == 0, F.lit(rem_bits + 1))
            .otherwise(
                F.lit(rem_bits + 1)
                - F.length(F.conv(F.expr(f"h div {m}"), 10, 2))
            )
            .cast("int")
            .alias("rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("maxrho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch union: register-wise max — HLL(A ∪ B). Associative and
    idempotent, so shard sketches fold in any order."""
    keys = [c for c in a.columns if c != "maxrho"]
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(F.max("maxrho").alias("maxrho"))
    )


def hll_integer_core(
    sketch: DataFrame, p: int = 12, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The estimator's EXACT integer core per group:

    * ``n_present`` — registers with at least one observation
    * ``v_zero``   — m − n_present (the linear-counting input)
    * ``s_scaled`` — Σ_j 2^(rem_bits+1−M_j) over ALL m registers
      (absent ⇒ M_j = 0 ⇒ term 2^(rem_bits+1)), i.e. 2^49·Σ 2^(−M_j)

    All BIGINT, shuffle-order-independent — this is what the driver
    oracle compares; hll_estimate turns it into the float estimate."""
    m = 1 << p
    rem_bits = HASH_BITS - p
    full = F.lit(1 << (rem_bits + 1)).cast("bigint")
    return (
        sketch.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_present"),
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {rem_bits + 1} - maxrho)"
                )
            ).cast("long").alias("s_present"),
        )
        .select(
            *group_cols,
            "n_present",
            (F.lit(m) - F.col("n_present")).cast("long").alias("v_zero"),
            (
                F.col("s_present")
                + (F.lit(m) - F.col("n_present")) * full
            ).cast("long").alias("s_scaled"),
        )
    )


def hll_sliding_distinct(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    window: int = 7,
    p: int = 12,
) -> DataFrame:
    """Sliding-window distinct counts from MERGEABLE per-bucket
    sketches — the reason HLL beats exact distinct at scale: per
    integer time bucket (day, hour — caller buckets upstream) build
    one sketch; every window is then a register-max union of ≤
    ``window`` bucket sketches, so a 90-day dashboard over a year of
    10¹⁰ events re-reads 365 sketch rows-of-registers, never the
    events. One row per window END bucket present in the data:
    ``(bucket, n_buckets, n_present, v_zero, s_scaled)`` — the exact
    integer estimator core (``hll_estimate`` turns it into the float
    estimate), ``n_buckets`` = contributing buckets actually present.

    Per-window unions are a bucket range join over the
    vocabulary-sized sketch table (buckets × window rows) followed by
    one register-max partial agg — no shuffle of the raw events
    beyond the initial per-bucket build."""
    sk = hll_build(df, key_col, p, group_cols=(bucket_col,)).localCheckpoint(
        eager=True
    )
    ends = sk.select(F.col(bucket_col).alias("_end")).distinct()
    joined = sk.join(
        ends,
        (F.col(bucket_col) <= F.col("_end"))
        & (F.col(bucket_col) > F.col("_end") - window),
    )
    merged = joined.groupBy("_end", "register").agg(
        F.max("maxrho").alias("maxrho")
    )
    nb = (
        joined.select("_end", bucket_col)
        .distinct()
        .groupBy("_end")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
    )
    core = hll_integer_core(merged, p, group_cols=("_end",))
    return core.join(nb, "_end").select(
        F.col("_end").alias(bucket_col),
        "n_buckets",
        "n_present",
        "v_zero",
        "s_scaled",
    )


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate(
    core: DataFrame, p: int = 12, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(group, estimate) from the integer core: raw HLL estimate
    α_m·m²·2^(rem+1)/s_scaled, with Flajolet's small-range linear
    counting (m·ln(m/V) when E ≤ 2.5m and V > 0). Float-valued — kept
    out of the driver oracle, pinned in pytest."""
    m = 1 << p
    rem_bits = HASH_BITS - p
    scale = float(_alpha(m)) * m * m * float(1 << (rem_bits + 1))
    raw = F.lit(scale) / F.col("s_scaled").cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero").cast("double")),
    ).otherwise(raw)
    return core.select(
        *group_cols, F.round(est, 2).alias("estimate")
    )


def hll_estimate_py(n_present: int, v_zero: int, s_scaled: int, p: int = 12) -> float:
    """Pure-Python reference of hll_estimate — the pytest pin."""
    m = 1 << p
    rem_bits = HASH_BITS - p
    raw = _alpha(m) * m * m * float(1 << (rem_bits + 1)) / float(s_scaled)
    if raw <= 2.5 * m and v_zero > 0:
        return m * math.log(m / v_zero)
    return raw
