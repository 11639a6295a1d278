"""First-order Markov model of user event streams — the navigation
model behind funnel diagnosis and next-action prediction: count
consecutive (state → next state) transitions per user (ts order,
event-id tie-break), row-normalize to integer micro-probabilities,
and push a mass vector k steps forward. The event-type state space
is vocabulary-sized, so the transition table is tiny relative to the
log; all heavy work is one per-user ordered pass.

Determinism / oracle: probabilities are ``count·10⁶ div row_total``
(floor), and each propagation step floors per (source, target) term
before summing — order-independent BIGINT arithmetic a DuckDB oracle
replays with chained CTEs (one per step, the pagerank-replay idiom).
Mass therefore leaks ≤ 1 micro-unit per term per step (documented,
deterministic) rather than accumulating float drift.

Scale shape: the transition count is ONE user-partitioned window
(lead over (ts, id) — keyed by user, never global) plus a partial
agg to the vocabulary²-bounded table; each k-step propagation is a
join against that small table (broadcast when it fits). NULL
users/states/timestamps drop out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """``(s1, s2, n, p_micro)`` — consecutive-transition counts per
    user stream and the row-normalized probability in micro-units
    (``Σ_s2 p_micro(s1,·) ≤ 10⁶``, short by at most the number of
    distinct successors due to flooring)."""
    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    rows = (
        events.filter(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(state_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            F.col(state_col).alias("s1"),
        )
        .withColumn("s2", F.lead("s1").over(w))
        .filter(F.col("s2").isNotNull())
    )
    counts = rows.groupBy("s1", "s2").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("s1").agg(F.sum("n").alias("_tot"))
    return counts.join(totals, "s1").select(
        "s1",
        "s2",
        "n",
        F.expr(f"n * {MICRO} div _tot").cast("long").alias("p_micro"),
    )


def markov_k_step(
    trans: DataFrame, start_state: str, k: int = 3
) -> DataFrame:
    """Mass distribution after ``k`` transitions from ``start_state``
    (initial mass 10⁶): ``(state, mass_micro)``, states with zero
    mass omitted. Each step: ``mass'(s2) = Σ_s1 (mass(s1) ·
    p_micro(s1,s2)) div 10⁶`` with per-term flooring — exact BIGINT,
    replayable. Dead-end states (no outgoing transitions) drop their
    mass, matching the row-normalization domain."""
    if k < 0:
        raise ValueError(f"k must be >= 0: {k}")
    spark = trans.sparkSession
    mass = spark.createDataFrame(
        [(start_state, MICRO)], "state string, mass_micro long"
    )
    t = trans.select(
        F.col("s1").alias("state"), "s2", "p_micro"
    ).localCheckpoint(eager=True)
    for _ in range(k):
        mass = (
            mass.join(t, "state")
            .select(
                F.col("s2").alias("state"),
                F.expr(f"(mass_micro * p_micro) div {MICRO}").alias("_m"),
            )
            .groupBy("state")
            .agg(F.sum("_m").cast("long").alias("mass_micro"))
            .filter(F.col("mass_micro") > 0)
            .localCheckpoint(eager=True)
        )
    return mass
