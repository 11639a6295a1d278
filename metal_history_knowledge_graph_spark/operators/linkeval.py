"""Link-prediction evaluation harness: deterministic negative-edge
sampling and exact rank-sum AUC — the measurement half that turns the
link-prediction scorers (operators/graph_algos.link_prediction's
common-neighbor/Jaccard scores, q_link_pred) into a graded benchmark,
the same role q_search_quality / q_ndcg play for retrieval.

Negative sampling: the classic eval protocol needs non-edges drawn
uniformly-ish and REPRODUCIBLY (a re-run must score the same pairs —
``df.sample`` over an N² pair space is both impossible to materialize
and partitioning-dependent). Here each node proposes ``k`` candidate
partners by md5 arithmetic into a dense node index (one dense_rank
window over the vocabulary-sized node dim — never the corpus), the
proposals anti-join the real edge set (and self-pairs), and the
deterministic md5 rank cuts the requested sample size. Every step is
engine-portable arithmetic → full DuckDB replay.

AUC: exact Mann-Whitney, no trapezoids, no floats::

    AUC_ppm = (Σ rank(positives) − P(P+1)/2) · 10⁶ div (P·N)

with ties resolved by a TOTAL deterministic order (score DESC is
ranked ascending-by-score so the formula reads naturally; ties broken
by the pair key so both engines rank identically — documented: tied
scores get key order, the bit-exact convention, rather than the
half-credit mid-rank convention). One window over the EVAL set
(positives + sampled negatives — thousands of rows, never a corpus
object), one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pair_key(a, b):
    return F.concat(a.cast("string"), F.lit("|"), b.cast("string"))


def negative_edges(
    edges: DataFrame,
    per_node: int = 4,
    sample: int | None = None,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
) -> DataFrame:
    """(src, dst): deterministic NON-edges of the graph —
    ``per_node`` md5-indexed proposals per source node; self-pairs and
    real edges IN EITHER DIRECTION are anti-joined away (the scorers
    this feeds — common neighbors, Jaccard — are undirected, so the
    reverse of a real edge must not enter the negative sample: it
    would carry a positive's score with a negative's label and
    depress every AUC). When ``sample`` is given, the md5-smallest
    ``sample`` pairs are kept. Proposal i of node v targets the node
    at dense index ``md5(v|i) mod n`` — collisions with real edges
    simply thin the sample (documented; raise ``per_node`` for dense
    graphs)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    idx = nodes.withColumn(
        "i", F.dense_rank().over(Window.orderBy("node")).cast("long") - 1
    )
    n = idx.count()
    if n == 0:
        # empty edge table → no nodes: return an empty (src, dst)
        # frame with the contract schema instead of letting the
        # `% n` below divide by zero at plan time (ADVICE r4 #1)
        return e.select("src", "dst").limit(0)
    props = (
        idx.select(F.col("node").alias("src"))
        .crossJoin(
            F.broadcast(
                idx.sparkSession.range(per_node).select(
                    F.col("id").alias("trial")
                )
            )
        )
        .select(
            "src",
            (
                F.conv(
                    F.substring(
                        F.md5(_pair_key(F.col("src"), F.col("trial"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long")
                % n
            ).alias("dst_i"),
        )
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    cand = (
        props.join(
            F.broadcast(
                idx.select(F.col("i").alias("dst_i"), F.col("node").alias("dst"))
            ),
            "dst_i",
        )
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .join(sym, ["src", "dst"], "left_anti")
    )
    if sample is not None:
        cand = (
            cand.withColumn(
                "_r", F.md5(_pair_key(F.col("src"), F.col("dst")))
            )
            .orderBy("_r")
            .limit(sample)
            .drop("_r")
        )
    return cand


def score_common_neighbors(
    pairs: DataFrame,
    edges: DataFrame,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
) -> DataFrame:
    """Attach the undirected common-neighbor count as ``score`` to a
    (src, dst, …) candidate table — the same signal
    ``graph_algos.link_prediction`` ranks by, here evaluated on an
    ARBITRARY labeled pair set instead of all non-adjacent pairs (the
    eval harness needs scores for positives too). Two keyed joins on
    the symmetric adjacency (wedge closing per candidate endpoint
    pair) + one pair-keyed count; no all-pairs anything."""
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    cn = (
        pairs.select("src", "dst")
        .join(sym.select(F.col("a").alias("src"), F.col("b").alias("w")), "src")
        .join(
            sym.select(F.col("a").alias("dst"), F.col("b").alias("w")),
            ["dst", "w"],
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("_cn"))
    )
    return pairs.join(cn, ["src", "dst"], "left").withColumn(
        "score", F.coalesce("_cn", F.lit(0)).cast("long")
    ).drop("_cn")


def auc_ppm(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    key_cols: tuple[str, str] = ("src", "dst"),
) -> DataFrame:
    """One row (n_pos, n_neg, auc_ppm): exact Mann-Whitney AUC of the
    labeled score table in integer ppm. Ranks ascend by (score, key),
    so a tied block credits by key order — deterministic on any
    engine (the convention both sides replay; use distinct scores for
    the textbook value)."""
    a, b = key_cols
    w = Window.orderBy(F.col(score_col), F.col(a), F.col(b))
    r = scored.withColumn("_rank", F.row_number().over(w).cast("long"))
    return r.agg(
        F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        F.sum(1 - F.col(label_col).cast("long")).alias("n_neg"),
        F.sum(
            F.when(F.col(label_col) == 1, F.col("_rank")).otherwise(F.lit(0))
        ).alias("_rs"),
    ).select(
        "n_pos",
        "n_neg",
        F.expr(
            "(( _rs - (n_pos * (n_pos + 1)) div 2) * 1000000)"
            " div (n_pos * n_neg)"
        )
        .cast("long")
        .alias("auc_ppm"),
    )
