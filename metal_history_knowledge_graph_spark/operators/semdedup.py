"""SemDeDup — semantic deduplication via embedding clusters (Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540 — the public method behind
embedding-level dedup of LAION/C4-scale corpora).

Method: k-means-cluster the embeddings, compute pairwise cosine only
WITHIN each cluster, connect pairs above a threshold into duplicate
groups, and keep exactly one representative per group. The clustering
is what makes it tractable: the O(n²) pair work shrinks to
O(Σ cluster_size²), and cross-cluster near-dups are *deliberately*
missed (the paper's accepted trade — two texts whose embeddings land
in different k-means cells are not semantic duplicates at the
resolution the quantizer defines).

Representative election (``rep_rule``):

* ``"low_centroid_sim"`` — the paper's rule: keep the group member
  LEAST similar to its cluster centroid (retains the most atypical
  exemplar, pruning the redundant core). Ties → smallest id.
* ``"min_id"`` — smallest id wins. Decision-equivalent grouping with
  a float-free election; this is what the driver-facing oracle query
  uses, because electing by a 1-ulp-sensitive float ORDER would make
  the cross-engine hash flaky while the grouping decision itself is
  robust (the q_cosine_neardup membership-only convention). The
  centroid-sim rule is pinned against a pure-Python replay in pytest.

Reuses the repo's spherical k-means (:func:`simsearch.ivf_build` —
deterministic init, bit-exact left-fold dots) so a SemDeDup pass and
an IVF ANN index can share one quantizer at scale.

Scale shape (100 TB): clustering is ivf_build's shape (broadcast
centroids, fixed-size recompute shuffle); the pair join shuffles on
``cluster`` only and its cost is the paper's Σ c_i² — hold avg cluster
size constant by scaling ``n_clusters`` ∝ corpus size (the paper uses
k = 110k for LAION-440M ≈ 4k vecs/cluster); duplicate groups are
sparse edges fed to the existing components machinery; election is a
per-group min-struct aggregate. Nothing is all-pairs globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph_algos import graph_components
from .simsearch import _dot, ivf_assign_new, ivf_build, with_l2_normalized


def semdedup_pairs(
    assigned: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a, id_b, cluster) — within-cluster pairs with 4dp-rounded
    unit-vector cosine ≥ ``threshold`` (id_a < id_b). The join key is
    ``cluster``, so the shuffle is cluster-partitioned and the pair
    blow-up is bounded per cluster, never global."""
    normed = with_l2_normalized(assigned, vec_col).select(
        F.col(id_col).alias("_id"), "cluster", "unit_vec"
    )
    a, b = normed.alias("a"), normed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .withColumn(
            "cosine",
            F.round(_dot(F.col("a.unit_vec"), F.col("b.unit_vec")), 4),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.cluster").alias("cluster"),
        )
    )


def semdedup(
    df: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 3,
    rep_rule: str = "low_centroid_sim",
) -> tuple[DataFrame, list[list[float]]]:
    """Returns ``(decisions, centroids)``. ``decisions`` has one row
    per input vector:

    * ``cluster``   — k-means cell (BIGINT)
    * ``group_rep`` — elected representative's id (BIGINT; singletons
      represent themselves)
    * ``group_size``— members in the duplicate group (BIGINT, ≥ 1)
    * ``keep_flag`` — 1 if this row IS the representative else 0

    ``centroids`` is the quantizer (export it for oracle replay /
    incremental assignment of later batches via ivf_assign_new)."""
    if rep_rule not in ("low_centroid_sim", "min_id"):
        raise ValueError(f"unknown rep_rule {rep_rule!r}")
    centroids, assigned = ivf_build(
        df, n_centroids=n_clusters, n_iters=n_iters,
        vec_col=vec_col, id_col=id_col,
    )
    # pair lineage feeds both the components probe and the group join
    pairs = semdedup_pairs(
        assigned, threshold, vec_col=vec_col, id_col=id_col
    ).localCheckpoint(eager=True)
    comp = graph_components(
        pairs.select(
            F.col("id_a").alias("subj_id"), F.col("id_b").alias("obj_id")
        )
    )

    cent_arr = F.array(*[F.array(*[F.lit(v) for v in c]) for c in centroids])
    scored = with_l2_normalized(assigned, vec_col).select(
        F.col(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.round(
            _dot(F.col("unit_vec"), F.element_at(cent_arr, F.col("cluster").cast("int") + 1)),
            4,
        ).alias("centroid_sim"),
    )
    member = scored.join(
        comp.withColumnRenamed("node_id", id_col), id_col, "left"
    )
    if rep_rule == "low_centroid_sim":
        # lexicographic struct-min = (sim asc, id asc) — the paper's
        # "least similar to centroid" with a deterministic tie-break
        elect = F.min(F.struct(F.col("centroid_sim"), F.col(id_col))) \
            .getField(id_col)
    else:
        elect = F.min(id_col)
    reps = (
        member.filter(F.col("component_id").isNotNull())
        .groupBy("component_id")
        .agg(
            elect.cast("long").alias("group_rep"),
            F.count(F.lit(1)).cast("long").alias("group_size"),
        )
    )
    out = (
        member.join(reps, "component_id", "left")
        .select(
            F.col(id_col),
            "cluster",
            "centroid_sim",
            F.coalesce(F.col("group_rep"), F.col(id_col).cast("long")).alias("group_rep"),
            F.coalesce(F.col("group_size"), F.lit(1).cast("long")).alias("group_size"),
        )
        .withColumn(
            "keep_flag",
            F.when(F.col(id_col) == F.col("group_rep"), F.lit(1))
            .otherwise(F.lit(0)).cast("long"),
        )
    )
    return out, centroids


def semdedup_probe(
    new_batch: DataFrame,
    centroids: list[list[float]],
    corpus_assigned: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Growing-corpus maintenance path (the td_minhash_probe /
    ivf_assign_new pattern): admit a NEW batch against an EXISTING
    SemDeDup'd corpus without re-clustering or re-pairing the corpus.

    The batch is quantized against the FROZEN centroids
    (ivf_assign_new — same argmax-dot rule as the build), then paired
    only against corpus members of the clusters the batch actually
    touches (with the corpus table partitioned by ``cluster`` the
    untouched lists are never read — partition pruning), plus
    batch-internal pairs so intra-batch duplicates collapse too.

    Returns one decision row per batch vector: ``cluster``,
    ``dup_of`` (smallest DIRECTLY-similar corpus id, NULL if none),
    ``is_new_rep`` (1 = no direct corpus match AND no directly-similar
    smaller-id batch member — the row to append to the corpus). This
    is the standard greedy online-dedup rule (the td_minhash_probe
    contract): decisions are per-EDGE, deliberately not transitive-
    closure — closure over an unbounded stream would need global
    rebuilds. Identity with a monolithic pair join over frozen
    centroids is pinned in tests: dup_of and the greedy election match
    exactly what the rebuild's within-cluster pair set implies for the
    batch ids."""
    fresh = ivf_assign_new(new_batch, centroids, vec_col)
    both = fresh.select(
        F.col(id_col), "cluster",
        F.lit(True).alias("_is_new"), F.col(vec_col),
    ).unionByName(
        corpus_assigned
        .join(
            fresh.select("cluster").distinct(), "cluster", "left_semi"
        )
        .select(
            F.col(id_col), "cluster",
            F.lit(False).alias("_is_new"), F.col(vec_col),
        )
    )
    normed = with_l2_normalized(both, vec_col).select(
        F.col(id_col).alias("_id"), "cluster", "_is_new", "unit_vec"
    )
    a, b = normed.alias("a"), normed.alias("b")
    hits = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a._id") != F.col("b._id"))
            & F.col("a._is_new"),
        )
        .withColumn(
            "cosine",
            F.round(_dot(F.col("a.unit_vec"), F.col("b.unit_vec")), 4),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a._id").alias("new_id"),
            F.col("b._id").alias("other_id"),
            F.col("b._is_new").alias("other_is_new"),
        )
    )
    corpus_hit = (
        hits.filter(~F.col("other_is_new"))
        .groupBy("new_id")
        .agg(F.min("other_id").cast("long").alias("dup_of"))
    )
    # intra-batch grouping: min-id among mutually-similar NEW vectors
    batch_min = (
        hits.filter(F.col("other_is_new"))
        .groupBy("new_id")
        .agg(F.min("other_id").alias("_peer_min"))
    )
    return (
        fresh.select(F.col(id_col), F.col("cluster").cast("long").alias("cluster"))
        .join(corpus_hit.withColumnRenamed("new_id", id_col), id_col, "left")
        .join(batch_min.withColumnRenamed("new_id", id_col), id_col, "left")
        .withColumn(
            "is_new_rep",
            F.when(
                F.col("dup_of").isNull()
                & (F.col("_peer_min").isNull()
                   | (F.col("_peer_min") > F.col(id_col))),
                F.lit(1),
            ).otherwise(F.lit(0)).cast("long"),
        )
        .drop("_peer_min")
    )
