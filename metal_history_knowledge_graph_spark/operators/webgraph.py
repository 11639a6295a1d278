"""Directed web-graph structure: strongly connected components,
condensation DAG, and Broder bow-tie classification.

The reference's analysis family (scripts/analysis/graph_metrics.py)
treats the knowledge graph as undirected and hands components /
centrality to NetworkX; the DIRECTED macro-structure of a crawled link
graph — which hosts form the mutually-reachable CORE, which only feed
into it (IN), which are only fed by it (OUT) — is the classic web-graph
question (Broder et al. 2000, "Graph structure in the Web") and is what
a crawl planner reads to decide where seeds and recrawl budget go.

SCC is the forward-backward min-label coloring peel (the BSP/MapReduce
formulation of Orzan's coloring, cf. the MultiStep SCC literature):
per peel round, propagate the minimum reachable node id FORWARD (f)
and BACKWARD (b) to fixed point over the active subgraph. Within one
SCC every member has the same forward-reachable set and the same
backward-reachable set, so f and b are SCC-constant; and f(v) == b(v)
== c means c reaches v AND v reaches c, i.e. v ∈ SCC(c) with c = the
smallest member (c ≤ min(SCC) because c is reachable from inside, and
min(SCC) both reaches and is reached by v so f,b ≤ min(SCC)). Whole
SCCs therefore peel together — at minimum the SCC holding the smallest
active id each round — and ``scc_id = min member id`` is a pure
function of the graph, independent of peel order. That is what makes a
DECISION oracle possible: DuckDB replays the *definition* (recursive-
CTE transitive closure + mutual-reachability min), not the trajectory.

Scale shape (100 TB edge tables): every step is a node-keyed equi-join
+ min partial agg; labels only DECREASE, so the convergence probe is a
``limit(1)`` count on (new < old) — no full-table comparison action.
No windows over unbounded partitions, no driver collect of node/edge
sets, no per-node neighbour arrays. ``localCheckpoint`` truncates the
iterative lineage every round (CLAUDE.md two-consumer rule). The known
weakness of coloring SCC — a condensation CHAIN peels one level per
round — is bounded by ``max_peel`` and RAISES rather than silently
returning a partial assignment; real web host graphs are macro-shallow
(the bow-tie has O(1) levels), and deep chains should be trimmed
upstream (drop in-degree-0/out-degree-0 hosts iteratively) before SCC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _directed_pairs(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("subj_id").alias("src"), F.col("obj_id").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _min_label_fixpoint(
    lab: DataFrame,
    e: DataFrame,
    forward: bool,
    max_hops: int,
    probe_every: int = 3,
) -> DataFrame:
    """Converge ``lab(v) = min(seed(v), min over seeds of nodes
    reachable from v)`` along (``forward=True``) or against
    (``forward=False``) edge direction.

    ``lab``: (v, lab) seed table; ``e``: (src, dst) directed pairs.
    One node-keyed join + min agg per hop. ``probe_every`` hops are
    chained LAZILY between one checkpoint + one convergence probe —
    labels are pointwise monotone non-increasing, so lab_{t+k} == lab_t
    forces equality at every step in between, making the batched probe
    exactly as sound as a per-hop probe while cutting driver actions
    (the critical path of iterative graph work at web scale) by ~k×.
    Raises on non-convergence — a wrong-but-plausible reachability
    labeling is worse than an error.
    """
    here, there = ("src", "dst") if forward else ("dst", "src")

    def one_hop(cur: DataFrame) -> DataFrame:
        nbr = (
            e.join(
                cur.select(F.col("v").alias(there), F.col("lab").alias("nl")),
                there,
            )
            .groupBy(F.col(here).alias("v"))
            .agg(F.min("nl").alias("nl"))
        )
        return cur.join(nbr, "v", "left").select(
            "v",
            F.least(
                F.col("lab"), F.coalesce(F.col("nl"), F.col("lab"))
            ).alias("lab"),
        )

    hops = 0
    while hops < max_hops:
        new = lab
        for _ in range(min(probe_every, max_hops - hops)):
            new = one_hop(new)
            hops += 1
        new = new.localCheckpoint(eager=True)
        changed = (
            new.join(lab.select("v", F.col("lab").alias("old")), "v")
            .filter(F.col("lab") < F.col("old"))
            .limit(1)
            .count()
        )
        lab = new
        if changed == 0:
            return lab
    raise ValueError(
        f"min-label propagation did not converge within {max_hops} hops; "
        "raise max_hops (bound = longest shortest path to the minimum "
        "reachable node)"
    )


def strongly_connected_components(
    edges: DataFrame, max_peel: int = 25, max_hops: int = 64
) -> DataFrame:
    """(node_id, scc_id) for every node appearing in the edge table,
    with ``scc_id`` = the smallest member id (canonical — a pure
    function of the graph; see module docstring for the peel proof).

    ``max_peel`` bounds coloring rounds (≥ the condensation DAG's
    level count); ``max_hops`` bounds each round's label propagation
    (≥ the active subgraph's directed diameter). Both RAISE on
    exhaustion rather than return a partial assignment.
    """
    e = _directed_pairs(edges).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    empty = nodes.select("v", F.col("v").alias("scc_id")).limit(0)
    assigned: DataFrame | None = None
    for _ in range(max_peel):
        if nodes.limit(1).count() == 0:
            break
        seed = nodes.select("v", F.col("v").alias("lab"))
        f = _min_label_fixpoint(seed, e, forward=True, max_hops=max_hops)
        b = _min_label_fixpoint(seed, e, forward=False, max_hops=max_hops)
        done = (
            f.join(b.select("v", F.col("lab").alias("blab")), "v")
            .filter(F.col("lab") == F.col("blab"))
            .select("v", F.col("lab").alias("scc_id"))
            .localCheckpoint(eager=True)
        )
        assigned = (
            done if assigned is None else assigned.unionByName(done)
        ).localCheckpoint(eager=True)
        nodes = nodes.join(done, "v", "left_anti").localCheckpoint(eager=True)
        e = (
            e.join(nodes.select(F.col("v").alias("src")), "src", "left_semi")
            .join(nodes.select(F.col("v").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    else:
        if nodes.limit(1).count() > 0:
            raise ValueError(
                f"SCC peel did not drain within {max_peel} rounds — the "
                "condensation DAG is deeper than max_peel; trim degree-0 "
                "levels upstream or raise max_peel"
            )
    out = empty if assigned is None else assigned
    return out.select(F.col("v").alias("node_id"), "scc_id")


def topo_layers(
    edges: DataFrame,
    src_col: str = "src_scc",
    dst_col: str = "dst_scc",
    max_rounds: int = 128,
) -> DataFrame:
    """(node_id, layer): longest-path depth from the sources of a DAG
    — the crawl-WAVE schedule over the condensation
    (:func:`scc_condensation`): layer-0 components depend on nothing,
    layer-k components only on earlier waves, so waves can fetch /
    recompute in parallel within a layer with all dependencies
    already satisfied. Exactly Kahn's algorithm run layer-at-a-time:
    per round, the current in-degree-0 nodes peel together.

    Per round: one semi-join (which targets still have live
    predecessors) + one anti-join (the new sources) + a constant-
    column append — node-keyed, no windows, lineage checkpointed.
    Rounds = DAG depth; condensations of real web graphs are
    macro-shallow (the bow-tie argument in the module docstring).
    RAISES on a cycle (sources dry up with nodes remaining) and on
    ``max_rounds`` — a partial layering schedules work before its
    dependencies, worse than an error.

    ``layer`` is the longest-path depth, a pure function of the DAG,
    so DuckDB verifies the DEFINITION (recursive-CTE max-depth from
    sources), not the peel order."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    remaining = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    if remaining.limit(1).count() == 0:
        return spark.createDataFrame([], "node_id long, layer long")
    out = None
    for layer in range(max_rounds):
        live_edges = e.join(
            remaining.withColumnRenamed("node", "src"), "src", "left_semi"
        )
        blocked = live_edges.select(F.col("dst").alias("node")).distinct()
        # eager checkpoint: sources feeds THREE consumers (the cycle
        # probe, the output batch, the remaining anti-join) — without
        # it every consumer re-runs the round's semi+anti joins
        # (CLAUDE.md two-consumer rule)
        sources = remaining.join(blocked, "node", "left_anti").localCheckpoint(
            eager=True
        )
        if sources.limit(1).count() == 0:
            raise ValueError("topo_layers: cycle detected — input is not a DAG")
        batch = sources.select(
            F.col("node").alias("node_id"), F.lit(layer).cast("long").alias("layer")
        )
        out = batch if out is None else out.unionByName(batch)
        remaining = remaining.join(sources, "node", "left_anti").localCheckpoint(
            eager=True
        )
        if remaining.limit(1).count() == 0:
            return out
    raise ValueError(f"topo_layers: depth exceeds max_rounds={max_rounds}")


def scc_condensation(
    edges: DataFrame, assign: DataFrame | None = None, **scc_kwargs
) -> DataFrame:
    """Distinct (src_scc, dst_scc) edges of the condensation DAG —
    the SCC-level quotient graph, guaranteed acyclic. This is the
    object crawl planning actually schedules over: vocabulary-sized
    (hosts → SCCs), so downstream topological analysis is cheap."""
    if assign is None:
        assign = strongly_connected_components(edges, **scc_kwargs)
    e = _directed_pairs(edges)
    a = assign.select(F.col("node_id").alias("src"), F.col("scc_id").alias("src_scc"))
    b = assign.select(F.col("node_id").alias("dst"), F.col("scc_id").alias("dst_scc"))
    return (
        e.join(a, "src")
        .join(b, "dst")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .select("src_scc", "dst_scc")
        .distinct()
    )


def bowtie_classify(
    edges: DataFrame, assign: DataFrame | None = None, max_hops: int = 64
) -> DataFrame:
    """(node_id, cls) with cls ∈ {CORE, IN, OUT, OTHER}: Broder's
    macro-map relative to the LARGEST SCC (ties → smallest scc_id).
    IN strictly reaches the core, OUT is strictly reached from it —
    the two are disjoint, since mutual reachability with the core
    means membership. OTHER folds Broder's finer tendril/tube/
    disconnected taxonomy into one bucket (they share the operational
    meaning: no path through the core).

    Reachability-to/from-core reuses the SCC min-label kernel with a
    0/1 seed (core = 0): after forward propagation, lab == 0 ⟺ the
    node reaches a core member. One 1-row driver read picks the core
    id; everything else is joins + min aggs.
    """
    if assign is None:
        assign = strongly_connected_components(edges, max_hops=max_hops)
    assign = assign.localCheckpoint(eager=True)
    core_row = (
        assign.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "scc_id")
        .limit(1)
        .collect()
    )
    if not core_row:
        return assign.select("node_id", F.lit("OTHER").alias("cls")).limit(0)
    core_id = core_row[0]["scc_id"]
    e = _directed_pairs(edges).localCheckpoint(eager=True)
    seed = assign.select(
        F.col("node_id").alias("v"),
        F.when(F.col("scc_id") == F.lit(core_id), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("lab"),
    ).localCheckpoint(eager=True)
    reaches = _min_label_fixpoint(seed, e, forward=True, max_hops=max_hops)
    reached = _min_label_fixpoint(seed, e, forward=False, max_hops=max_hops)
    flags = (
        seed.select("v", (F.col("lab") == 0).alias("is_core"))
        .join(reaches.select("v", (F.col("lab") == 0).alias("fwd")), "v")
        .join(reached.select("v", (F.col("lab") == 0).alias("bwd")), "v")
    )
    return flags.select(
        F.col("v").alias("node_id"),
        F.when(F.col("is_core"), F.lit("CORE"))
        .when(F.col("fwd"), F.lit("IN"))
        .when(F.col("bwd"), F.lit("OUT"))
        .otherwise(F.lit("OTHER"))
        .alias("cls"),
    )


def hyperball(
    edges: DataFrame,
    n_iters: int = 8,
    seed: int = 0,
) -> DataFrame:
    """HyperBall (Boldi–Rosa–Vigna 2011): the neighborhood function
    N(t) = Σ_v |{u : dist(v,u) ≤ t}| estimated with one 16-register
    HyperLogLog counter per node, plus the effective diameter (the
    smallest t where N(t) reaches 90% of N(n_iters)) — the standard
    way to measure "how far apart is the web" (Broder 2000 §4) on
    graphs where all-pairs BFS is impossible.

    Output: one row per t ∈ [0, n_iters] with ``(t, nf_milli,
    growth_permille, eff_diameter)`` — nf_milli = the HLL estimate of
    N(t) in integer milli-units, growth_permille = 1000·N(t) div
    N(n_iters), eff_diameter = min t with growth ≥ 900 (constant
    column).

    EVERY number is a deterministic integer function of the graph, so
    the DuckDB oracle replays the estimator bit-exactly against true
    BFS balls (recursive CTE): register buckets/values come from md5
    (bucket = 4 hash bits; the rank ρ is carried as ``lowbit =
    h & -h`` — monotone in ρ, so register max-merge works on lowbit
    directly and 2^-ρ = 1/(2·lowbit) stays dyadic); the harmonic-mean
    denominator is the exact dyadic sum ``Z·2^40 = (16 − filled)·2^40
    + Σ 2^39 div lowbit``; the per-node estimate is ``172288·2^40 div
    Z`` (α₁₆·m² = 0.673·256 = 172.288, carried ×1000). No linear-
    counting small-range correction — it needs ln(); at web scale
    balls pass 2.5m within a hop or two and the raw estimator is the
    regime that matters (bias at t=0 is a known constant, same in
    both engines).

    Scale shape: registers live in LONG FORM (node, bucket, lowbit) —
    ≤ 16 rows per node; each iteration is one node-keyed equi-join
    with the reversed edge list + a max partial agg (register merge is
    map-side combinable), lineage cut per hop. n·16 register rows at
    10⁹ hosts is the canonical HyperBall memory trade (BRV §4 packs
    them into bitmaps; the long form keeps every step an exact-SQL
    aggregate). nf_milli sums fit BIGINT up to ~10⁷ nodes (milli ×
    n²); past that, re-scale to unit estimates (drop the ×1000) —
    documented rather than silently floated.
    """
    m, d_shift = 16, (1 << 40)
    e = _directed_pairs(edges).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    from metal_history_knowledge_graph_spark.operators.sampling import md5_mod

    reg = (
        nodes.withColumn(
            "_h", md5_mod(F.col("v"), f"hbr:{seed}|", 1 << 60, hex_chars=15)
        )
        .select(
            "v",
            md5_mod(F.col("v"), f"hbb:{seed}|", m, hex_chars=8).alias("b"),
            F.when(F.col("_h") == 0, F.lit(1 << 60))
            .otherwise(F.expr("_h & -_h"))
            .cast("long")
            .alias("lowbit"),
        )
        .localCheckpoint(eager=True)
    )

    def _nf(r: DataFrame, t: int) -> DataFrame:
        z = r.groupBy("v").agg(
            (
                (F.lit(m) - F.count(F.lit(1))) * F.lit(d_shift)
                + F.sum(F.expr("CAST(549755813888L div lowbit AS BIGINT)"))
            ).alias("znum")
        )
        est = z.select(
            F.expr("CAST((172288L * 1099511627776L) div greatest(znum, 1L) "
                   "AS BIGINT)").alias("est")
        )
        return est.agg(
            F.lit(t).cast("int").alias("t"),
            F.coalesce(F.sum("est"), F.lit(0)).cast("long").alias("nf_milli"),
        )

    snaps = [_nf(reg, 0)]
    rev = e.select(F.col("dst").alias("u"), F.col("src").alias("v2"))
    for t in range(1, n_iters + 1):
        pushed = (
            rev.join(reg.select(F.col("v").alias("u"), "b", "lowbit"), "u")
            .select(F.col("v2").alias("v"), "b", "lowbit")
        )
        reg = (
            reg.unionByName(pushed)
            .groupBy("v", "b")
            .agg(F.max("lowbit").alias("lowbit"))
            .localCheckpoint(eager=True)
        )
        snaps.append(_nf(reg, t))
    nf = snaps[0]
    for s in snaps[1:]:
        nf = nf.unionByName(s)
    nf = nf.localCheckpoint(eager=True)
    final = nf.filter(F.col("t") == n_iters).select(
        F.col("nf_milli").alias("_nfT")
    )
    grown = nf.join(F.broadcast(final), F.lit(True), "left").select(
        "t",
        "nf_milli",
        F.expr("CAST(nf_milli * 1000L div greatest(_nfT, 1L) AS BIGINT)")
        .alias("growth_permille"),
    )
    eff = grown.filter(F.col("growth_permille") >= 900).agg(
        F.min("t").cast("int").alias("eff_diameter")
    )
    return grown.join(F.broadcast(eff), F.lit(True), "left")
