"""SemDeDup (operators/semdedup.py): grouping correctness vs a pure-
Python replay, the two representative-election rules, partitioning
invariance, cluster-restricted pair completeness, and the plan shape
(equi-join on cluster, no Python eval)."""

import math

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.semdedup import (
    semdedup,
    semdedup_pairs,
    semdedup_probe,
)
from metal_history_knowledge_graph_spark.operators.simsearch import (
    cosine_near_duplicates_exact,
    ivf_build,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _seeded(n, dim=8):
    """Deterministic pseudo-random unit-ish vectors (no RNG import —
    a fixed LCG so the fixture is bit-stable everywhere)."""
    rows, state = [], 12345
    for i in range(n):
        v = []
        for _ in range(dim):
            state = (state * 1103515245 + 12345) % (1 << 31)
            v.append((state / (1 << 31)) * 2 - 1)
        rows.append((i, v))
    return rows


def _py_semdedup(rows, centroids, threshold, rep_rule):
    """Pure-Python replay of everything downstream of k-means:
    assignment (argmax left-fold dot, ties -> lowest cluster),
    within-cluster 4dp-cosine pairs, connected components, election."""
    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else v

    uv = {i: unit(v) for i, v in rows}
    asg = {}
    for i, u in uv.items():
        dots = [sum(a * b for a, b in zip(u, c)) for c in centroids]
        asg[i] = dots.index(max(dots))
    pairs = []
    ids = sorted(uv)
    for x in ids:
        for y in ids:
            if x < y and asg[x] == asg[y]:
                cos = round(sum(a * b for a, b in zip(uv[x], uv[y])), 4)
                if cos >= threshold:
                    pairs.append((x, y))
    parent = {i: i for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for x, y in pairs:
        parent[find(x)] = find(y)
    groups = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    out = {}
    for members in groups.values():
        if rep_rule == "min_id":
            rep = min(members)
        else:
            rep = min(
                members,
                key=lambda m: (
                    round(sum(a * b for a, b in
                              zip(uv[m], centroids[asg[m]])), 4),
                    m,
                ),
            )
        for m in members:
            out[m] = (asg[m], rep, len(members), 1 if m == rep else 0)
    return out


@pytest.mark.parametrize("rep_rule", ["low_centroid_sim", "min_id"])
def test_matches_python_replay(spark, rep_rule):
    rows = _seeded(40)
    # inject exact duplicates of the first 6 vectors (cosine = 1.0)
    rows += [(100 + i, v) for i, v in rows[:6]]
    df = _vecs(spark, rows)
    dec, centroids = semdedup(df, n_clusters=4, threshold=0.99,
                              rep_rule=rep_rule)
    got = {
        r.vec_id: (r.cluster, r.group_rep, r.group_size, r.keep_flag)
        for r in dec.collect()
    }
    want = _py_semdedup(rows, centroids, 0.99, rep_rule)
    assert got == want
    # every injected dup landed in a >=2 group, exactly one keeper each
    for i in range(6):
        assert got[100 + i][2] >= 2
        assert got[100 + i][1] == got[i][1]
    keeps = sum(v[3] for v in got.values())
    assert keeps == len({v[1] for v in got.values()})


def test_low_centroid_sim_keeps_atypical_member(spark):
    """The paper's rule: within a duplicate group the member FARTHEST
    from the centroid (lowest cosine) is kept. Construct a cluster
    whose two near-dup members differ in centroid distance."""
    base = [1.0, 0.0, 0.0, 0.0]
    tilted = [0.96, 0.28, 0.0, 0.0]     # cos(base, tilted) ~ 0.96
    far = [0.0, 1.0, 0.0, 0.0]          # second centroid seed
    df = _vecs(spark, [(0, base), (1, tilted), (2, far), (3, far)])
    dec, cents = semdedup(df, n_clusters=2, threshold=0.9,
                          rep_rule="low_centroid_sim")
    got = {r.vec_id: r for r in dec.collect()}
    assert got[0].group_rep == got[1].group_rep
    # the group rep is whichever member has the LOWER centroid cosine
    sims = {i: got[i].centroid_sim for i in (0, 1)}
    expect_rep = min(sims, key=lambda i: (sims[i], i))
    assert got[0].group_rep == expect_rep
    # min_id election on the same input picks id 0 regardless
    dec2, _ = semdedup(df, n_clusters=2, threshold=0.9, rep_rule="min_id")
    got2 = {r.vec_id: r for r in dec2.collect()}
    assert got2[1].group_rep == 0


def test_partitioning_invariance(spark):
    rows = _seeded(60)
    rows += [(200 + i, v) for i, v in rows[:10]]
    a, _ = semdedup(_vecs(spark, rows), n_clusters=4, threshold=0.98)
    b, _ = semdedup(_vecs(spark, rows).repartition(13), n_clusters=4,
                    threshold=0.98)
    key = lambda r: (r.vec_id, r.cluster, r.group_rep, r.group_size,
                     r.keep_flag)
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))


def test_pairs_complete_within_clusters(spark):
    """semdedup_pairs finds EXACTLY the brute-force pairs whose two
    sides share a cluster — the only misses are cross-cluster (the
    paper's documented trade), never within-cluster."""
    rows = _seeded(50)
    df = _vecs(spark, rows)
    _, assigned = ivf_build(df, n_centroids=4)
    asg = {r.vec_id: r.cluster for r in
           assigned.select("vec_id", "cluster").collect()}
    got = {(r.id_a, r.id_b) for r in
           semdedup_pairs(assigned, threshold=0.3).collect()}
    brute = {(r.doc_a, r.doc_b) for r in
             cosine_near_duplicates_exact(df, threshold=0.3).collect()}
    assert got == {(a, b) for a, b in brute if asg[a] == asg[b]}
    assert got.issubset(brute)


def test_plan_equi_join_no_python(spark):
    rows = _seeded(30)
    _, assigned = ivf_build(_vecs(spark, rows), n_centroids=4)
    plan = (
        semdedup_pairs(assigned.localCheckpoint(eager=True), threshold=0.9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rejects_unknown_rule(spark):
    with pytest.raises(ValueError):
        semdedup(_vecs(spark, _seeded(5)), rep_rule="random")


def test_probe_matches_frozen_rebuild(spark):
    """The incremental probe's per-edge decisions must equal what a
    monolithic within-cluster pair join over the SAME frozen centroids
    implies for the batch ids: dup_of = min directly-similar corpus
    id; is_new_rep = no corpus edge and no smaller-id batch edge."""
    corpus_rows = _seeded(40)
    tau = 0.98
    df = _vecs(spark, corpus_rows)
    centroids, assigned = ivf_build(df, n_centroids=4)
    # batch: exact copies of 5 corpus vectors (guaranteed dup_of),
    # two copies of one corpus vector (intra-batch + corpus dup),
    # and 5 genuinely new vectors (fresh LCG segment)
    batch_rows = [(500 + i, v) for i, v in corpus_rows[:5]]
    batch_rows.append((600, corpus_rows[0][1]))
    batch_rows += [(700 + k, v) for k, (_, v) in
                   enumerate(_seeded(60)[40:45])]
    batch = _vecs(spark, batch_rows)

    got = {r.vec_id: r for r in
           semdedup_probe(batch, centroids, assigned, tau).collect()}
    assert set(got) == {r[0] for r in batch_rows}

    # frozen-rebuild baseline: pair join over corpus+batch, same
    # centroids (ivf_assign_new on the union), restricted to batch ids
    from metal_history_knowledge_graph_spark.operators.simsearch import (
        ivf_assign_new,
    )

    union = ivf_assign_new(
        df.unionByName(batch), centroids
    )
    pair_rows = semdedup_pairs(union, tau).collect()
    edges = {}
    for r in pair_rows:
        edges.setdefault(r.id_a, set()).add(r.id_b)
        edges.setdefault(r.id_b, set()).add(r.id_a)
    batch_ids = {r[0] for r in batch_rows}
    for bid in batch_ids:
        nbrs = edges.get(bid, set())
        corpus_nbrs = sorted(n for n in nbrs if n not in batch_ids)
        want_dup = corpus_nbrs[0] if corpus_nbrs else None
        assert got[bid].dup_of == want_dup, bid
        smaller_batch_nbr = any(n in batch_ids and n < bid for n in nbrs)
        want_rep = 1 if (want_dup is None and not smaller_batch_nbr) else 0
        assert got[bid].is_new_rep == want_rep, bid
    # the exact copies matched their corpus originals
    for i in range(5):
        assert got[500 + i].dup_of == i
    # 600 duplicates corpus vec 0 — corpus match wins, not a new rep
    assert got[600].dup_of == 0 and got[600].is_new_rep == 0
    # at least the genuinely-new vectors with no smaller peers survive
    assert any(got[700 + i].is_new_rep == 1 for i in range(5))


def test_probe_prunes_untouched_clusters(spark):
    """The corpus side of the probe join is semi-joined to the batch's
    clusters — a batch touching one cluster must not pair against the
    whole corpus."""
    # corpus split across two well-separated directions
    left = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(3)]
    right = [(10 + i, [0.0, 1.0, 0.0, 0.0]) for i in range(3)]
    df = _vecs(spark, left + right)
    centroids, assigned = ivf_build(df, n_centroids=2)
    batch = _vecs(spark, [(100, [1.0, 0.0, 0.0, 0.0])])
    got = semdedup_probe(batch, centroids, assigned, 0.99).collect()
    assert len(got) == 1 and got[0].dup_of == 0 and got[0].is_new_rep == 0
