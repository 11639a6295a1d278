"""Vector similarity search over an embedding column
(``array<float|double>``).

Mirrors the reference's vector-search subsystem
(``scripts/search/vector_search.py:92-275``): L2 normalization, cosine
= dot product of normalized vectors, threshold filter, top-k, type
filter, similar-entity (exclude self), batch search. Scale paths:

* brute-force cosine top-k — native ``zip_with``/``aggregate`` dot
  product, ``TakeOrderedAndProject`` (no full sort), one scan;
* bucketed LSH (random hyperplane signs) — candidates share a sign
  bucket; probes only its bucket; recall grows with ``num_probes``
  tables;
* IVF (inverted file) — deterministic distributed k-means coarse
  quantizer; search scans only the ``nprobe`` nearest inverted lists
  (partition-pruned at scale), exact re-rank inside them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_l2_normalized(df: DataFrame, vec_col: str = "embedding",
                       out_col: str = "unit_vec") -> DataFrame:
    """Zero-safe L2 normalization (vector_search.py:92-97)."""
    n = _norm(F.col(vec_col))
    return df.withColumn(
        out_col,
        F.when(n > 0, F.transform(F.col(vec_col), lambda v: v / n))
        .otherwise(F.col(vec_col)),
    )


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float | None = None,
) -> DataFrame:
    """Brute-force cosine top-k: exact baseline, one scan, JVM-native
    arithmetic, TakeOrderedAndProject physical plan."""
    qn = math.sqrt(sum(v * v for v in query)) or 1.0
    q = F.array(*[F.lit(v / qn) for v in query])
    normed = with_l2_normalized(df, vec_col)
    scored = normed.withColumn("cosine", F.round(_dot(F.col("unit_vec"), q), 6))
    if threshold is not None:
        scored = scored.filter(F.col("cosine") >= threshold)
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _sign_bucket(vec_col, planes: list[list[float]]):
    """Bucket id = sign bits against fixed random hyperplanes."""
    bits = [
        F.when(_dot(F.col(vec_col), F.array(*[F.lit(p) for p in plane])) >= 0, 1).otherwise(0)
        for plane in planes
    ]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out


def _hyperplanes(dim: int, n_planes: int, table: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG — no numpy
    on the driver path needed, stable across runs)."""
    planes = []
    state = 0x9E3779B97F4A7C15 ^ (table * 0x85EBCA6B)
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            plane.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(plane)
    return planes


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Vector width from the first row — with a CLEAR error on an
    empty table or a NULL first vector instead of an opaque
    NoneType traceback inside an index build."""
    row = df.select(vec_col).head()
    if row is None or row[0] is None:
        raise ValueError(
            f"cannot infer embedding dim: table is empty or first "
            f"'{vec_col}' is NULL"
        )
    return len(row[0])


def hyperplanes_rows(
    dim: int, n_planes: int = 8, num_tables: int = 4
) -> list[tuple[int, int, list[float]]]:
    """The deterministic hyperplane bank as (table, plane_idx,
    components) rows — exportable to parquet so a decision oracle can
    replay the sign-bucket assignment over the same planes
    (`__spark_entry__.q_lsh_buckets`)."""
    return [
        (t, i, plane)
        for t in range(num_tables)
        for i, plane in enumerate(_hyperplanes(dim, n_planes, t))
    ]


def _bucket_of(vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side sign-bucket of a query vector (same bit order as
    ``_sign_bucket``)."""
    out = 0
    for plane in planes:
        dot = sum(a * b for a, b in zip(vec, plane))
        out = out * 2 + (1 if dot >= 0 else 0)
    return out


def lsh_build(
    df: DataFrame,
    n_planes: int = 8,
    num_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Materialized LSH index: one row per (input row, hash table) with
    columns ``(table, bucket, id, vec)``. Persist it **partitioned by
    (table, bucket)** — then a probe is a point-partition read (exactly
    one partition per probed table; non-probed buckets are never
    scanned). This is the classic multi-table LSH layout: storage is
    num_tables× the base table, reads are pruned.

    Bucket ids are computed once at build time from the same
    deterministic hyperplanes as the ad-hoc path, so
    ``lsh_topk_indexed`` over this index returns exactly what
    ``lsh_topk`` computes with full scans."""
    dim = _infer_dim(df, vec_col)
    parts = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, n_planes, t)
        parts.append(
            df.select(
                F.lit(t).alias("table"),
                _sign_bucket(vec_col, planes).alias("bucket"),
                F.col(id_col),
                F.col(vec_col),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lsh_topk_indexed(
    index: DataFrame,
    query: list[float],
    k: int = 10,
    num_probes: int = 4,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k over a persisted ``lsh_build`` index: the
    query's bucket per probed table is computed driver-side, and the
    candidate read filters on the STORED (table, bucket) columns —
    partition-pruned when the index is written partitioned by them."""
    qn = math.sqrt(sum(v * v for v in query)) or 1.0
    qunit = [v / qn for v in query]
    dim = len(query)
    cond = None
    for t in range(num_probes):
        qb = _bucket_of(qunit, _hyperplanes(dim, n_planes, t))
        this = (F.col("table") == t) & (F.col("bucket") == qb)
        cond = this if cond is None else (cond | this)
    cand = index.filter(cond).dropDuplicates([id_col])
    return cosine_topk(cand, query, k=k, vec_col=vec_col, id_col=id_col)


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    num_probes: int = 4,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH, ad-hoc (index-free)
    variant — each probe filters the base table by a recomputed sign
    expression, so every probe is a scan. Use ``lsh_build`` +
    ``lsh_topk_indexed`` for repeated queries: the persisted
    (table, bucket)-partitioned index turns probes into pruned reads."""
    dim = len(query)
    qn = math.sqrt(sum(v * v for v in query)) or 1.0
    qunit = [v / qn for v in query]

    cand = None
    for t in range(num_probes):
        planes = _hyperplanes(dim, n_planes, t)
        qb = _bucket_of(qunit, planes)
        hits = df.filter(_sign_bucket(vec_col, planes) == qb)
        cand = hits if cand is None else cand.unionByName(hits)
    cand = cand.dropDuplicates([id_col])
    return cosine_topk(cand, query, k=k, vec_col=vec_col, id_col=id_col)


def ivf_build(
    df: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], DataFrame]:
    """IVF coarse quantizer: distributed spherical k-means over unit
    vectors (cluster means re-normalized each iteration, so cosine /
    dot-product assignment is a true nearest-centroid rule), fully
    deterministic (init = the ``n_centroids`` smallest-id vectors;
    ties in assignment broken by centroid index; empty clusters keep
    their previous centroid).

    Returns ``(centroids, assigned)`` where ``assigned`` adds a
    ``cluster`` column. Scale shape: assignment is a narrow map with
    broadcast centroids (n_centroids × dim floats); the recompute
    shuffle carries only (cluster, pos) partial sums — n_centroids ×
    dim rows after map-side combine, independent of table size. At
    100 TB the assigned table is written partitioned by ``cluster`` so
    probes become partition-pruned scans."""
    normed = with_l2_normalized(df, vec_col).select(
        F.col(id_col).alias("_id"), "unit_vec"
    )
    init = normed.orderBy("_id").limit(n_centroids).collect()
    centroids = [[float(v) for v in r.unit_vec] for r in init]

    def _unit(vec: list[float]) -> list[float]:
        n = math.sqrt(sum(v * v for v in vec)) or 1.0
        return [v / n for v in vec]

    centroids = [_unit(c) for c in centroids]
    for _ in range(n_iters):
        cent_arr = F.array(*[
            F.array(*[F.lit(v) for v in c]) for c in centroids
        ])
        # Centroids are re-normalized after every mean update (below),
        # so argmin over distances == argmax over dot products holds
        # throughout; ties → smallest centroid index.
        dots = F.transform(cent_arr, lambda c: _dot(F.col("unit_vec"), c))
        best = F.array_position(dots, F.array_max(dots)) - 1
        assigned = normed.withColumn("cluster", best.cast("int"))
        sums = (
            assigned.select(
                "cluster", F.posexplode("unit_vec").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = {c: [0.0] * len(centroids[0]) for c in range(len(centroids))}
        nonempty: set[int] = set()
        for r in sums:
            new[r.cluster][r.pos] = r.s / r.n
            nonempty.add(r.cluster)
        # empty clusters keep their old centroid (deterministic);
        # non-empty means are projected back to the unit sphere
        # (spherical k-means) so the dot-product assignment stays a
        # true nearest-centroid rule.
        centroids = [
            _unit(new[c]) if c in nonempty else centroids[c]
            for c in range(len(centroids))
        ]

    # final pass IS the incremental-assignment operator, so a batch
    # quantized later (ivf_assign_new) lands in identical lists
    return centroids, ivf_assign_new(df, centroids, vec_col)


def ivf_assign_new(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign NEW vectors to an EXISTING centroid table — the index
    maintenance path for a growing corpus: never re-run k-means per
    crawl batch; quantize the batch against the frozen coarse
    quantizer and append to the cluster-partitioned table (at scale:
    ``TableStore.merge_upsert(batch, keys=[cluster, id], partition_by=
    [cluster])`` rewrites only the touched cluster partitions).

    One narrow map with broadcast centroids (n_centroids × dim
    literals), zero shuffle; the assignment rule is EXACTLY
    ``ivf_build``'s final pass (argmax dot over unit vectors, ties →
    smallest centroid index), so a batch assigned incrementally lands
    in the same lists as a monolithic rebuild over frozen centroids —
    pinned by test_trainingdata_ops."""
    cent_arr = F.array(*[F.array(*[F.lit(v) for v in c]) for c in centroids])
    dots = F.transform(cent_arr, lambda c: _dot(F.col("unit_vec"), c))
    best = (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    return (
        with_l2_normalized(df, vec_col)
        .withColumn("cluster", best)
        .drop("unit_vec")
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: rank centroids against the query driver-side
    (centroid table is tiny), scan only the ``nprobe`` nearest
    inverted lists, exact cosine re-rank within them. With the table
    partitioned by ``cluster`` the non-probed lists are never read
    (partition pruning); ``nprobe == n_centroids`` degrades gracefully
    to the exact brute-force result."""
    qn = math.sqrt(sum(v * v for v in query)) or 1.0
    qunit = [v / qn for v in query]
    ranked = sorted(
        range(len(centroids)),
        key=lambda c: (-sum(a * b for a, b in zip(qunit, centroids[c])), c),
    )
    probe = ranked[:nprobe]
    cand = assigned.filter(F.col("cluster").isin(probe))
    return cosine_topk(cand, query, k=k, vec_col=vec_col, id_col=id_col)


def similar_items(
    df: DataFrame,
    item_id,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k most similar to an existing row, excluding itself
    (vector_search.py:228-275)."""
    row = df.filter(F.col(id_col) == item_id).select(vec_col).head()
    if row is None:
        # empty schema must carry the ACTUAL id type (string ids would
        # otherwise union-fail against the found path's results)
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, cosine double")
    query = [float(v) for v in row[0]]
    return cosine_topk(
        df.filter(F.col(id_col) != item_id), query, k=k,
        vec_col=vec_col, id_col=id_col,
    )


def batch_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Many queries at once: broadcast the (small) query set, score in
    one pass, window-rank per query (vector_search.py:206-226 without
    the driver loop)."""
    from pyspark.sql import Window

    normed = with_l2_normalized(df, vec_col)
    qn = with_l2_normalized(queries, q_vec_col, out_col="q_unit")
    scored = normed.crossJoin(F.broadcast(qn)).withColumn(
        "cosine", F.round(_dot(F.col("unit_vec"), F.col("q_unit")), 6)
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def lsh_tables_for_recall(
    threshold: float, n_planes: int, target_recall: float = 0.95
) -> int:
    """Number of OR-amplified sign-hyperplane tables needed so a pair
    at exactly ``cosine == threshold`` collides in ≥ 1 table with
    probability ≥ ``target_recall``.

    Per-plane agreement for a pair at angle θ is p = 1 − θ/π
    (Charikar, STOC'02 — SimHash rounding); a full n_planes bucket
    matches with p^n, and with T independent tables
    recall = 1 − (1 − p^n)^T  ⇒  T = ⌈log(1−target) / log(1−p^n)⌉.
    Pairs ABOVE the threshold collide with strictly higher
    probability, so this T is a lower bound on their recall too."""
    theta = math.acos(max(-1.0, min(1.0, threshold)))
    p_bucket = (1.0 - theta / math.pi) ** n_planes
    if p_bucket >= 1.0:
        return 1
    if p_bucket <= 0.0:
        raise ValueError(f"bucket match probability is 0 at {n_planes=}")
    return max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_bucket)))


def neardup_num_planes(n_docs: int, target_bucket_rows: int = 256) -> int:
    """Bucket width that keeps EXPECTED sign-bucket occupancy at
    ``target_bucket_rows``: 2^n_planes ≈ n_docs / target. 10⁹ docs →
    22 planes (4M buckets); the within-bucket self-join is then
    O(target²) per bucket instead of growing with corpus size."""
    return max(4, math.ceil(math.log2(max(2.0, n_docs / target_bucket_rows))))


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int | None = None,
    num_tables: int | None = None,
    target_recall: float = 0.95,
    target_bucket_rows: int = 256,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: multi-table
    OR-amplified hyperplane banding with exact-cosine verification —
    the ``minhash_lsh_pairs`` shape over sign buckets.

    Two parameters control the scale/recall trade and both default to
    principled values instead of fixed constants:

    * ``n_planes`` — bucket width. Defaults to sizing the bucket count
      2^n_planes so the EXPECTED bucket occupancy is
      ``target_bucket_rows`` (one ``count()`` on the input): at 10⁹
      docs that is ~22 planes / 4M buckets, keeping the within-bucket
      self-join O(target²) per bucket rather than O((n/1024)²) as the
      old fixed-1024-bucket single table did.
    * ``num_tables`` — OR amplification. Defaults to
      :func:`lsh_tables_for_recall` so a pair AT the threshold is
      caught with ≥ ``target_recall`` probability (the old single
      table caught a 0.95-cosine pair with only ~0.35 probability).

    Every candidate pair is verified with the exact cosine, so
    precision is 1.0 by construction; the banding only bounds recall.
    Shuffle shape: (table, bucket) keys only — never a cross product.
    """
    dim = _infer_dim(df, vec_col)
    if n_planes is None:
        n_planes = neardup_num_planes(df.count(), target_bucket_rows)
    if num_tables is None:
        num_tables = lsh_tables_for_recall(threshold, n_planes, target_recall)
    normed = with_l2_normalized(df, vec_col).select(
        F.col(id_col).alias("doc"), "unit_vec"
    )
    parts = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, n_planes, t)
        parts.append(
            normed.select(
                F.lit(t).alias("table"),
                _sign_bucket("unit_vec", planes).alias("bucket"),
                "doc", "unit_vec",
            )
        )
    index = parts[0]
    for p in parts[1:]:
        index = index.unionByName(p)
    # verify BEFORE the pair-dedup: the exact cosine is a narrow
    # codegen expression (recomputed at worst num_tables× per true
    # pair), while deduping first would shuffle both unit vectors per
    # candidate — survivors are three scalar columns instead
    return (
        index.alias("a")
        .join(index.alias("b"), ["table", "bucket"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .withColumn(
            "cosine", F.round(_dot(F.col("a.unit_vec"), F.col("b.unit_vec")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"), "cosine")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def cosine_near_duplicates_exact(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs cosine near-dup pairs — the correctness baseline
    the bucketed :func:`embedding_near_duplicates` is recall-tested
    against, and the verifier you run on a *bounded candidate set*.

    Deliberately O(n²): never run on a full 100 TB table (that is what
    the hyperplane-bucketed variant's candidate generation is for);
    run it on a vocabulary-sized subset, one LSH bucket, or a
    candidate-pair join's output. Cosine is the same native HOF dot
    over L2-normalized vectors as cosine_topk (rounded to 4dp for
    cross-engine float identity with the DuckDB oracle)."""
    normed = with_l2_normalized(df, vec_col).select(
        F.col(id_col).alias("doc"), "unit_vec"
    )
    return (
        normed.alias("a")
        .join(normed.alias("b"), F.col("a.doc") < F.col("b.doc"))
        .withColumn("cosine", F.round(_dot(F.col("a.unit_vec"), F.col("b.unit_vec")), 4))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"), "cosine")
    )
