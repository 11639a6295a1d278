"""Product quantization (PQ) for compressed-domain approximate
nearest-neighbour search (Jégou/Douze/Schmid, TPAMI 2011): split the
d-dim unit vector into ``m`` contiguous subvectors, learn a ``ks``-way
k-means codebook per subspace, store each vector as ``m`` small codes
(m·log2(ks) bits instead of d floats — 8 bytes vs 256 here), and
answer queries by Asymmetric Distance Computation: one m·ks lookup
table per query, score(v) = Σ_s LUT[s][code_s(v)].

This completes the repo's ANN ladder (brute-force cosine → hyperplane
LSH → IVF → PQ); at 100 TB the codes table is ~32× smaller than the
raw embeddings, so a full ADC scan touches 1/32 of the bytes and the
per-row score is m integer lookups + an m-term fold instead of a
d-term dot. Compose with IVF (encode per inverted list) for IVF-PQ.

Everything is deterministic so the whole path has an exact decision
oracle: k-means init = subvectors of the ``ks`` smallest-id vectors,
assignment ties break to the smallest code, empty codes keep their
previous centroid, and every float reduction is a left fold
(Σ in fixed order) — DuckDB's ``list_reduce(list_prepend(0.0, …))``
replays each one bit-exactly (the q_lsh_buckets/td_ivf_topk pattern).

Reference analogue: the vector-search surface of
scripts/search/vector_search.py — re-expressed as a compressed-domain
operator family instead of a full-precision scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .simsearch import with_l2_normalized


def _sq_l2(a, b):
    """Squared L2 as a left fold — bit-replayable in SQL."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pydot(a: list[float], b: list[float]) -> float:
    """Driver-side dot with the SAME left-fold order as the SQL/Spark
    replays (explicit loop — ``sum()`` over a generator matches, but
    the loop makes the order contract visible)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _cb_literal(codebooks: list[list[list[float]]]):
    return F.array(*[
        F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in book])
        for book in codebooks
    ])


def pq_train(
    df: DataFrame,
    m: int = 4,
    ks: int = 16,
    n_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    normalize: bool = True,
) -> list[list[list[float]]]:
    """Learn ``m`` per-subspace codebooks of ``ks`` centroids each by
    classic (Euclidean) k-means over the unit vectors' subvectors.

    Scale shape: all m subspaces train in ONE pass per iteration — the
    table is exploded to (sub, subvec) rows (m× the row count, 1/m the
    vector length: no data growth), assignment is a narrow map against
    the broadcast codebook literal, and the recompute shuffle carries
    only (sub, code, pos) partial sums — m·ks·(d/m) = ks·d cells after
    map-side combine, independent of table size. The codebook
    (m·ks·d/m floats) always fits on the driver.

    Deterministic: init = the ``ks`` smallest-id vectors' subvectors;
    assignment ties → smallest code (array_position returns the FIRST
    minimum); empty codes keep their previous centroid.

    ``normalize=False`` trains on the raw vectors — the residual-PQ
    path of ivfpq_build, where inputs are (unit − coarse-centroid)
    residuals that must NOT be re-normalized.
    """
    if normalize:
        normed = with_l2_normalized(df, vec_col).select(
            F.col(id_col).alias("_id"), "unit_vec"
        )
    else:
        normed = df.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("unit_vec")
        )
    # feeds head() + the init collect + one collect per iteration —
    # checkpoint once or every action re-runs the full input lineage
    # (normalization here; in ivfpq_build the whole coarse-assignment
    # + residual chain). The build_triples rule.
    normed = normed.localCheckpoint(eager=True)
    head = normed.select(F.size("unit_vec").alias("d")).head()
    if head is None:
        raise ValueError("pq_train: empty input")
    d = head["d"]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    ds = d // m
    init = normed.orderBy("_id").limit(ks).collect()
    if len(init) < ks:
        raise ValueError(f"pq_train: need >= ks={ks} vectors, got {len(init)}")
    books = [
        [[float(v) for v in r.unit_vec[s * ds:(s + 1) * ds]] for r in init]
        for s in range(m)
    ]
    sub_slices = F.array(*[
        F.slice(F.col("unit_vec"), s * ds + 1, ds) for s in range(m)
    ])
    sub_rows = normed.select(
        "_id", F.posexplode(sub_slices).alias("sub", "subvec")
    )
    for _ in range(n_iters):
        cb = _cb_literal(books)
        dists = F.transform(
            F.element_at(cb, F.col("sub") + 1),
            lambda c: _sq_l2(F.col("subvec"), c),
        )
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        sums = (
            sub_rows.withColumn("code", code)
            .select("sub", "code", F.posexplode("subvec").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [
            [[0.0] * ds for _ in range(ks)] for _ in range(m)
        ]
        nonempty: set[tuple[int, int]] = set()
        for r in sums:
            new[r.sub][r.code][r.pos] = r.s / r.n
            nonempty.add((r.sub, r.code))
        books = [
            [
                new[s][c] if (s, c) in nonempty else books[s][c]
                for c in range(ks)
            ]
            for s in range(m)
        ]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    normalize: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes array<int>) — each vector's unit form quantized to
    its nearest centroid per subspace (same argmin/tie rule as
    training's assignment step, so encode-after-train lands where the
    final training pass put it).

    One narrow map with the broadcast codebook literal — zero shuffle;
    this is also the incremental path: new crawl batches are encoded
    against the frozen codebooks, never retrained per batch."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    cb = _cb_literal(codebooks)
    # Lambda-variable binding, not per-element inlining (the BENCH.md
    # HOF rule): zip_with binds each SLICED subvector (sv) and its
    # codebook (book) as lambda variables, so the normalization /
    # slice expressions are evaluated m times per row — referencing
    # unit_vec from inside the per-centroid lambda would inline the
    # whole normalization fold m·ks times per row (measured 54 ms/row
    # → ~0.5 ms/row after this restructure at sf0.1).
    subvecs = F.array(*[
        F.slice(F.col("unit_vec"), s * ds + 1, ds) for s in range(m)
    ])
    dists_all = F.zip_with(
        subvecs,
        cb,
        lambda sv, book: F.transform(book, lambda c: _sq_l2(sv, c)),
    )
    codes = F.transform(
        dists_all,
        lambda dv: (F.array_position(dv, F.array_min(dv)) - 1).cast("int"),
    )
    src = (
        with_l2_normalized(df, vec_col)
        if normalize
        else df.withColumn("unit_vec", F.col(vec_col))
    )
    return src.select(id_col, *extra_cols, codes.alias("codes"))


def pq_lut(
    codebooks: list[list[list[float]]], query: list[float]
) -> list[list[float]]:
    """ADC lookup table for one query: LUT[s][c] = dot(q_sub_s,
    codebook[s][c]) over the UNIT query — m·ks floats, computed once
    per query on the driver (left-fold order, replayable)."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    qn = math.sqrt(sum(v * v for v in query)) or 1.0
    qu = [v / qn for v in query]
    return [
        [_pydot(qu[s * ds:(s + 1) * ds], c) for c in codebooks[s]]
        for s in range(m)
    ]


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """ADC top-k over the codes table: score = left-fold over
    subspaces of LUT[s][codes[s]] ≈ cosine(query, v). Per row: m
    2-level array lookups + an m-term fold — no d-term dot, no raw
    vectors read. TakeOrderedAndProject does the global top-k
    (4dp-rounded score, ties → smallest id, the q_cosine_topk
    convention)."""
    lut = pq_lut(codebooks, query)
    lut_lit = F.array(*[
        F.array(*[F.lit(v) for v in row]) for row in lut
    ])
    m = len(codebooks)
    # zip_with binds each code as a lambda variable — referencing the
    # codes column from inside a per-subspace lambda would inline the
    # (possibly unmaterialized encode) expression m times per row
    score = F.aggregate(
        F.zip_with(
            F.col(codes_col),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(F.element_at(lut_lit, s + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        codes_df.select(id_col, F.round(score, 4).alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(k)
    )


def pq_reconstruct(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """(id, approx_vec) — decompress codes back to the concatenated
    centroid vector (the PQ approximation of the unit vector). ADC
    scores satisfy score(v) == dot(query_unit, reconstruct(v)) up to
    fold association — pinned in test_pq."""
    cb = _cb_literal(codebooks)
    approx = F.flatten(
        F.zip_with(
            cb,
            F.col(codes_col),
            lambda book, c: F.element_at(book, c + 1),
        )
    )
    return codes_df.select(id_col, approx.alias("approx_vec"))


def ivfpq_build(
    df: DataFrame,
    n_centroids: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    ks: int = 16,
    pq_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], list[list[list[float]]], DataFrame]:
    """IVF-PQ (the Faiss ``IVFx,PQy`` composition): coarse-quantize
    with the IVF spherical k-means, then product-quantize the
    RESIDUALS (unit_vec − coarse_centroid) with one codebook shared
    across lists. Residual encoding is what makes IVF-PQ beat flat PQ:
    residual magnitudes are a fraction of unit-vector magnitudes, so
    the same ks spends its codes on a much smaller cell.

    Returns ``(centroids, codebooks, enc)`` where ``enc`` is
    (id, cluster, codes) — at scale written partitioned by ``cluster``
    so probes are partition-pruned scans of 8-byte codes.

    Exact-score identity (pinned in test_pq): for a unit query q,
    q·(c_l + r̂) = q·c_l + Σ_s q_s·r̂_s — a per-list constant plus the
    shared ADC lookup, which is how ivfpq_topk scores without ever
    reconstructing.
    """
    from .simsearch import ivf_build

    centroids, assigned = ivf_build(
        df, n_centroids=n_centroids, n_iters=coarse_iters,
        vec_col=vec_col, id_col=id_col,
    )
    cent_lit = F.array(*[
        F.array(*[F.lit(float(v)) for v in c]) for c in centroids
    ])
    resid_df = with_l2_normalized(assigned, vec_col).select(
        id_col,
        "cluster",
        F.zip_with(
            F.col("unit_vec"),
            F.element_at(cent_lit, F.col("cluster") + 1),
            lambda x, y: x - y,
        ).alias("resid"),
    ).localCheckpoint(eager=True)  # feeds pq_train's actions AND pq_encode
    books = pq_train(
        resid_df, m=m, ks=ks, n_iters=pq_iters,
        vec_col="resid", id_col=id_col, normalize=False,
    )
    enc = pq_encode(
        resid_df, books, vec_col="resid", id_col=id_col,
        normalize=False, extra_cols=("cluster",),
    )
    return centroids, books, enc


def ivfpq_topk(
    enc: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """IVF-PQ search: rank coarse centroids against the query
    driver-side, scan only the ``nprobe`` nearest lists, score each
    candidate as q·c_list + ADC(residual codes) — per row that is one
    base lookup plus m LUT lookups, no raw vector ever read. With the
    codes table partitioned by ``cluster`` the non-probed lists are
    pruned at the scan. ``nprobe == n_centroids`` degrades to a full
    compressed-domain scan."""
    qn = math.sqrt(sum(v * v for v in query)) or 1.0
    qu = [v / qn for v in query]
    base = [_pydot(qu, c) for c in centroids]
    ranked = sorted(range(len(centroids)), key=lambda c: (-base[c], c))
    probe = ranked[:nprobe]
    lut = pq_lut(codebooks, query)
    base_lit = F.array(*[F.lit(v) for v in base])
    lut_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    m = len(codebooks)
    # zip_with code binding — see pq_topk's HOF-inlining note
    score = F.element_at(base_lit, F.col("cluster") + 1) + F.aggregate(
        F.zip_with(
            F.col(codes_col),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(F.element_at(lut_lit, s + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        enc.filter(F.col("cluster").isin(probe))
        .select(id_col, F.round(score, 4).alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.asc(id_col))
        .limit(k)
    )
