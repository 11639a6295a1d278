"""Document deduplication operators (training-data-pipeline family):

* exact        — hash-groupBy on the normalized-text fingerprint
* n-gram Jaccard — word-shingle inverted-index self-join (exact
                  similarity, set-oriented, no O(n²) scan)
* MinHash-LSH  — shingle → minhash → banded bucket-join (scale path)
* SimHash      — 64-bit simhash, banded by 16-bit chunks, verified by
                  hamming distance
* embedding cosine — see operators/simsearch.py near_duplicates

Each returns DataFrames; nothing collects to the driver. The
inverted-index join shuffles on shingle hash — frequent shingles are
capped (``max_doc_freq``) exactly like a stop-word filter, which is
also the skew guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .textstats import with_fingerprint


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (whitespace/case-normalized) docs:
    (fingerprint, keep_id, dup_ids, group_size); only groups ≥ 2."""
    fp = with_fingerprint(df, text_col)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") >= 2)
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per fingerprint (one shuffle)."""
    fp = with_fingerprint(df, text_col)
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fingerprint")
    )


def _word_shingles(text_col: str, n: int = 3):
    """Distinct word n-gram shingle hashes (native, codegen-friendly)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    k = F.size(toks) - n
    return F.array_distinct(
        F.when(
            k >= 0,
            F.transform(
                F.sequence(F.lit(0), k),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
            ),
        ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Exact Jaccard-similar pairs via inverted index:
    shingle→docs postings, co-occurrence counts, |A∩B| / (|A|+|B|−|A∩B|).
    ``max_doc_freq`` drops ubiquitous shingles (stop-shingles) — both a
    precision aid and the shuffle-skew guard.

    Jaccard is computed over the POST-FILTER (rare) shingle sets on
    both sides of the fraction: sizes and intersection use the same
    universe, so two identical documents score 1.0 no matter how many
    of their shingles the stop-shingle cap removed. (Sizing the
    denominator from the unfiltered sets while intersecting only rare
    shingles — an earlier formulation — systematically underestimated
    similarity on boilerplate-heavy corpora and could miss exact
    duplicates.)

    Documents whose EVERY shingle exceeds ``max_doc_freq`` (pure
    boilerplate replicated > max_doc_freq times) drop out of the
    postings entirely — the inverted index cannot pair them. Exact
    duplicates among those are recovered by a fingerprint fallback:
    the all-filtered docs (a left-anti against the postings — tiny by
    construction, each one is a ≥ max_doc_freq-replicated text) are
    paired on the normalized-text fingerprint with jaccard = 1.0, so
    the identical-docs-score-1.0 guarantee holds unconditionally."""
    docs = df.select(
        F.col(id_col).alias("doc"), _word_shingles(text_col, n).alias("shingles")
    )
    postings = docs.select("doc", F.explode("shingles").alias("shingle"))
    rare = (
        postings.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_doc_freq)
        .select("shingle")
    )
    postings = postings.join(rare, "shingle")
    # per-doc size of the RARE shingle set (doc-keyed, vocabulary of
    # documents — AQE picks the join strategy)
    sizes = postings.groupBy("doc").agg(F.count(F.lit(1)).alias("set_size"))
    co = (
        postings.alias("a")
        .join(postings.alias("b"), "shingle")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    co = (
        co.join(sizes.withColumnRenamed("doc", "doc_a")
                .withColumnRenamed("set_size", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b")
              .withColumnRenamed("set_size", "size_b"), "doc_b")
    )
    scored = (
        co.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    # Fingerprint fallback: docs with NO rare shingles left (every
    # shingle was capped) can't appear in the inverted index; pair the
    # byte-identical (normalized) ones among them directly. The
    # anti-join input is vocabulary-sized at worst, and all-filtered
    # docs are rare by definition (each requires > max_doc_freq
    # replications of every one of its shingles).
    fps = with_fingerprint(df.select(F.col(id_col).alias("doc"),
                                     F.col(text_col)), text_col)
    dropped = fps.join(sizes, "doc", "left_anti").select("doc", "fingerprint")
    fallback = (
        dropped.alias("a")
        .join(dropped.alias("b"), "fingerprint")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return scored.unionByName(fallback)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup candidate pairs at scale: shingle → minhash signature
    (native xxhash64 with per-row permutation seeds) → band buckets →
    bucket self-join → exact-Jaccard verify. The banded join only
    shuffles (band, bucket-hash) keys, never the full cross product."""
    if num_hashes % bands != 0:
        # a non-dividing band count would silently drop the trailing
        # num_hashes % bands signature entries from bucketing — recall
        # of a smaller scheme at the cost of the larger one
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    banded = minhash_band_table(df, id_col, text_col, n, num_hashes, bands)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"), F.col("b.shingles").alias("sh_b"),
            F.col("a.set_size").alias("size_a"), F.col("b.set_size").alias("size_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.withColumn(
            "jaccard",
            F.round(inter / (F.col("size_a") + F.col("size_b") - inter), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """The persistable MinHash-LSH index: one row per (doc, band) with
    ``(doc, set_size, shingles, band, bucket)``. Signatures are pure
    per-document functions (xxhash64 with per-position seeds), so the
    SAME document always lands in the same buckets — the property that
    makes the index incremental (``minhash_probe_new``) and this
    table worth storing partitioned by (band, bucket) for point-probe
    reads. Shingle arrays ride along for the exact-Jaccard verify; a
    deployment storing only signatures would re-read the verify pair's
    texts instead."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    docs = df.select(
        F.col(id_col).alias("doc"), _word_shingles(text_col, n).alias("shingles")
    ).withColumn("set_size", F.size("shingles"))

    # signature[i] = min over shingles of xxhash64(shingle, i)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("shingles"), lambda s: F.xxhash64(s, i))
        ),
    )
    signed = docs.withColumn("sig", sig)
    return signed.select(
        "doc", "set_size", "shingles",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice("sig", b * rows_per_band + 1, rows_per_band))
                ),
            )
        ).alias("band", "bucket"),
    )


def minhash_probe_new(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Incremental near-dup: probe a fresh crawl batch against an
    EXISTING ``minhash_band_table`` index without recomputing it —
    the growing-corpus maintenance path (sibling of simsearch.
    ivf_assign_new). Returns ``(doc_new, doc_old, jaccard)`` verified
    pairs, new-vs-indexed only (dedup new-vs-new with
    ``minhash_lsh_pairs`` on the batch).

    Because signatures are per-document, the candidates generated here
    are EXACTLY the new×old candidates a full rebuild would generate —
    pinned by test_trainingdata: probe(new, index(old)) ∪
    pairs(new) ∪ pairs(old) == pairs(old ∪ new). The join shuffles
    only (band, bucket) keys; with the index stored (band,
    bucket)-partitioned this is a partition-pruned point probe per
    batch bucket."""
    new_banded = minhash_band_table(
        new_df, id_col, text_col, n, num_hashes, bands
    )
    cand = (
        new_banded.alias("a")
        .join(index.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc") != F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_new"), F.col("b.doc").alias("doc_old"),
            F.col("a.shingles").alias("sh_a"), F.col("b.shingles").alias("sh_b"),
            F.col("a.set_size").alias("size_a"), F.col("b.set_size").alias("size_b"),
        )
        .dropDuplicates(["doc_new", "doc_old"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.withColumn(
            "jaccard",
            F.round(inter / (F.col("size_a") + F.col("size_b") - inter), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_new", "doc_old", "jaccard")
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """64-bit SimHash signatures (doc, simhash) via Arrow-batched numpy
    bit-voting. Split out from the pair decision so the signature table
    can be exported and the banding/hamming decision replayed exactly
    in SQL (the DuckDB oracle for td_simhash_pairs)."""
    import hashlib

    import numpy as np
    import pandas as pd

    @F.pandas_udf(LongType())
    def simhash64(texts):
        # blake2b-based token hash: deterministic across workers
        # (Python's builtin hash() is salted per process — never use it
        # in a distributed signature).
        shifts = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tokens = (t or "").lower().split()
            if not tokens:
                continue
            votes = np.zeros(64, dtype=np.int64)
            for tok in tokens:
                h = np.uint64(int.from_bytes(
                    hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
                    "little",
                ))
                bits = (h >> shifts) & np.uint64(1)
                votes += np.where(bits.astype(bool), 1, -1)
            sig = int((votes > 0).astype(np.uint64) @ (np.uint64(1) << shifts))
            out[i] = np.int64(np.uint64(sig))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_t")) \
        .withColumn("simhash", simhash64("_t")).drop("_t")


def simhash_pairs_from_signatures(
    signed: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Banding + verify over a (doc, simhash) table: 4×16-bit chunks —
    docs within hamming ≤ 3 share at least one exact chunk
    (pigeonhole), so the bucket-join is lossless. Fully native SQL
    (shift/mask/xor/bit_count), hence exactly oracle-replayable."""
    chunks = signed.select(
        "doc", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned("simhash", k * 16).bitwiseAND(F.lit(0xFFFF))
                for k in range(4)
            ])
        ).alias("chunk_pos", "chunk"),
    )
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk_pos", "chunk"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("h_a"), F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dups end-to-end: signatures + banded pair decision
    (see the two stages above)."""
    return simhash_pairs_from_signatures(
        simhash_signatures(df, id_col, text_col), max_hamming
    )


def simhash_probe_new(
    new_signed: DataFrame,
    index_signed: DataFrame,
    max_hamming: int = 3,
) -> DataFrame:
    """Incremental SimHash near-dup: probe a fresh batch's signatures
    against a STORED (doc, simhash) signature table — every dedup
    family's growing-corpus path (MinHash: ``minhash_probe_new``;
    IVF: ``simsearch.ivf_assign_new``). Returns
    ``(doc_new, doc_old, hamming)`` verified pairs, new-vs-indexed
    only.

    Signatures are per-document, so probe candidates are EXACTLY the
    cross-side candidates a full rebuild would generate (pinned in
    test_trainingdata_ops). Store the index chunk-exploded and
    (chunk_pos, chunk)-partitioned and each batch probe is a
    partition-pruned point read; the pigeonhole banding (4×16-bit
    chunks ⊇ hamming ≤ 3) stays lossless."""
    def _chunks(signed):
        return signed.select(
            "doc", "simhash",
            F.posexplode(
                F.array(*[
                    F.shiftrightunsigned("simhash", k * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    for k in range(4)
                ])
            ).alias("chunk_pos", "chunk"),
        )

    cand = (
        _chunks(new_signed).alias("a")
        .join(_chunks(index_signed).alias("b"), ["chunk_pos", "chunk"])
        .filter(F.col("a.doc") != F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_new"), F.col("b.doc").alias("doc_old"),
            F.col("a.simhash").alias("h_a"), F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["doc_new", "doc_old"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_new", "doc_old", "hamming")
    )


def _dfreq_ordered_words(df, id_col: str, text_col: str):
    """(doc, sz, words): each document's DISTINCT word set sorted by
    ascending corpus document-frequency (rarest first; ties
    lexicographic — a total order). Shared by the prefix-filter and
    containment joins: both need the rarest-first order so prefixes
    index long-tail tokens. Tokenization = textstats._tokens, the ONE
    tokenizer the BM25/LM-score/span operators share."""
    from .textstats import _tokens

    toks = _tokens(F.col(text_col))
    docterms = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(toks)).alias("term"),
    )
    dfreq = docterms.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    return (
        docterms.join(dfreq, "term")
        .groupBy("doc")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dfreq", "term"))
            ).alias("okey"),
            F.count(F.lit(1)).alias("sz"),
        )
        .select(
            "doc", "sz",
            F.transform(F.col("okey"), lambda s: s["term"]).alias("words"),
        )
    )


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT word-set similarity join via prefix filtering (the
    All-Pairs / PPJoin family, Bayardo WWW'07 / Xiao WWW'08): returns
    every pair with word-set Jaccard ≥ ``threshold`` — no LSH recall
    loss — without the O(n²) scan.

    Principle: order every document's word set by ascending corpus
    document-frequency (rarest first; ties lexicographic — a total
    order). If J(x,y) ≥ t then |x∩y| ≥ ⌈t·|x|⌉, so x and y must share
    a token inside their first ``|·| − ⌈t·|·|⌉ + 1`` tokens; indexing
    only those prefixes yields a candidate set that provably contains
    all true pairs, then one exact array-intersect verify per
    candidate. A size filter (t·|x| ≤ |y| ≤ |x|/t, implied by J ≥ t)
    prunes candidates before the verify.

    Scale shape (100 TB): one corpus-bound doc-frequency aggregate,
    one per-doc array sort (narrow), and a postings self-join that
    shuffles ONLY prefix tokens — and because the order puts the
    rarest tokens in prefixes, hot tokens enter postings only for
    docs that contain almost nothing else (the classic bound), so the
    join keys are long-tail by construction. The final filter is on
    the UNROUNDED ratio so the operator's output is set-identical to
    the brute-force definition (the driver oracle is exact all-pairs).
    """
    # ordered feeds four consumers (two postings aliases + the two
    # verify-side fetches) — checkpoint once so the dfreq join +
    # collect_list agg never re-runs (the build_triples rule).
    ordered = _dfreq_ordered_words(df, id_col, text_col) \
        .localCheckpoint(eager=True)
    # ⌈t·sz⌉ in EXACT integer micro-units: IEEE ceil(0.8*5) is 5, not
    # 4 (0.8*5 = 4.0000000000000002 in doubles), which would shorten
    # prefixes / over-tighten the size filter and silently lose recall
    # at non-dyadic thresholds. Exact for thresholds with ≤ 6 decimals.
    t_micro = round(threshold * 1_000_000)
    ceil_t_sz = F.expr(f"CAST(({t_micro} * sz + 999999) DIV 1000000 AS INT)")
    p_len = (F.col("sz") - ceil_t_sz + 1).cast("int")
    postings = ordered.select(
        "doc", "sz",
        F.explode(F.slice(F.col("words"), 1, p_len)).alias("term"),
    )
    a, b = postings.alias("a"), postings.alias("b")
    # Candidate generation emits BARE id pairs: a pair is generated
    # once per shared prefix token (dozens of times in a near-dup
    # corpus), so the distinct() must shuffle 16-byte rows, not two
    # word arrays per occurrence (measured 2.6× end-to-end on the
    # dense sf0.1 corpus). Arrays are attached exactly once per
    # surviving pair for the verify.
    cand_ids = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (F.col("b.sz") * 1_000_000 >= t_micro * F.col("a.sz"))
            & (F.col("a.sz") * 1_000_000 >= t_micro * F.col("b.sz")),
        )
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
        )
        .distinct()
    )
    av = ordered.select(
        F.col("doc").alias("doc_a"), F.col("sz").alias("sa"),
        F.col("words").alias("wa"),
    )
    bv = ordered.select(
        F.col("doc").alias("doc_b"), F.col("sz").alias("sb"),
        F.col("words").alias("wb"),
    )
    cands = cand_ids.join(av, "doc_a").join(bv, "doc_b")
    # The intersect size feeds the ratio twice; binding it as a
    # lambda variable (single-element transform) keeps array_intersect
    # at ONE evaluation per expression instance instead of two (the
    # BENCH.md HOF-inlining rule). The filter and the projected round
    # are two instances — 2 intersects/pair, down from 4.
    jac = F.element_at(
        F.transform(
            F.array(
                F.size(F.array_intersect(F.col("wa"), F.col("wb")))
                .cast("double")
            ),
            lambda i: i / (F.col("sa") + F.col("sb") - i),
        ),
        1,
    )
    return (
        cands.withColumn("_j", jac)
        .filter(F.col("_j") >= threshold)
        .select(
            "doc_a", "doc_b",
            F.round(F.col("_j"), 4).alias("jaccard"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
) -> DataFrame:
    """EXACT directional containment join: (doc_a, doc_b, containment)
    for every pair with |A∩B| / |A| ≥ ``threshold`` (A's word set
    mostly inside B's) — the ASYMMETRIC sibling of
    ``prefix_filter_pairs``. Jaccard misses quote/subset relations
    between unequal-length docs (a paragraph fully contained in a
    10× longer page has tiny Jaccard); containment is the predicate
    benchmark decontamination and quote-dedup actually want.

    Prefix bound (contained side only): |A∩B| ≥ ⌈t·|A|⌉ forces a
    shared token inside A's first |A| − ⌈t·|A|⌉ + 1 rarest tokens.
    The container side has no symmetric bound — it contributes its
    FULL token postings (the inverted index a BM25 build pays
    anyway); the only size filter is |B| ≥ ⌈t·|A|⌉. All threshold
    arithmetic in exact integer micro-units (see
    prefix_filter_pairs); candidates dedup as bare id pairs; arrays
    attach once for the verify; verify is the unrounded ratio, so
    the output is set-identical to brute force (the driver oracle).
    """
    ordered = _dfreq_ordered_words(df, id_col, text_col) \
        .localCheckpoint(eager=True)
    t_micro = round(threshold * 1_000_000)
    ceil_t_sz = F.expr(f"CAST(({t_micro} * sz + 999999) DIV 1000000 AS INT)")
    p_len = (F.col("sz") - ceil_t_sz + 1).cast("int")
    a_post = ordered.select(
        "doc", "sz",
        F.explode(F.slice(F.col("words"), 1, p_len)).alias("term"),
    )
    b_post = ordered.select(
        "doc", "sz", F.explode(F.col("words")).alias("term")
    )
    cand_ids = (
        a_post.alias("a")
        .join(
            b_post.alias("b"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc") != F.col("b.doc"))
            & (
                F.col("b.sz") * 1_000_000
                >= F.expr(f"CAST(({t_micro} * a.sz + 999999) "
                          f"DIV 1000000 AS BIGINT) * 1000000")
            ),
        )
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
        )
        .distinct()
    )
    av = ordered.select(
        F.col("doc").alias("doc_a"), F.col("sz").alias("sa"),
        F.col("words").alias("wa"),
    )
    bv = ordered.select(
        F.col("doc").alias("doc_b"), F.col("words").alias("wb"),
    )
    cands = cand_ids.join(av, "doc_a").join(bv, "doc_b")
    cont = F.element_at(
        F.transform(
            F.array(
                F.size(F.array_intersect(F.col("wa"), F.col("wb")))
                .cast("double")
            ),
            lambda i: i / F.col("sa"),
        ),
        1,
    )
    return (
        cands.withColumn("_c", cont)
        .filter(F.col("_c") >= threshold)
        .select(
            "doc_a", "doc_b",
            F.round(F.col("_c"), 4).alias("containment"),
        )
    )


def dedup_keep_best(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup that keeps the BEST-scoring copy per fingerprint
    instead of the min id — the production rule when duplicates differ
    in metadata quality (the same article crawled from an AMP mirror,
    a print view, and the canonical page: keep the copy the quality
    scorer ranked highest, drop the rest). Ties break on ascending id,
    so the choice is total and replayable.

    Same single-shuffle shape as :func:`dedup_exact` (window per
    fingerprint); emits ``n_dropped`` per surviving row so the mix
    accounting downstream can weight survivors by their duplication
    count (mix_sources consumes it for frequency-aware sampling)."""
    fp = with_fingerprint(df, text_col)
    w = Window.partitionBy("fingerprint").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    wc = Window.partitionBy("fingerprint")
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_dropped", (F.count(F.lit(1)).over(wc) - 1).cast("long"))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fingerprint")
    )


def group_representatives(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """O(docs) dedup DECISION TABLE from an O(pairs) similarity edge
    list: ``(doc_id, rep_id, group_size, keep)``. Any pair generator
    in this module (``prefix_filter_pairs``, ``minhash_lsh_pairs``,
    ``simhash_pairs``, ``ngram_jaccard_pairs``) emits the evidence;
    this wrapper turns it into the deliverable a dedup pass actually
    ships — at web scale a near-dup-dense corpus yields ~O(n·k) pairs
    (8.93M on the sf0.1 bench corpus) but only O(n) keep/drop rows.

    Semantics: groups are the CONNECTED COMPONENTS of the pair graph
    (A~B, B~C groups all three even when A,C were never compared —
    exactly the q_dup_groups closure), ``rep_id`` is the group's min
    doc id (the union-by-min root convention), ``keep`` marks the one
    representative per group. Pass ``docs`` (any DataFrame carrying
    ``id_col``) to also emit singletons — docs with no near-dup edge —
    as kept groups of size 1, making the output a TOTAL decision over
    the corpus instead of a verdict only on paired docs.

    Scale shape: components via :func:`graph_algos.graph_components`
    (driver union-find while the pair graph is vocabulary-sized,
    distributed min-label propagation beyond); the singleton fill is
    one left-anti join; sizes are one partial-agg groupBy on group
    keys joined back node-keyed. No step is pair-quadratic.
    """
    from .graph_algos import graph_components

    comp = graph_components(
        pairs.select(F.col(a_col).alias("subj_id"), F.col(b_col).alias("obj_id"))
    )
    grouped = comp.select(
        F.col("node_id").alias(id_col), F.col("component_id").alias("rep_id")
    )
    if docs is not None:
        singles = (
            docs.select(id_col).distinct()
            .join(grouped.select(id_col), id_col, "left_anti")
            .select(F.col(id_col), F.col(id_col).cast("long").alias("rep_id"))
        )
        grouped = grouped.unionByName(singles)
    sizes = grouped.groupBy("rep_id").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return grouped.join(sizes, "rep_id").select(
        id_col,
        "rep_id",
        "group_size",
        (F.col(id_col) == F.col("rep_id")).alias("keep"),
    )
