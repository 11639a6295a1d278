"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003
— the MOSS local fingerprinting algorithm) and the candidate-pair
join built on them.

Why a second fingerprint family next to
``textstats.rolling_fingerprints``: the stride sampler there picks
k-grams at fixed byte offsets, so inserting ONE character near the
front of a document shifts every later window onto new gram
boundaries and the fingerprint sets diverge completely. Winnowing
selects the RIGHTMOST-MINIMUM gram hash inside every window of ``w``
consecutive k-gram hashes — selection depends only on local content,
which buys the two MOSS guarantees:

- any substring shared between two documents of length ≥ ``w + k - 1``
  contributes at least one shared fingerprint *value* (detection
  guarantee), and
- expected density is ``2 / (w + 1)`` of gram positions (sparsity
  guarantee), independent of document length.

Gram hashes use the repo's cross-engine idiom (first 15 hex chars of
``md5('win:' || gram)`` as a BIGINT — ``sampling.md5_mod``), so a
DuckDB oracle replays the selection bit-exactly.

Scale shape: fingerprint construction is one narrow whole-stage-
codegen projection per document (HOF ``transform`` over window
starts, ``aggregate`` for the rightmost-min — no Python, no shuffle);
work is O(chars · w) per document, embarrassingly parallel. The only
shuffles are the fingerprint ``distinct`` (8-byte keys) and the
candidate-pair inverted-index join, whose hottest key — a boilerplate
gram shared by everything — is removed by the ``max_df`` stop-
fingerprint cap exactly like the stop-shingle cap in
``dedup.jaccard_ngram_pairs``.

Reference parity note: the reference repo has no fingerprinting at
all (its dedup is fuzzy name matching, src/entity_processing/
deduplication.py); this family is part of the beyond-reference
training-data surface (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sentinel above any 60-bit gram hash — the aggregate() fold's init;
#: any real window element replaces it on the first step.
_SENTINEL = (1 << 62)


def _gram_hash(gram: Column) -> Column:
    """First 15 hex chars of md5('win:' || gram) as BIGINT (60 bits —
    BIGINT-safe; DuckDB: ``CAST(('0x' || substr(md5('win:' || g), 1,
    15))::UBIGINT AS BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("win:"), gram)), 1, 15), 16, 10
    ).cast("bigint")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 12,
) -> DataFrame:
    """Winnowing fingerprint set per document: distinct ``(id, pos,
    fp)`` rows where ``fp`` is the minimum k-gram hash of some
    ``w``-window and ``pos`` (1-based gram position) its RIGHTMOST
    occurrence inside that window — the standard winnowing tie-break
    (rightmost keeps selections stable as the window slides, which is
    what yields the 2/(w+1) density bound).

    Text is normalized exactly like ``rolling_fingerprints`` (trim +
    lower + whitespace collapse). Documents shorter than ``k`` chars
    yield ONE whole-string fingerprint at pos 1; documents with fewer
    than ``w`` grams get a single window over all their grams; NULL or
    empty text yields no rows (nothing to fingerprint).
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    t = df.select(F.col(id_col), norm.alias("_norm")).withColumn(
        "_ng", (F.length("_norm") - F.lit(k - 1)).cast("int")
    )
    short = (
        t.filter((F.col("_ng") < 1) & (F.length("_norm") >= 1))
        .select(
            id_col,
            F.lit(1).alias("pos"),
            _gram_hash(F.col("_norm")).alias("fp"),
        )
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.col("_ng")),
        lambda i: _gram_hash(F.col("_norm").substr(i, F.lit(k))),
    )
    init = F.struct(
        F.lit(_SENTINEL).cast("bigint").alias("h"), F.lit(0).alias("i")
    )
    selected = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.col("_ng") - F.lit(w - 1))),
        lambda j: (
            lambda win: (
                lambda best: F.struct(
                    (j + best["i"] - F.lit(1)).cast("int").alias("pos"),
                    best["h"].alias("fp"),
                )
            )(
                # rightmost minimum: <= replaces on ties as the fold
                # walks left→right, so the LAST minimal index wins
                F.aggregate(
                    F.zip_with(
                        win,
                        F.sequence(F.lit(1), F.size(win)),
                        lambda h, i: F.struct(h.alias("h"), i.alias("i")),
                    ),
                    init,
                    lambda acc, x: F.when(x["h"] <= acc["h"], x).otherwise(acc),
                )
            )
        )(F.slice(F.col("_h"), j, w)),
    )
    long_rows = (
        t.filter(F.col("_ng") >= 1)
        .withColumn("_h", grams)
        .select(id_col, F.explode(selected).alias("_s"))
        .select(id_col, F.col("_s.pos").alias("pos"), F.col("_s.fp").alias("fp"))
        .distinct()
    )
    return long_rows.unionByName(short)


def winnow_candidate_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """MOSS-style candidate pairs: documents ranked by how many
    winnowing fingerprint VALUES they share. Input is the
    :func:`winnow_fingerprints` output (positions are ignored — value
    overlap is the similarity signal); output ``(doc_a, doc_b,
    shared_fps)`` with ``doc_a < doc_b`` and ``shared_fps >=
    min_shared``.

    ``max_df`` drops fingerprints present in more than that many
    documents BEFORE the pair join — the stop-fingerprint cap that
    keeps a boilerplate gram (site chrome, license header) from
    exploding the inverted index quadratically; at web scale leave it
    at a few hundred. Plan: distinct → (optional) doc-frequency
    anti-join → self equi-join on ``fp`` → count per pair. Every
    shuffle key is the 8-byte fingerprint or the id pair.
    """
    d = fps.select(F.col(id_col).alias("_id"), "fp").distinct()
    if max_df is not None:
        hot = (
            d.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("fp")
        )
        d = d.join(hot, "fp", "left_anti")
    a = d.select(F.col("_id").alias("doc_a"), "fp")
    b = d.select(F.col("_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def winnow_probe(
    index_fps: DataFrame,
    new_fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Incremental-maintenance path of the winnowing index (the
    growing-corpus sibling of ``dedup.minhash_probe``): candidate
    pairs INVOLVING at least one new document — new-vs-index plus
    new-vs-new — decision-identical to rebuilding
    :func:`winnow_candidate_pairs` over the union and keeping the
    pairs that touch a new doc (pytest-pinned; the ``max_df``
    stop-fingerprint cap is recomputed over the UNION's document
    frequencies, exactly as a rebuild would see them).

    Scale shape: the only join that touches the full index is
    new-side-keyed (probe fingerprints × inverted index on the 8-byte
    fp), so cost is proportional to the batch, not the corpus; the
    union df-count recheck is one fp-keyed partial agg."""
    d_all = (
        index_fps.select(F.col(id_col).alias("_id"), "fp")
        .unionByName(new_fps.select(F.col(id_col).alias("_id"), "fp"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds the cap, both join sides
    )
    if max_df is not None:
        hot = (
            d_all.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("fp")
        )
        d_all = d_all.join(hot, "fp", "left_anti")
    new_ids = new_fps.select(F.col(id_col).alias("_id")).distinct()
    probe = d_all.join(new_ids, "_id").select(
        F.col("_id").alias("_n"), "fp"
    )
    other = d_all.join(
        new_ids.withColumn("_isnew", F.lit(1)), "_id", "left"
    ).select(F.col("_id").alias("_o"), "fp", "_isnew")
    return (
        probe.join(other, "fp")
        .filter(
            (F.col("_n") != F.col("_o"))
            # old partner: keep once; new partner: keep only the
            # (smaller, larger) orientation so shared counts aren't doubled
            & (F.col("_isnew").isNull() | (F.col("_n") < F.col("_o")))
        )
        .select(
            F.least("_n", "_o").alias("doc_a"),
            F.greatest("_n", "_o").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
