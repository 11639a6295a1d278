"""Span-level cross-document deduplication.

Two operators mirroring the two prominent web-pipeline passes that the
document-level dedup family (operators/dedup.py) does not cover:

- :func:`duplicate_span_stats` — overlapping word *n*-gram windows with
  a doc-frequency inverted index: the per-document duplicated-window
  fraction used by exact-substring training-data dedup (Lee et al.
  2022, "Deduplicating Training Data Makes Language Models Better"),
  plus a keep gate.
- :func:`remove_boilerplate_segments` — non-overlapping segments
  (lines when the corpus has a delimiter, fixed word blocks otherwise)
  whose doc frequency reaches ``min_docs`` are dropped and the text is
  reassembled in order: the RefinedWeb / CCNet line-dedup pass.

Scale shape (both): explode → aggregate per (doc, span-key) →
doc-frequency per key (partial-agg friendly: input rows are already
distinct per (doc, key), so the frequency agg is a plain count) →
hash-join back on the key. Shuffles carry an 8-byte ``xxhash64`` key,
not the raw span text (``key="string"`` exists for oracle replay and
collision pins; the hashed and string paths are decision-identical
short of a 64-bit collision). No driver-side collection anywhere; at
10⁹ documents every stage is a standard inverted-index shuffle whose
reducer keys are span hashes — the hottest key is a globally repeated
span, whose per-key state is one count, not a row list, so skew cannot
OOM a reducer.

All logic is native Spark SQL expressions (whole-stage codegen — the
window/segment builders are ``transform``/``sequence``/``slice`` HOF
chains, no Python). Exact DuckDB oracles replay both operators in the
driver gate (q_dup_spans, q_boilerplate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens


def _word_windows(text_col: str, n: int) -> Column:
    """Overlapping ``n``-word windows (stride 1) as space-joined
    strings; docs shorter than ``n`` words yield an empty array.
    (Delegates to the token-array variant so window semantics live in
    one place — see ``_word_windows_from_tokens``.)"""
    return _word_windows_over(_tokens(F.col(text_col)), n)


def _word_blocks(text_col: str, n: int) -> Column:
    """Non-overlapping ``n``-word blocks as ``struct(pos, seg)`` —
    position is kept so the cleaned text reassembles in order."""
    toks = _tokens(F.col(text_col))
    n_blocks = F.ceil(F.size(toks) / F.lit(float(n))).cast("int")
    return F.when(
        n_blocks >= 1,
        F.transform(
            F.sequence(F.lit(1), n_blocks),
            lambda b: F.struct(
                b.alias("pos"),
                F.array_join(F.slice(toks, (b - 1) * n + 1, n), " ").alias("seg"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,seg:string>>"))


def _line_segments(text_col: str, delimiter: str) -> Column:
    """Delimiter-split segments (the literal line-dedup case) as
    ``struct(pos, seg)``; blank segments are kept so reassembly is
    position-faithful."""
    parts = F.split(F.col(text_col), delimiter, -1)
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.struct(i.alias("pos"), F.element_at(parts, i).alias("seg")),
    )


def _reuse(df: DataFrame, enabled: bool) -> DataFrame:
    """Lazy localCheckpoint for an intermediate that feeds 2+
    consumers: computed once at first action, reused after — without
    it every consumer re-runs the explode lineage (the repo-wide
    two-consumer rule; see plans/pipeline.py stage commits). Lazy so
    operator construction stays action-free; disable (`reuse=False`)
    when the caller materializes the intermediate itself (e.g. a
    stored postings table)."""
    return df.localCheckpoint(eager=False) if enabled else df


def _span_key(span: Column, key: str) -> Column:
    if key == "hash":
        return F.xxhash64(span)
    if key == "string":
        return span
    raise ValueError(f"key must be 'hash' or 'string', got {key!r}")


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 2,
    max_dup_bp: int = 5000,
    key: str = "hash",
    reuse: bool = True,
) -> DataFrame:
    """Per-document duplicated-window statistics.

    A window (overlapping ``n``-word span, stride 1) is *duplicated*
    when the span occurs in at least ``min_docs`` distinct documents.
    Output per input row: ``n_windows`` (total window positions),
    ``dup_windows`` (positions whose span is duplicated — occurrences,
    not distinct spans, matching the span-fraction measure of Lee et
    al. 2022 §4), ``dup_bp`` (basis points of duplicated positions)
    and ``keep`` (``dup_bp <= max_dup_bp``).

    Plan: one explode, one (doc, key) partial-aggregate, one count per
    key, one hash-join back — every shuffle keyed by the 8-byte span
    hash. Spans repeated across millions of docs aggregate to a single
    count per key (no per-key row lists), so global boilerplate cannot
    skew-OOM a reducer.
    """
    spans = df.select(
        F.col(id_col), F.explode(_word_windows(text_col, n)).alias("_span")
    ).select(id_col, _span_key(F.col("_span"), key).alias("_k"))
    # occurrences of each span per doc; rows now distinct per (doc, key)
    per = _reuse(
        spans.groupBy(id_col, "_k").agg(F.count(F.lit(1)).alias("_occ")),
        reuse,
    )
    freq = per.groupBy("_k").agg(F.count(F.lit(1)).alias("_df_docs"))
    dup = (
        per.join(freq.filter(F.col("_df_docs") >= min_docs), "_k")
        .groupBy(id_col)
        .agg(F.sum("_occ").alias("dup_windows"))
    )
    n_win = F.greatest(
        F.lit(0), F.size(_tokens(F.col(text_col))) - F.lit(n - 1)
    ).cast("long")
    return (
        df.withColumn("n_windows", n_win)
        .join(dup, id_col, "left")
        .withColumn("dup_windows", F.coalesce(F.col("dup_windows"), F.lit(0)))
        .withColumn(
            "dup_bp",
            # integer `div` (not FP /): the repo's fixed-point
            # convention, matching the DuckDB oracle's `//` exactly
            F.expr(
                "CASE WHEN n_windows > 0"
                " THEN (10000 * dup_windows) div n_windows"
                " ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .withColumn("keep", F.col("dup_bp") <= max_dup_bp)
    )


def remove_boilerplate_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_docs: int = 3,
    delimiter: str | None = None,
    key: str = "hash",
    reuse: bool = True,
) -> DataFrame:
    """Drop segments that repeat across ``min_docs`` documents and
    reassemble the text (RefinedWeb line-dedup; CCNet paragraph hash).

    Segments are ``delimiter``-split lines when ``delimiter`` is given,
    else non-overlapping ``n``-word blocks (for corpora without line
    structure). Every occurrence of a boilerplate segment is removed —
    including from the doc that "owns" it — and the remainder is
    rejoined in original order. Docs whose segments are all
    boilerplate stay in the output with empty ``clean_text``. EMPTY
    segments (blank lines / consecutive delimiters) are never
    classified boilerplate — they are structure, not content, and
    stripping them corpus-wide would collapse the paragraph breaks of
    otherwise-unique documents.

    Output: input row + ``n_segments``, ``removed_segments``,
    ``clean_text``.

    Plan: explode with position → distinct (doc, key) doc-frequency →
    broadcast-unfriendly-safe hash-join of the (vocabulary-sized)
    boilerplate key set back onto the exploded segments → ordered
    array reassembly (``sort_array(collect_list(struct(pos, seg)))``,
    partial-agg friendly; one shuffle keyed by ``id_col``). With
    ``reuse`` (default) the per-doc SEGMENT-ARRAY frame — input-sized,
    never the exploded table — is lazily checkpointed so the three
    consumers re-explode from memory instead of rescanning the source.
    """
    seg_col = (
        _line_segments(text_col, delimiter)
        if delimiter is not None
        else _word_blocks(text_col, n)
    )
    arr = _reuse(df.select(F.col(id_col), seg_col.alias("_segs")), reuse)
    segs = arr.select(id_col, F.explode("_segs").alias("_s")).select(
        id_col,
        F.col("_s.pos").alias("_pos"),
        F.col("_s.seg").alias("_seg"),
    ).withColumn("_k", _span_key(F.col("_seg"), key))
    freq = (
        segs.filter(F.length("_seg") > 0)
        .select(id_col, "_k")
        .distinct()
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_df_docs"))
    )
    boiler = freq.filter(F.col("_df_docs") >= min_docs).select("_k")
    kept = segs.join(boiler, "_k", "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("_pos"), F.col("_seg")))
                    ),
                    lambda s: s["_seg"],
                ),
                " " if delimiter is None else _plain_delim(delimiter),
            ).alias("clean_text"),
        )
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_segments"))
    return (
        df.join(totals, id_col, "left")
        .withColumn("n_segments", F.coalesce(F.col("n_segments"), F.lit(0)))
        .join(rebuilt, id_col, "left")
        .withColumn(
            "removed_segments",
            (F.col("n_segments") - F.coalesce(F.col("_n_kept"), F.lit(0))).cast(
                "long"
            ),
        )
        .withColumn("n_segments", F.col("n_segments").cast("long"))
        .withColumn("clean_text", F.coalesce(F.col("clean_text"), F.lit("")))
        .drop("_n_kept")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 2,
    key: str = "hash",
    reuse: bool = True,
) -> DataFrame:
    """Remove every token covered by a cross-document duplicated span
    — the remediation half of exact-substring dedup (Lee et al. 2022
    cut the duplicated spans out of the corpus rather than dropping
    documents).

    A window (overlapping ``n``-word run) is duplicated when its span
    occurs in ≥ ``min_docs`` distinct documents; all ``n`` token
    positions under any duplicated window are removed and the
    remaining tokens are rejoined in order. Docs left with no tokens
    keep their row with empty ``clean_text``.

    Output: input row + ``n_tokens``, ``removed_tokens``,
    ``clean_text``.

    Plan — linear and equi-join only (no range join, no per-doc
    quadratic scan): posexplode windows → doc-frequency per span hash
    → duplicated window starts → explode each start to its ``n``
    covered positions (constant fan-out) → distinct → anti-join
    against posexploded tokens → ordered reassembly via one
    sorted-struct collect keyed by ``id_col``.
    """
    toks = _tokens(F.col(text_col))
    base = _reuse(df.select(F.col(id_col), toks.alias("_toks")), reuse)
    wins = base.select(
        id_col, F.posexplode(_word_windows_from_tokens("_toks", n))
    ).select(id_col, F.col("pos").alias("_start"), F.col("col").alias("_span"))
    # wins feeds two consumers but re-explodes narrowly from the
    # checkpointed token frame — storing the window-scale explosion
    # would cost more than recomputing it from memory
    wins = wins.withColumn("_k", _span_key(F.col("_span"), key)).drop("_span")
    freq = (
        wins.select(id_col, "_k")
        .distinct()
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_df_docs"))
    )
    dup_starts = wins.join(
        freq.filter(F.col("_df_docs") >= min_docs).select("_k"), "_k"
    ).select(id_col, "_start")
    covered = dup_starts.select(
        id_col,
        F.explode(
            F.sequence(F.col("_start"), F.col("_start") + F.lit(n - 1))
        ).alias("_j"),
    ).distinct()
    tokens = base.select(
        id_col, F.posexplode(F.col("_toks"))
    ).select(id_col, F.col("pos").alias("_j"), F.col("col").alias("_tok"))
    kept = tokens.join(covered, [id_col, "_j"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("_j"), F.col("_tok")))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        # greatest(0, ·): F.size(NULL) is -1 — a NULL-text row must
        # account as 0 tokens, like the sibling operators
        df.withColumn(
            "n_tokens",
            F.greatest(F.lit(0), F.size(toks)).cast("long"),
        )
        .join(rebuilt, id_col, "left")
        .withColumn(
            "removed_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))).cast(
                "long"
            ),
        )
        .withColumn("clean_text", F.coalesce(F.col("clean_text"), F.lit("")))
        .drop("_n_kept")
    )


def _word_windows_from_tokens(tokens_col: str, n: int) -> Column:
    """Overlapping ``n``-word windows over an existing token-array
    column (empty array when shorter than ``n``); 0-based positions
    via ``posexplode`` line up with token positions."""
    return _word_windows_over(F.col(tokens_col), n)


def _word_windows_over(toks: Column, n: int) -> Column:
    """The single window-builder both entry points share."""
    n_win = F.size(toks) - F.lit(n - 1)
    return F.when(
        n_win >= 1,
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _plain_delim(delimiter: str) -> str:
    """Reassembly joiner for a delimiter *regex*: the common literal
    cases pass through; genuinely regex-y delimiters reassemble with
    their unescaped literal (documented limitation — the original
    inter-segment bytes are not retained)."""
    return (
        delimiter.replace("\\n", "\n")
        .replace("\\r", "\r")
        .replace("\\t", "\t")
        .replace("\\.", ".")
    )


def dedup_within_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    delimiter: str | None = None,
) -> DataFrame:
    """WITHIN-document repeated-segment removal: keep the first
    occurrence of each segment inside a doc, drop later repeats —
    the nav-menu/sidebar-repeated-inside-one-page pass that cross-doc
    boilerplate removal (min_docs ≥ 2 across DOCS) cannot express.

    Pure per-row HOF chain (no shuffle, no join, whole-stage codegen):
    segments → keep index i iff the first ``array_position`` of its
    segment equals i. Empty segments are always kept (structure, not
    content — same rule as the cross-doc operator).

    Output: input row + ``n_segments``, ``removed_segments``,
    ``clean_text``.
    """
    seg_col = (
        _line_segments(text_col, delimiter)
        if delimiter is not None
        else _word_blocks(text_col, n)
    )
    joiner = " " if delimiter is None else _plain_delim(delimiter)
    segs = F.transform(seg_col, lambda s: s["seg"])
    kept = F.filter(
        segs,
        lambda s, i: (F.length(s) == 0)
        | (F.array_position(segs, s) == i + F.lit(1)),
    )
    t = df.withColumn("_segs", segs).withColumn("_kept", kept)
    return (
        t.withColumn("n_segments", F.size("_segs").cast("long"))
        .withColumn(
            "removed_segments",
            (F.size("_segs") - F.size("_kept")).cast("long"),
        )
        .withColumn("clean_text", F.array_join("_kept", joiner))
        .drop("_segs", "_kept")
    )
