"""Composed webtext corpus-prep plan: the span-level cleaning chain a
web-crawl training pipeline runs BEFORE document-level dedup, as one
declarative DataFrame pipeline (RefinedWeb ordering: line/segment
dedup → span cut → quality filter → exact dedup).

Order (each stage is an already-oracled operator; the composition is
itself exactly replayable in SQL — `__spark_entry__.q_webtext_prep`):

1. **Boilerplate-segment removal** — ``spans.
   remove_boilerplate_segments``: segments repeated across ≥
   ``boiler_min_docs`` docs dropped everywhere, text reassembled.
2. **Duplicate-span scrub** — ``spans.remove_duplicate_spans`` over
   the boilerplate-cleaned text (Lee et al. 2022 span cut): tokens
   under any cross-doc duplicated window removed.
3. **Quality gate** — Gopher repetition/diversity rules over the
   SCRUBBED text (``textstats.with_repetition_stats`` +
   ``gopher_keep``) — filters must judge what would actually ship.
4. **Exact dedup** — fingerprint over the scrubbed text; min-key per
   fingerprint canonical, among quality-kept docs only.

Scale shape: stages 1–2 are inverted-index shuffles keyed by 8-byte
span hashes with count-only reducer state; stage 3 is one narrow HOF
pass; stage 4 one hash aggregation + a doc-keyed decision join. The
final assembly joins are all one-row-per-document on the key — AQE
plans them as co-partitioned hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.spans import (
    remove_boilerplate_segments,
    remove_duplicate_spans,
)
from ..operators.textstats import gopher_keep, with_fingerprint, with_repetition_stats


def webtext_prep(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    boiler_n: int = 4,
    boiler_min_docs: int = 3,
    span_n: int = 3,
    span_min_docs: int = 2,
    gopher_kwargs: dict | None = None,
    checkpoint_stages: bool = True,
) -> DataFrame:
    """Per-document decision table for the prep chain: one row per
    input document with every stage's accounting and verdict.

    Columns: ``(key, n_segments, removed_segments, removed_tokens,
    n_words, keep_quality, is_canonical, clean_text)`` —
    ``removed_tokens`` counts the span-scrub cut on the
    boilerplate-cleaned text; ``n_words`` / ``keep_quality`` judge the
    final scrubbed text; ``is_canonical`` is false for quality-dropped
    docs (they never reach dedup).
    """
    # each stage output feeds several downstream consumers (the span
    # operators fan their input into explode/totals/join branches) —
    # lazy-checkpoint between stages or the composed lineage re-runs
    # every upstream inverted-index pass per consumer (repo
    # two-consumer rule); pass checkpoint_stages=False when committing
    # each stage to storage instead (plans/pipeline.py commit_stage)
    def _stage(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False) if checkpoint_stages else df

    bp = _stage(
        remove_boilerplate_segments(
            docs, text_col=text_col, id_col=key_col,
            n=boiler_n, min_docs=boiler_min_docs,
        ).select(
            key_col, "n_segments", "removed_segments",
            F.col("clean_text").alias("_bp_text"),
        )
    )
    scrub = _stage(
        remove_duplicate_spans(
            bp, text_col="_bp_text", id_col=key_col,
            n=span_n, min_docs=span_min_docs,
        ).select(
            key_col, "n_segments", "removed_segments", "removed_tokens",
            "clean_text",
        )
    )
    stats = gopher_keep(
        with_repetition_stats(scrub, "clean_text"),
        **(gopher_kwargs or {}),
    )
    printed = _stage(with_fingerprint(stats, text_col="clean_text"))
    canon = (
        printed.filter("keep")
        .groupBy("fingerprint")
        .agg(F.min(key_col).alias("_canonical_key"))
    )
    return (
        printed.join(canon, "fingerprint", "left")
        .select(
            key_col,
            "n_segments",
            "removed_segments",
            "removed_tokens",
            "n_words",
            F.col("keep").alias("keep_quality"),
            (
                F.col("keep") & (F.col(key_col) == F.col("_canonical_key"))
            ).alias("is_canonical"),
            "clean_text",
        )
    )
