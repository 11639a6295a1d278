"""Composed training-export plan: the full corpus-to-training-shards
decision chain as ONE declarative DataFrame pipeline.

Order (each stage is an already-oracled operator; the composition is
itself exactly replayable in SQL — `__spark_entry__.q_training_export`):

1. **Quality gate** — Gopher repetition/diversity rules
   (``textstats.with_repetition_stats`` + ``gopher_keep``).
2. **PII scrub** — ``scrub.redact_pii``; the redacted text is what
   ships, and per-class counts feed the report.
3. **Exact dedup** — ``textstats.with_fingerprint`` over the REDACTED
   text (two docs differing only in redacted PII are the same training
   example); min-key per fingerprint is canonical, among quality-kept
   docs only.
4. **Decontamination** — ``contamination.contamination`` word-n-gram
   overlap vs the benchmark, over the ORIGINAL text (placeholder
   tokens must not mask an overlap).
5. **Leakage-safe split** — ``sampling.train_test_split`` by document
   key.
6. **Shard + pack** — ``packing.pack_sequences`` over the train
   survivors (token count = whitespace tokens of the redacted text).

Scale shape: stages 1–2 fuse into one narrow pass over the corpus;
stage 3 is one hash aggregation + a doc-keyed decision join; stage 4
is the broadcast gram probe; stages 5–6 are a narrow filter and the
per-shard packing window. The decision-table joins at the end are all
keyed by the unique document key (one row per document each side), so
AQE plans them as plain co-partitioned hash joins — nothing here is
quadratic or driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.contamination import contamination
from ..operators.packing import pack_sequences
from ..operators.sampling import BUCKETS, hash_bucket
from ..operators.scrub import PII_PATTERNS, redact_pii
from ..operators.textstats import gopher_keep, with_fingerprint, with_repetition_stats


def training_export(
    docs: DataFrame,
    benchmark: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 512,
    n_shards: int = 8,
    test_frac: float = 0.1,
    seed: int = 0,
    ngram_n: int = 5,
    gopher_kwargs: dict | None = None,
) -> DataFrame:
    """Per-document decision table for the export: one row per input
    document with every gate's verdict and, for packed train docs, the
    shard/sequence assignment.

    Columns: ``(key, keep_quality, n_pii, is_canonical, contaminated,
    side, shard, seq_first, offset_in_seq, n_seqs)``. ``is_canonical``
    is false for quality-dropped docs (they never reach dedup); ``side``
    is 'train'/'test' for survivors and null otherwise; the packing
    columns are non-null only for train survivors."""
    stats = gopher_keep(with_repetition_stats(docs, text_col),
                        **(gopher_kwargs or {}))
    red = redact_pii(stats, text_col=text_col)
    n_pii = sum(F.col(f"n_{name}") for name, _, _ in PII_PATTERNS).cast("long")
    red = with_fingerprint(red, text_col="redacted").select(
        key_col, "keep", n_pii.alias("n_pii"), "fingerprint",
        F.size(F.split(F.col("redacted"), " ")).cast("long").alias("n_tokens"),
    )

    canon = (
        red.filter("keep")
        .groupBy("fingerprint")
        .agg(F.min(key_col).alias("_canonical_key"))
    )
    cont = contamination(docs, benchmark, key_col, text_col, ngram_n)

    decided = (
        red.join(canon, "fingerprint", "left")
        .withColumn(
            "is_canonical",
            F.col("keep") & (F.col(key_col) == F.col("_canonical_key")),
        )
        .join(cont.select(key_col, "contaminated"), key_col)
        .withColumn(
            "_survives",
            F.col("keep") & F.col("is_canonical") & ~F.col("contaminated"),
        )
        .withColumn(
            "side",
            F.when(
                F.col("_survives"),
                F.when(
                    hash_bucket(F.col(key_col), seed, domain="split:")
                    < int(test_frac * BUCKETS),
                    F.lit("test"),
                ).otherwise(F.lit("train")),
            ),
        )
    )

    packed = pack_sequences(
        decided.filter(F.col("side") == "train")
        .select(key_col, "n_tokens"),
        key_col, "n_tokens", capacity=capacity, n_shards=n_shards, seed=seed,
    ).select(key_col, "shard", "seq_first", "offset_in_seq", "n_seqs")

    return (
        decided.join(packed, key_col, "left")
        .select(
            key_col,
            F.col("keep").alias("keep_quality"),
            "n_pii", "is_canonical", "contaminated", "side",
            "shard", "seq_first", "offset_in_seq", "n_seqs",
        )
    )
