"""PII scrubbing for training-data export.

A corpus leaving the pipeline for model training must not carry
personal contact data verbatim; the standard treatment (C4, RefinedWeb,
FineWeb pipelines) is regex-class redaction of emails / phone numbers /
IP addresses with typed placeholder tokens, plus per-class counts so a
quality monitor can watch PII density per source domain.

Scale shape: one narrow ``Project`` — a chain of ``regexp_count`` /
``regexp_replace`` expressions inside whole-stage codegen. No UDF, no
shuffle, no extra scan; at 100 TB this fuses into whatever stage
already reads the text column. The patterns are written in the common
Java-regex/RE2 subset (no lookaround, no backreferences) so the exact
same pattern strings run on Spark and on the DuckDB oracle
(`__spark_entry__.q_pii_redact` replays count+replace chain and
compares the sha256 of the redacted text per row).

Redaction order matters and is part of the contract: emails first
(so their dotted domains can never be re-matched as IPv4), then
phones, then IPv4. Each class's count is taken on the text as it
stands *after* the previous class's replacement — the oracle replays
the identical chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) — pattern strings are valid and
#: equivalent in both Java regex (Spark) and RE2 (DuckDB).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Redact the :data:`PII_PATTERNS` classes from ``text_col``.

    Adds ``n_email`` / ``n_phone`` / ``n_ipv4`` (long — match count per
    class, evaluated in chain order) and ``out_col`` (the fully
    redacted text). Pure native expression chain; see module docstring
    for the scale story and the cross-engine oracle contract."""
    cur = F.col(text_col)
    out = df
    for name, pattern, replacement in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(cur, F.lit(pattern)).cast("long")
        )
        cur = F.regexp_replace(cur, pattern, replacement)
    return out.withColumn(out_col, cur)


def pii_density(df: DataFrame, by: str = "source") -> DataFrame:
    """Per-group PII density report over a :func:`redact_pii` output —
    the monitor-facing rollup (docs, total hits per class, hit-rate in
    basis points). Partial-agg-friendly groupBy; integers only so the
    report is engine-exact."""
    hits = sum(F.col(f"n_{name}") for name, _, _ in PII_PATTERNS)
    return (
        df.withColumn("_hits", hits)
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum(f"n_{name}").cast("long").alias(f"total_{name}")
                for name, _, _ in PII_PATTERNS
            ],
            F.sum((F.col("_hits") > 0).cast("long")).alias("n_docs_with_pii"),
        )
        .withColumn(
            "pii_doc_bp",
            F.expr("(10000 * n_docs_with_pii) div n_docs").cast("long"),
        )
    )


def blocklist_gate(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
) -> DataFrame:
    """C4-style blocklist gate: per-doc count of blocklisted TOKENS
    (the shared whitespace tokenization — substring hits inside other
    words don't count, the C4 "bad words" rule) and the keep flag.

    ``terms`` is vocabulary-sized and lowercased here; the membership
    probe is a native ``array_intersect``-free token filter inside
    whole-stage codegen (one literal-set ``isin`` per token — no join,
    no UDF, no second scan). Callers chain ``.filter("blocklist_keep")``
    into export plans next to the PII gate."""
    from .textstats import _tokens

    lowered = sorted({t.lower() for t in terms})
    toks = _tokens(F.col(text_col))
    # size(NULL) is -1: a NULL-text doc has zero hits (missing is not
    # anomalous — the mad_outliers NULL rule), not a blocklist hit
    n_hits = F.greatest(
        F.size(F.filter(toks, lambda t: t.isin(lowered))), F.lit(0)
    )
    return df.withColumn(
        "n_blocklist_hits", n_hits.cast("long")
    ).withColumn("blocklist_keep", n_hits == 0)
