"""Unicode normalization — the first pass over crawled text, where the
same visible string arrives in composed and decomposed byte forms
(NFC/NFD), breaking every byte-keyed operator downstream (exact dedup
fingerprints, span hashes, gazetteer lookups).

Spark SQL exposes no Unicode normalizer, so this is one of the few
legitimately Python operators in the repo — an Arrow-batched pandas
UDF (never row-at-a-time) applying ``unicodedata.normalize``. The
DuckDB oracle (q_nfc_normalize) replays NFC via ``nfc_normalize``
(utf8proc) — both implement the Unicode standard and agree byte-for-
byte (pinned on composed/decomposed/ligature/Hangul fixtures in
test_spans).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def normalize_unicode(
    df: DataFrame, text_col: str = "text", form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` (default: replace ``text_col``) with the
    ``form``-normalized text (NFC/NFKC/NFD/NFKD); NULL stays NULL.
    Narrow Arrow-batched map — no shuffle, vectorized transfer."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return df.withColumn(out_col or text_col, _norm(F.col(text_col)))
