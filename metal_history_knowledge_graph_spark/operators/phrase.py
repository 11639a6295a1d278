"""Exact phrase search over a positional inverted index — the
quoted-query operator next to BM25 bag-of-words ranking
(operators/bm25.py): find every document containing an exact token
sequence, with occurrence counts and first position.

Index shape (classic positional IR): ``positional_index`` emits
``(term, doc, pos)`` in one posexplode pass — persist it partitioned/
bucketed by ``term`` (io.TableStore) and a query-time term filter is
a partition prune, never a corpus scan. ``phrase_match`` intersects
the phrase's term postings by position arithmetic: start at the first
term's positions and, per subsequent term i, keep starts whose
``pos + i`` exists in that term's postings — n−1 equi-joins on
(doc, pos), each side already filtered to ONE term's postings
(vocabulary-frequency-sized, not corpus-sized). Repeated terms in the
phrase (\"batch batch\") are just two filters of the same postings —
the position arithmetic disambiguates.

Tokenization is the shared whitespace rule (textstats._tokens), the
same rule BM25/vocab/minhash use, so \"phrase found\" and \"term
ranked\" can never disagree about token boundaries.

Scale: every join is keyed (doc, pos) — co-partitioned after the
first shuffle; hot terms (stopwords) inflate one side of one join but
never a cross product (position equality is 1:1 per doc). A phrase
led by a stopword is the worst case — lead with the rarest term's
postings when the df table is available (left to the caller; the
semantics here stay order-of-phrase).

Oracle: q_phrase_match replays tokenization + the sliding window
directly in DuckDB (generate_series over token indices), so Spark's
join-based plan and the oracle's window scan must agree on every
(doc, count, first position).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens


def positional_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, id_col, pos): one row per token occurrence, pos 0-based.
    One narrow posexplode; no aggregation (tf/df roll up from this
    table when needed — bm25_index's postings are exactly
    ``groupBy(term, doc).count()`` of it)."""
    return df.select(
        F.col(id_col),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "term"),
    ).select("term", id_col, "pos")


def proximity_match(
    index: DataFrame,
    term_a: str,
    term_b: str,
    max_distance: int,
    id_col: str = "doc_id",
    ordered: bool = False,
) -> DataFrame:
    """NEAR/k over the positional index: documents where ``term_a``
    and ``term_b`` occur within ``max_distance`` tokens — the
    proximity operator between exact phrases (k = 1, order fixed) and
    BM25 bags (k = ∞): "entity NEAR/5 qualifier" is how KG curation
    queries express loose apposition without committing to a phrasing.

    Returns (id_col, n_pairs, min_distance): count of qualifying
    position pairs and the tightest one. ``ordered=True`` requires
    ``term_a`` before ``term_b`` (0 < pos_b − pos_a ≤ k); unordered
    uses |Δ| ≤ k, Δ ≠ 0 — and when both terms are the SAME word,
    unordered counts each unordered position pair once (the
    b-after-a direction), not twice.

    One (doc)-keyed equi-join of two single-term posting lists with a
    range predicate on positions — per-doc term frequencies bound the
    pair fanout; never a cross product across documents. The DuckDB
    oracle replays the token scan + pair window directly (q_near_match)."""
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")
    pa = index.filter(F.col("term") == term_a).select(
        F.col(id_col), F.col("pos").alias("pos_a")
    )
    pb = index.filter(F.col("term") == term_b).select(
        F.col(id_col), F.col("pos").alias("pos_b")
    )
    delta = F.col("pos_b") - F.col("pos_a")
    if ordered or term_a == term_b:
        cond = (delta > 0) & (delta <= max_distance)
        dist = delta
    else:
        cond = (delta != 0) & (F.abs(delta) <= max_distance)
        dist = F.abs(delta)
    return (
        pa.join(pb, id_col)
        .filter(cond)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min(dist).cast("long").alias("min_distance"),
        )
    )


def phrase_match(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_occurrences, first_pos): documents containing the
    exact token sequence ``phrase`` (tokenized by the shared rule),
    with overlapping occurrences counted (\"a a a\" contains \"a a\"
    twice). Empty phrases raise; no-match returns an empty frame with
    the full schema."""
    terms = [t for t in phrase.lower().strip().split() if t]
    if not terms:
        raise ValueError("phrase_match: empty phrase")
    idx = positional_index(df, text_col, id_col)
    starts = (
        idx.filter(F.col("term") == terms[0])
        .select(F.col(id_col), F.col("pos").alias("start"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = (
            idx.filter(F.col("term") == t)
            .select(F.col(id_col), (F.col("pos") - i).alias("start"))
        )
        starts = starts.join(nxt, [id_col, "start"])
    return (
        starts.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("start").cast("long").alias("first_pos"),
        )
    )
