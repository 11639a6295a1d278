"""String similarity — the canonicalization decision function.

Matches the reference's ``FuzzyMatcher``
(``src/pipeline/extraction_pipeline.py:46-74``): normalize =
``lower().strip()``, exact match short-circuits 1.0, else
``difflib.SequenceMatcher(None, a, b).ratio()``; merge threshold 0.85.

MinHash-LSH over char-3-grams is only a recall-oriented *prefilter* at
scale; this ratio is always the final verifier, so emitted groups match
the reference's semantics.
"""

from __future__ import annotations

from difflib import SequenceMatcher

MERGE_THRESHOLD = 0.85


def normalize_name(s: str) -> str:
    return s.lower().strip()


def name_similarity(s1: str, s2: str) -> float:
    s1, s2 = normalize_name(s1), normalize_name(s2)
    if s1 == s2:
        return 1.0
    return SequenceMatcher(None, s1, s2).ratio()


def are_similar(s1: str, s2: str, threshold: float = MERGE_THRESHOLD) -> bool:
    return name_similarity(s1, s2) >= threshold


def char_ngrams(s: str, n: int = 3) -> list[str]:
    """Char n-gram shingles of the normalized name (LSH feature space).
    Names shorter than n yield the whole name as a single shingle."""
    s = normalize_name(s)
    if len(s) <= n:
        return [s] if s else []
    return [s[i:i + n] for i in range(len(s) - n + 1)]
