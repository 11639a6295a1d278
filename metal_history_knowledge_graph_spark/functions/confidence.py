"""Confidence scoring for extracted mentions.

Re-implements the scoring semantics of the reference's
``src/extraction/confidence_scorer.py:141-279``: a blended score of
context-pattern strength (:173-200), entity completeness (:202-225) and
source-reliability markers (:227-243), followed by entity-specific
sanity adjustments (:245-279). Pure function over (entity dict, context
string) so it runs vectorized inside the extraction batch UDF.
"""

from __future__ import annotations

import re
from functools import lru_cache

_HIGH = [re.compile(p) for p in (
    r"formed in \d{4}", r"released in \d{4}", r"founded in \d{4}",
    r"born (?:on\s+)?(?:\w+\s+)?\d{1,2},?\s*\d{4}",
    r"died (?:on\s+)?(?:\w+\s+)?\d{1,2},?\s*\d{4}",
    r"pioneered", r"invented", r"created", r"established", r"founded",
    r"recorded at", r"produced by", r"member of",
    r"played (?:guitar|bass|drums|vocals) (?:for|in)",
    r"formed by", r"consists of",
    r"\d+(?:-string|string)", r"\d+(?:\.\d+)?[\"']\s*(?:gauge|scale)",
    r"\d+\s*(?:BPM|bpm)", r"\d+\s*(?:Hz|hz|kHz)",
)]
_MEDIUM = [re.compile(p) for p in (
    r"influenced by", r"similar to", r"emerged from", r"developed from",
    r"inspired by", r"associated with", r"known for", r"often",
    r"typically", r"generally",
    r"early \d{4}s", r"mid-?\d{4}s", r"late \d{4}s",
    r"around \d{4}", r"circa \d{4}",
)]
_LOW = [re.compile(p) for p in (
    r"possibly", r"might have", r"some say", r"allegedly", r"reportedly",
    r"believed to", r"thought to", r"may have", r"perhaps", r"unclear",
    r"disputed", r"controversial",
)]

_SOURCE_HIGH = ("according to", "documented in", "recorded in",
                "confirmed by", "verified", "official")
_SOURCE_MED = ("stated", "claimed", "described as", "noted")
_SOURCE_LOW = ("rumored", "gossip", "unconfirmed", "speculation")

#: per-type field weights (confidence_scorer.py:85-115); keys are our
#: plural entity_type names.
_COMPLETENESS: dict[str, dict[str, float]] = {
    "bands": {"formed_year": 0.15, "origin_city": 0.10,
              "origin_country": 0.10, "description": 0.05},
    "people": {"instruments": 0.15, "associated_bands": 0.15, "description": 0.05},
    "albums": {"artist": 0.10, "release_year": 0.15, "label": 0.05, "studio": 0.05},
    "movements": {"start_year": 0.15, "geographic_center": 0.10,
                  "key_bands": 0.15, "characteristics": 0.10},
    "equipment": {"type": 0.10, "manufacturer": 0.10,
                  "specifications": 0.15, "associated_bands": 0.10},
}

#: "now" pinned for determinism (reference uses datetime.now().year).
CURRENT_YEAR = 2026


@lru_cache(maxsize=65536)
def _pattern_score(context_lower: str) -> float:
    high = sum(1 for p in _HIGH if p.search(context_lower))
    med = sum(1 for p in _MEDIUM if p.search(context_lower))
    low = sum(1 for p in _LOW if p.search(context_lower))
    base = 0.8 if high else (0.5 if med else 0.3)
    if low:
        base *= 1 - 0.1 * min(low, 3)
    if high > 1:
        base = min(1.0, base + 0.1 * (high - 1))
    return base


def _completeness_score(entity: dict, entity_type: str) -> float:
    weights = _COMPLETENESS.get(entity_type)
    if weights is None:
        return 0.5
    achieved = 0.4  # having a name/title at all
    for field, w in weights.items():
        v = entity.get(field)
        if isinstance(v, list) and v:
            achieved += w
        elif isinstance(v, str) and v.strip():
            achieved += w
        elif isinstance(v, (int, float)):
            achieved += w
    return achieved / (sum(weights.values()) + 0.4)


@lru_cache(maxsize=65536)
def _source_score(context_lower: str) -> float:
    if any(m in context_lower for m in _SOURCE_HIGH):
        return 0.9
    if any(m in context_lower for m in _SOURCE_MED):
        return 0.6
    if any(m in context_lower for m in _SOURCE_LOW):
        return 0.3
    return 0.5


def score_mention(entity: dict, context: str, entity_type: str) -> float:
    """Blend formula of confidence_scorer.py:153-171 + :245-279."""
    ctx = context.lower()
    score = 0.5
    score = 0.3 * score + 0.3 * _pattern_score(ctx)
    score = 0.7 * score + 0.3 * _completeness_score(entity, entity_type)
    score = 0.8 * score + 0.2 * _source_score(ctx)

    if entity_type == "bands":
        year = entity.get("formed_year")
        if year:
            score += 0.05 if 1960 <= year <= CURRENT_YEAR else -0.1
    elif entity_type == "albums":
        if entity.get("artist") and entity.get("release_year"):
            score += 0.05
    elif entity_type == "movements":
        if len(entity.get("key_bands") or []) >= 3:
            score += 0.05
    return max(0.0, min(1.0, score))
