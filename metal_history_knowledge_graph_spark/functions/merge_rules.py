"""Entity merge rules — the order-sensitive fold at the center of
canonicalization.

Reproduces the reference's ``EntityDeduplicator._merge_entity_data``
(``src/pipeline/extraction_pipeline.py:118-156``) exactly:

* new value fills only when existing is absent/None;
* list + list → concatenation deduped preserving first-seen order;
* ``description`` → ``"{old} {new}"`` concat when different and not a
  substring;
* numeric conflict → keep first, record ``_conflicts[key]=[old,new]``;
* string conflict with similarity < 0.9 → append to
  ``_alternate_values[key]``.

The reference applies this in chunk-iteration order; we apply it in
the pinned total order ``(url, chunk_index, mention_index)`` (SURVEY §4
pt.4), making the result deterministic and partition-invariant.
"""

from __future__ import annotations

from .similarity import name_similarity

_SKIP_KEYS = {"_metadata", "_conflicts", "_alternate_values"}


def merge_entity_data(existing: dict, new: dict) -> None:
    """Merge ``new`` into ``existing`` in place (reference semantics)."""
    for key, value in new.items():
        if value is None or key in _SKIP_KEYS:
            continue
        if key not in existing or existing[key] is None:
            existing[key] = value
        elif isinstance(value, list) and isinstance(existing[key], list):
            seen: set = set()
            unique = []
            for item in existing[key] + value:
                if item not in seen:
                    seen.add(item)
                    unique.append(item)
            existing[key] = unique
        elif key == "description":
            if value != existing[key] and value not in existing[key]:
                existing[key] = f"{existing[key]} {value}"
        elif isinstance(value, bool) or isinstance(existing[key], bool):
            # bools are ints in Python; keep first (no conflict record —
            # the reference has no bool attrs at this stage).
            continue
        elif isinstance(value, (int, float)):
            if existing[key] != value:
                existing.setdefault("_conflicts", {})[key] = [existing[key], value]
        elif isinstance(value, str):
            if name_similarity(existing[key], value) < 0.9:
                alts = existing.setdefault("_alternate_values", {}).setdefault(key, [])
                if value not in alts:
                    alts.append(value)


def fold_entities(dicts_in_order: list[dict]) -> dict:
    """Fold a first-seen-ordered list of entity dicts into one
    (the canonical representative is the first dict — reference
    ``extraction_pipeline.py:97-107``)."""
    if not dicts_in_order:
        return {}
    merged = dict(dicts_in_order[0])
    for nxt in dicts_in_order[1:]:
        merge_entity_data(merged, nxt)
    return merged
