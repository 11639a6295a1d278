"""Canonicalizer internals: LSH recall vs the exact-pair oracle over
the full gazetteer vocabulary (every misspelling must be recoverable),
and merge-provenance bookkeeping."""

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.functions.gazetteer import BANDS, PEOPLE
from metal_history_knowledge_graph_spark.operators.canonicalize import (
    candidate_pairs_exact,
    candidate_pairs_lsh,
    verify_pairs,
)


@pytest.fixture(scope="module")
def vocab_forms(spark):
    """Forms table = every gazetteer name + alias + misspelling."""
    rows = []
    for name, b in BANDS.items():
        for v in [name, *b["aliases"], *b["misspellings"]]:
            rows.append(("bands", v.lower().strip()))
    for name, p in PEOPLE.items():
        for v in [name, *p["misspellings"]]:
            rows.append(("people", v.lower().strip()))
    return spark.createDataFrame(
        sorted(set(rows)), "entity_type string, form_norm string"
    ).cache()


def _verified(pairs):
    return {
        (r.entity_type, r.left, r.right)
        for r in verify_pairs(pairs).collect()
    }


def test_lsh_recall_equals_exact_on_vocabulary(vocab_forms):
    """Every ratio≥0.85 pair in the vocabulary must survive the LSH
    prefilter — LSH may only add candidates, never lose a true pair."""
    exact = _verified(candidate_pairs_exact(vocab_forms))
    lsh = _verified(candidate_pairs_lsh(vocab_forms))
    assert exact, "oracle must be non-trivial"
    missing = exact - lsh
    assert not missing, f"LSH lost true pairs: {sorted(missing)[:5]}"
    assert lsh == exact  # verification makes the outputs identical


def test_every_misspelling_pairs_with_canonical(vocab_forms):
    verified = _verified(candidate_pairs_lsh(vocab_forms))
    joined = {frozenset((a, b)) for _, a, b in verified}
    for name, b in BANDS.items():
        for miss in b["misspellings"]:
            key = frozenset((name.lower(), miss.lower()))
            assert key in joined, f"{miss} !~ {name}"


def test_cross_type_never_pairs(vocab_forms):
    pairs = candidate_pairs_lsh(vocab_forms)
    # pair generation is within-type by construction
    assert pairs.filter(F.col("left") == F.col("right")).count() == 0
    verified = _verified(pairs)
    for etype, left, right in verified:
        assert etype in ("bands", "people")
