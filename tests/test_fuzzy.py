"""Fuzzy-matching semantics ported from the reference
(tests/test_fuzzy_matching.py:10-110)."""

import pytest

from metal_history_knowledge_graph_spark.functions.similarity import (
    are_similar,
    char_ngrams,
    name_similarity,
)


def test_exact_and_case_whitespace():
    assert name_similarity("Black Sabbath", "Black Sabbath") == 1.0
    assert name_similarity("BLACK SABBATH", "black sabbath") == 1.0
    assert name_similarity("  Black Sabbath  ", "Black Sabbath") == 1.0


@pytest.mark.parametrize("a,b", [
    ("Black Sabbath", "Black Sabath"),
    ("Judas Priest", "Judas Preist"),
    ("Metallica", "Metalica"),
    ("Megadeth", "Megadeath"),
    ("Motörhead", "Motorhead"),
    ("Iron Maiden", "Iron Maidens"),
])
def test_typos_merge_at_085(a, b):
    assert are_similar(a, b, 0.85)


def test_threshold_sensitivity():
    # Dream Theater / Theatre ≈ 0.92: merges at 0.85, not at 0.95
    s = name_similarity("Dream Theater", "Dream Theatre")
    assert 0.85 <= s < 0.95
    assert are_similar("Dream Theater", "Dream Theatre", 0.70)
    assert not are_similar("Dream Theater", "Dream Theatre", 0.95)


def test_distinct_names_do_not_merge():
    assert not are_similar("Black Sabbath", "Iron Maiden", 0.85)
    assert not are_similar("Slayer", "Sabbath", 0.85)


def test_empty_strings():
    assert name_similarity("", "") == 1.0
    assert name_similarity("x", "") == 0.0


def test_char_ngrams():
    assert char_ngrams("abc") == ["abc"]
    assert char_ngrams("abcd") == ["abc", "bcd"]
    assert char_ngrams("AB") == ["ab"]
    assert char_ngrams("") == []
