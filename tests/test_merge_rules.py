"""Merge-rule semantics ported from the reference test suite
(tests/test_entity_deduplication.py:16-154)."""

from metal_history_knowledge_graph_spark.functions.merge_rules import (
    fold_entities,
    merge_entity_data,
)


def test_fill_missing_scalar():
    a = {"name": "Black Sabbath", "formed_year": None}
    merge_entity_data(a, {"name": "Black Sabbath", "formed_year": 1968})
    assert a["formed_year"] == 1968


def test_list_union_preserves_order():
    a = {"name": "X", "instruments": ["guitar"]}
    merge_entity_data(a, {"instruments": ["keyboards", "guitar"]})
    assert a["instruments"] == ["guitar", "keyboards"]


def test_description_concat():
    a = {"description": "Pioneers of heavy metal."}
    merge_entity_data(a, {"description": "Formed in Birmingham."})
    assert a["description"] == "Pioneers of heavy metal. Formed in Birmingham."


def test_description_substring_no_concat():
    a = {"description": "Pioneers of heavy metal from Birmingham."}
    merge_entity_data(a, {"description": "heavy metal"})
    assert a["description"] == "Pioneers of heavy metal from Birmingham."


def test_numeric_conflict_keeps_first_and_records():
    a = {"release_year": 1970}
    merge_entity_data(a, {"release_year": 1971})
    assert a["release_year"] == 1970
    assert a["_conflicts"]["release_year"] == [1970, 1971]


def test_string_alternate_values():
    a = {"origin_city": "Birmingham"}
    merge_entity_data(a, {"origin_city": "London"})
    assert a["origin_city"] == "Birmingham"
    assert a["_alternate_values"]["origin_city"] == ["London"]


def test_similar_string_no_alternate():
    a = {"origin_city": "Birmingham"}
    merge_entity_data(a, {"origin_city": "birmingham "})
    assert "_alternate_values" not in a


def test_fold_order_dependence():
    first = {"name": "A", "formed_year": 1968, "description": "one"}
    second = {"name": "A", "formed_year": 1969, "description": "two"}
    merged = fold_entities([first, second])
    assert merged["formed_year"] == 1968
    assert merged["_conflicts"]["formed_year"] == [1968, 1969]
    assert merged["description"] == "one two"
    # reversed order flips the kept value — order is semantics
    rev = fold_entities([second, first])
    assert rev["formed_year"] == 1969


def test_none_does_not_overwrite():
    a = {"formed_year": 1968}
    merge_entity_data(a, {"formed_year": None})
    assert a["formed_year"] == 1968
