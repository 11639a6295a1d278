"""Parallel-URL bitext mining (operators/bitext.py): slot detection,
pairing semantics (lang_a < lang_b, no same-lang pairs, no pair
without a slot), the max_group stop-key cap, and the language
matrix."""

from metal_history_knowledge_graph_spark.operators.bitext import (
    bitext_lang_matrix,
    parallel_url_pairs,
)


def _pairs(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        (r.lang_a, r.url_a, r.lang_b, r.url_b)
        for r in parallel_url_pairs(df, **kw).collect()
    }


def test_basic_pairing_and_ordering(spark):
    got = _pairs(
        spark,
        [
            "http://a.com/en/article/7",
            "http://a.com/de/article/7",
            "http://a.com/fr/article/7",
            "http://a.com/en/article/8",  # different template: no pair
            "http://b.com/en/article/7",  # different host: no pair
        ],
    )
    assert got == {
        ("de", "http://a.com/de/article/7", "en", "http://a.com/en/article/7"),
        ("de", "http://a.com/de/article/7", "fr", "http://a.com/fr/article/7"),
        ("en", "http://a.com/en/article/7", "fr", "http://a.com/fr/article/7"),
    }


def test_no_slot_no_pair_and_region_codes(spark):
    got = _pairs(
        spark,
        [
            "http://a.com/article/7",       # no lang segment
            "http://a.com/en-US/p/1",
            "http://a.com/pt-BR/p/1",
        ],
    )
    assert got == {
        (
            "en-US", "http://a.com/en-US/p/1",
            "pt-BR", "http://a.com/pt-BR/p/1",
        )
    }


def test_same_lang_duplicates_never_pair(spark):
    got = _pairs(
        spark,
        ["http://a.com/en/x", "http://a.com/en/x", "http://a.com/en/y"],
    )
    assert got == set()


def test_max_group_cap_drops_whole_group(spark):
    urls = [f"http://a.com/{l}/p" for l in ("aa", "bb", "cc", "dd")]
    assert len(_pairs(spark, urls, max_group=4)) == 6
    assert _pairs(spark, urls, max_group=3) == set()


def test_lang_matrix(spark):
    urls = [
        "http://a.com/en/1", "http://a.com/de/1",
        "http://a.com/en/2", "http://a.com/de/2", "http://a.com/fr/2",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r.lang_a, r.lang_b): r.n_pairs
        for r in bitext_lang_matrix(df).collect()
    }
    assert got == {("de", "en"): 2, ("de", "fr"): 1, ("en", "fr"): 1}
