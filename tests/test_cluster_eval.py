"""Clustering evaluation (operators/cluster_eval.py): exact parity
with a pure-Python pair-counting + B-cubed reference on hand and
random labelings, perfect/degenerate cases, duplicate-id and NULL
handling."""

import random
from itertools import combinations

from metal_history_knowledge_graph_spark.operators.cluster_eval import (
    PPM,
    bcubed,
    cluster_eval,
    pair_confusion,
)


def ref_metrics(items):
    """items: dict id -> (pred, gold)."""
    ids = sorted(items)
    tp = fp = fn = tn = 0
    for a, b in combinations(ids, 2):
        sp = items[a][0] == items[b][0]
        sg = items[a][1] == items[b][1]
        tp += sp and sg
        fp += sp and not sg
        fn += sg and not sp
        tn += not sp and not sg
    from collections import Counter

    np = Counter(p for p, _ in items.values())
    ng = Counter(g for _, g in items.values())
    cell = Counter(items.values())
    prec_sum = rec_sum = 0
    for (p, g), n in cell.items():
        prec_sum += n * (n * PPM // np[p])
        rec_sum += n * (n * PPM // ng[g])
    n_items = len(ids)
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "b3p": prec_sum // n_items,
        "b3r": rec_sum // n_items,
    }


def _df(spark, items):
    rows = [(i, p, g) for i, (p, g) in items.items()]
    return spark.createDataFrame(
        rows, "doc_id long, pred_cluster string, gold_cluster string"
    )


def test_hand_example(spark):
    items = {
        1: ("a", "x"),
        2: ("a", "x"),
        3: ("a", "y"),
        4: ("b", "y"),
        5: ("b", "y"),
        6: ("c", "z"),
    }
    want = ref_metrics(items)
    got = pair_confusion(_df(spark, items)).collect()[0]
    assert (got.tp, got.fp, got.fn, got.tn) == (
        want["tp"],
        want["fp"],
        want["fn"],
        want["tn"],
    )
    b3 = bcubed(_df(spark, items)).collect()[0]
    assert b3.n_items == 6
    assert b3.bcubed_precision_ppm == want["b3p"]
    assert b3.bcubed_recall_ppm == want["b3r"]


def test_random_labelings_match_reference(spark):
    rng = random.Random(7)
    items = {
        i: (f"p{rng.randint(0, 5)}", f"g{rng.randint(0, 4)}")
        for i in range(120)
    }
    want = ref_metrics(items)
    got = cluster_eval(_df(spark, items)).collect()[0]
    assert (got.tp, got.fp, got.fn, got.tn) == (
        want["tp"],
        want["fp"],
        want["fn"],
        want["tn"],
    )
    assert got.bcubed_precision_ppm == want["b3p"]
    assert got.bcubed_recall_ppm == want["b3r"]
    assert got.pair_precision_ppm == want["tp"] * PPM // (
        want["tp"] + want["fp"]
    )
    assert got.pair_recall_ppm == want["tp"] * PPM // (
        want["tp"] + want["fn"]
    )


def test_perfect_clustering(spark):
    items = {i: (f"c{i % 3}", f"c{i % 3}") for i in range(30)}
    got = cluster_eval(_df(spark, items)).collect()[0]
    assert got.fp == got.fn == 0
    assert got.pair_precision_ppm == got.pair_recall_ppm == PPM
    assert got.bcubed_precision_ppm == got.bcubed_recall_ppm == PPM


def test_singletons_vs_one_cluster(spark):
    # pred: everything separate -> no predicted pairs, recall 0
    items = {i: (f"s{i}", "g") for i in range(10)}
    got = cluster_eval(_df(spark, items)).collect()[0]
    assert got.tp == 0 and got.fp == 0
    assert got.pair_precision_ppm == 0  # 0/0 convention
    assert got.pair_recall_ppm == 0
    assert got.bcubed_precision_ppm == PPM  # each own cluster: P=1
    assert got.bcubed_recall_ppm == PPM // 10


def test_duplicate_ids_and_nulls(spark):
    rows = [
        (1, "a", "x"),
        (1, "b", "x"),  # dup id -> min labels ("a", "x")
        (2, None, "x"),
        (3, "a", None),
        (4, "a", "x"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, pred_cluster string, gold_cluster string"
    )
    got = pair_confusion(df).collect()[0]
    # effective items: {1: (a,x), 4: (a,x)} -> one TP pair
    assert (got.tp, got.fp, got.fn, got.tn) == (1, 0, 0, 0)
