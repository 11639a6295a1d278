"""Deterministic sampling / dataset-mixing operators
(operators/sampling.py): partition-independence, rate accuracy,
mixing math, split disjointness, and the no-shuffle plan property."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    hash_sample,
    mix_sources,
    mixing_rates,
    stratified_sample,
    train_test_split,
)


@pytest.fixture(scope="module")
def docs(spark):
    # 6000 synthetic docs across 3 sources / 4 langs, deterministic.
    return (
        spark.range(6000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("zh")),
                ((F.col("id") % 4) + 1).cast("int"),
            ).alias("lang"),
        )
        .cache()
    )


def test_hash_sample_deterministic_and_partition_independent(docs):
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, seed=7).collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(17), "doc_id", 0.3, seed=7).collect()
    }
    assert a == b and len(a) > 0
    # different seed -> different set (overwhelmingly)
    c = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, seed=8).collect()}
    assert a != c


def test_hash_sample_rate_accuracy(docs):
    n = hash_sample(docs, "doc_id", 0.25, seed=1).count()
    assert abs(n / 6000 - 0.25) < 0.03


def test_hash_bucket_range(docs):
    row = docs.select(
        F.min(hash_bucket(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket(F.col("doc_id"))).alias("hi"),
    ).first()
    assert 0 <= row.lo and row.hi < BUCKETS


def test_stratified_rates(docs):
    out = stratified_sample(
        docs, "lang", {"en": 0.8, "de": 0.2}, key_col="doc_id", seed=3
    )
    got = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert set(got) == {"en", "de"}  # default_rate=0 drops fr/zh
    assert abs(got["en"] / 1500 - 0.8) < 0.05
    assert abs(got["de"] / 1500 - 0.2) < 0.05


def test_mixing_rates_math():
    rates = mixing_rates({"a": 1000, "b": 1000}, {"a": 3, "b": 1})
    # b is not binding: a needs 3x b's share but only has 1000 -> a keeps 1.0,
    # feasible total = 1000/0.75 = 1333.3 -> b keeps 333.3/1000
    assert rates["a"] == 1.0
    assert abs(rates["b"] - 1 / 3) < 1e-9
    # absent source makes the mixture infeasible: every other rate
    # would silently drop to 0.0 — the contract is an explicit error
    import pytest
    with pytest.raises(ValueError, match="missing"):
        mixing_rates({"a": 10}, {"a": 1, "missing": 1})
    with pytest.raises(ValueError):
        mixing_rates({"a": 10}, {})


def test_mix_sources_proportions(docs):
    out = mix_sources(docs, "source", {"src0": 2, "src1": 1}, key_col="doc_id", seed=5)
    got = {r.source: r.cnt for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert set(got) == {"src0", "src1"}  # src2 dropped
    ratio = got["src0"] / got["src1"]
    assert abs(ratio - 2.0) < 0.25
    # binding source (src0, demand 2x supply-equal src1) keeps everything
    assert got["src0"] == 2000


def test_train_test_split_disjoint_exhaustive(docs):
    train, test = train_test_split(docs, "doc_id", 0.2, seed=9)
    nt, ns = train.count(), test.count()
    assert nt + ns == 6000
    assert train.join(test, "doc_id", "inner").count() == 0
    assert abs(ns / 6000 - 0.2) < 0.03


def test_hash_sample_plan_is_narrow(docs):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hash_sample(docs, "doc_id", 0.5).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan


def test_assign_shards(docs):
    from metal_history_knowledge_graph_spark.operators.sampling import assign_shards

    out = assign_shards(docs, "doc_id", n_shards=8, seed=2)
    stats = {r.shard: r.cnt for r in out.groupBy("shard").agg(F.count("*").alias("cnt")).collect()}
    assert set(stats) == set(range(8))
    assert sum(stats.values()) == 6000
    # balanced by LLN: each shard within 20% of the mean at n=6000
    assert all(abs(c - 750) < 150 for c in stats.values())
    # deterministic under repartition
    a = {(r.doc_id, r.shard) for r in out.collect()}
    b = {(r.doc_id, r.shard)
         for r in assign_shards(docs.repartition(13), "doc_id", 8, seed=2).collect()}
    assert a == b


def test_composed_operators_are_independent(docs):
    """Domain-separated hashes: sampling the output of a split (same
    seed) must behave like an independent draw, never a correlated
    all-or-nothing; shard assignment over a thin sample must still
    touch most shards."""
    from metal_history_knowledge_graph_spark.operators.sampling import assign_shards

    train, test = train_test_split(docs, "doc_id", 0.5, seed=0)
    kept = hash_sample(train, "doc_id", 0.3, seed=0).count()
    n_train = train.count()
    assert 0.15 * n_train < kept < 0.45 * n_train  # not 0, not all

    thin = hash_sample(docs, "doc_id", 0.2, seed=0)
    shards = {r.shard for r in assign_shards(thin, "doc_id", 16, seed=0)
              .select("shard").distinct().collect()}
    assert len(shards) >= 12  # spread across shards, not the low few


def test_cap_per_group_bounds_and_determinism(spark):
    from metal_history_knowledge_graph_spark.operators.sampling import (
        cap_per_group,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
    )
    kept = cap_per_group(df, "src", 100, "doc_id")
    sizes = {r.src: r.n for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert all(n == 100 for n in sizes.values())
    # deterministic under repartition (hash order, not scan order)
    again = cap_per_group(df.repartition(17), "src", 100, "doc_id")
    assert {r.doc_id for r in kept.collect()} == {r.doc_id for r in again.collect()}
    # cap above group size keeps everything
    assert cap_per_group(df, "src", 10_000, "doc_id").count() == 1000


# --- PPS systematic sampling ----------------------------------------------------

def _pps_reference(items, n_target, seed):
    """Brute-force replay of the documented selection rule."""
    import hashlib

    def ordh(k):
        return int(hashlib.md5(f"ppsord:{seed}|{k}".encode()).hexdigest()[:15],
                   16) % BUCKETS

    rows = sorted(((ordh(k), k, w) for k, w in items if w > 0))
    total = sum(w for _, _, w in rows)
    step = max(total // n_target, 1)
    off = int(hashlib.md5(f"pps:{seed}".encode()).hexdigest()[:15], 16) % step
    picks = {}
    cum = 0
    points = [off + j * step for j in range(n_target)]
    for _, k, w in rows:
        c = sum(1 for p in points if cum <= p < cum + w)
        if c:
            picks[k] = c
        cum += w
    return picks


def test_pps_matches_bruteforce_and_totals(spark):
    from metal_history_knowledge_graph_spark.operators.sampling import (
        pps_systematic_sample,
    )

    items = [(i, (i * 37) % 900 + (10_000 if i % 50 == 0 else 0))
             for i in range(300)] + [(300, 0)]
    df = spark.createDataFrame(items, "doc_id long, weight long")
    out = {
        r.doc_id: r.n_copies
        for r in pps_systematic_sample(
            df, "weight", n_target=40, key_col="doc_id", seed=7
        ).collect()
    }
    assert out == _pps_reference(items, 40, 7)
    # exactly n_target selections in total; heavy rows picked >1
    assert sum(out.values()) == 40
    assert max(out.values()) > 1  # the 10k-weight rows exceed step
    assert 300 not in out  # zero weight never picked


def test_pps_partition_and_bucket_invariance(spark):
    from metal_history_knowledge_graph_spark.operators.sampling import (
        pps_systematic_sample,
    )

    items = [(i, i % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(items, "doc_id long, weight long")
    a = sorted(
        (r.doc_id, r.n_copies)
        for r in pps_systematic_sample(
            df.repartition(1), "weight", 25, "doc_id", seed=1
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.n_copies)
        for r in pps_systematic_sample(
            df.repartition(17), "weight", 25, "doc_id", seed=1, n_buckets=3
        ).collect()
    )
    assert a == b


def test_pps_rejects_negative_weights_and_small_totals(spark):
    from metal_history_knowledge_graph_spark.operators.sampling import (
        pps_systematic_sample,
    )

    bad = spark.createDataFrame([(1, 5), (2, -3)], "doc_id long, weight long")
    with pytest.raises(ValueError, match="negative"):
        pps_systematic_sample(bad, "weight", 10, "doc_id")
    # NULL weights hit the same guard (NULL < 0 is NULL, so without an
    # explicit isNull() check they'd slip past and be silently dropped)
    bad_null = spark.createDataFrame([(1, 5), (2, None)], "doc_id long, weight long")
    with pytest.raises(ValueError, match="null/negative"):
        pps_systematic_sample(bad_null, "weight", 10, "doc_id")
    # n_target > total weight: step clamps to 1, every weight unit is a
    # selection point, so exactly `total` (< n_target) picks exist —
    # n_copies = w per row (the documented small-total semantics)
    tiny = spark.createDataFrame([(1, 2), (2, 3)], "doc_id long, weight long")
    out = {
        r.doc_id: r.n_copies
        for r in pps_systematic_sample(tiny, "weight", 10, "doc_id").collect()
    }
    assert out == {1: 2, 2: 3}


def test_pps_plan_has_no_global_window(spark):
    from metal_history_knowledge_graph_spark.operators.sampling import (
        pps_systematic_sample,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("weight")
    )
    plan = pps_systematic_sample(df, "weight", 20, "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    # the data-sized window partitions by _b; the only SinglePartition
    # window allowed is over the bucket-total table (vocabulary-sized)
    import re
    data_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "_boff" not in ln and "windowspecdefinition" in ln
    ]
    assert all("_b" in ln for ln in data_windows), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- budget-capped selection -----------------------------------------------------

def test_select_to_token_budget_exact_rule(spark):
    from metal_history_knowledge_graph_spark.operators.sampling import (
        select_to_token_budget,
    )

    docs = spark.createDataFrame(
        [
            (1, 90, 40), (2, 80, 40), (3, 80, 15), (4, 70, 40), (5, 60, 5),
        ],
        "doc_id long, score long, tokens long",
    )
    out = {
        r.doc_id: r.cum_tokens
        for r in select_to_token_budget(
            docs, "score", "tokens", budget=100, key_col="doc_id"
        ).collect()
    }
    # order: 1(40) 2(40) 3(15) 4(40) 5(5); exclusive prefixes
    # 0/40/80/95/135 — doc 4 straddles and is dropped (never
    # truncated), and doc 5's prefix still counts the better doc 4
    # (the documented all-strictly-better-plus-self rule), so it
    # drops too: no later small doc can jump a dropped straddler
    assert out == {1: 40, 2: 80, 3: 95}


def test_select_to_token_budget_invariance_and_guards(spark):
    import pytest as _pytest

    from metal_history_knowledge_graph_spark.operators.sampling import (
        select_to_token_budget,
    )

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 37 % 211).cast("long").alias("score"),
        (F.col("id") % 29 + 1).cast("long").alias("tokens"),
    )
    a = sorted(
        (r.doc_id, r.cum_tokens)
        for r in select_to_token_budget(
            docs.repartition(1), "score", "tokens", 2_000, "doc_id"
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.cum_tokens)
        for r in select_to_token_budget(
            docs.repartition(13), "score", "tokens", 2_000, "doc_id",
            n_buckets=7,
        ).collect()
    )
    assert a == b and len(a) > 0
    assert max(c for _, c in a) <= 2_000
    bad = spark.createDataFrame([(1, 5, -2)], "doc_id long, score long, tokens long")
    with _pytest.raises(ValueError, match="negative"):
        select_to_token_budget(bad, "score", "tokens", 10, "doc_id")


# ---- temperature mixing (sampling.temperature_rates_ppm / temperature_mix)


def test_temperature_rates_hand_computed():
    from metal_history_knowledge_graph_spark.operators.sampling import (
        temperature_rates_ppm,
    )

    # c = [300,125,50,25] → w = isqrt = [17,11,7,5]; binding domain is
    # d3 (q = 5_000_000); rates = min(1e6, 5e6·w//c)
    rates = temperature_rates_ppm({"d0": 300, "d1": 125, "d2": 50, "d3": 25})
    assert rates == {
        "d0": 283333, "d1": 440000, "d2": 700000, "d3": 1000000,
    }


def test_temperature_rates_properties():
    from metal_history_knowledge_graph_spark.operators.sampling import (
        temperature_rates_ppm,
    )

    counts = {f"s{i}": (i + 1) ** 3 * 7 for i in range(12)}
    rates = temperature_rates_ppm(counts)
    # downsample-only, and the binding (smallest-demand) domain ~full
    assert all(0 < r <= 1_000_000 for r in rates.values())
    assert max(rates.values()) >= 999_999
    # α = 0.5 flattens: expected share of the smallest domain grows
    kept = {d: counts[d] * rates[d] / 1e6 for d in counts}
    tot_in, tot_out = sum(counts.values()), sum(kept.values())
    assert kept["s0"] / tot_out > counts["s0"] / tot_in
    # α = 1 preserves natural proportions exactly (rate 1 everywhere)
    assert set(temperature_rates_ppm(counts, alpha=1.0).values()) == {1_000_000}


def test_temperature_rates_guards():
    import pytest as _pytest

    from metal_history_knowledge_graph_spark.operators.sampling import (
        temperature_rates_ppm,
    )

    with _pytest.raises(ValueError):
        temperature_rates_ppm({"a": 10}, alpha=0.0)
    with _pytest.raises(ValueError):
        temperature_rates_ppm({"a": -1})
    # zero-count domains get rate 0, never divide-by-zero
    assert temperature_rates_ppm({"a": 0, "b": 100}) == {"a": 0, "b": 1_000_000}
    assert temperature_rates_ppm({"a": 0}) == {"a": 0}


def test_temperature_mix_partition_invariant_and_flattens(spark):
    from metal_history_knowledge_graph_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "head" if i % 10 < 8 else "tail") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, dom string")
    a = sorted(
        r.id for r in temperature_mix(
            df.repartition(1), "dom", "id", seed=3).collect()
    )
    b = sorted(
        r.id for r in temperature_mix(
            df.repartition(17), "dom", "id", seed=3).collect()
    )
    assert a == b and a
    out = temperature_mix(df, "dom", "id", seed=3)
    shares = {
        r.dom: r.c
        for r in out.groupBy("dom").agg(F.count("*").alias("c")).collect()
    }
    # tail share rises from 20% toward the sqrt-flattened ~33%
    tail_share = shares["tail"] / (shares["head"] + shares["tail"])
    assert 0.25 < tail_share < 0.45
