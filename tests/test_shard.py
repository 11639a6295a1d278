"""Rendezvous (HRW) sharding (operators/shard.py): parity with a
pure-Python argmax over the same md5 scores, the minimal-movement
property on fleet grow/shrink, determinism across partitionings,
rough balance, and the weighted load report."""

import hashlib

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.shard import (
    hrw_assign,
    shard_load,
    shard_moves,
)

SHARDS4 = [f"crawler-{i}" for i in range(4)]
SHARDS5 = SHARDS4 + ["crawler-4"]


def py_score(key, shard):
    return int(
        hashlib.md5(f"hrw:{shard}|{key}".encode()).hexdigest()[:15], 16
    )


def py_assign(keys, shards):
    return {
        k: max(shards, key=lambda s: (py_score(k, s), s)) for k in keys
    }


def _keys(n):
    return [f"host{i:03d}.example.com" for i in range(n)]


def test_matches_python_argmax(spark):
    keys = _keys(60)
    df = spark.createDataFrame([(k,) for k in keys], "host string")
    got = {r.host: r.shard for r in hrw_assign(df, "host", SHARDS4).collect()}
    assert got == py_assign(keys, SHARDS4)


def test_distinct_and_null_keys(spark):
    df = spark.createDataFrame(
        [("a.com",), ("a.com",), (None,), ("b.com",)], "host string"
    )
    rows = hrw_assign(df, "host", SHARDS4).collect()
    assert sorted(r.host for r in rows) == ["a.com", "b.com"]


def test_partition_invariance(spark):
    keys = _keys(50)
    df = spark.createDataFrame([(k,) for k in keys], "host string")
    a = {(r.host, r.shard) for r in hrw_assign(df, "host", SHARDS4).collect()}
    b = {
        (r.host, r.shard)
        for r in hrw_assign(df.repartition(7), "host", SHARDS4).collect()
    }
    assert a == b


def test_minimal_movement_on_grow(spark):
    keys = _keys(200)
    df = spark.createDataFrame([(k,) for k in keys], "host string")
    moves = shard_moves(df, "host", SHARDS4, SHARDS5).collect()
    # every move lands on the new shard, nothing else is perturbed
    assert moves and all(m.new_shard == "crawler-4" for m in moves)
    # expected fraction 1/5 of keys; allow wide tolerance
    assert 0.05 < len(moves) / len(keys) < 0.4
    old = {r.host: r.shard for r in hrw_assign(df, "host", SHARDS4).collect()}
    new = {r.host: r.shard for r in hrw_assign(df, "host", SHARDS5).collect()}
    moved = {m.host for m in moves}
    for k in keys:
        if k not in moved:
            assert old[k] == new[k]


def test_minimal_movement_on_shrink(spark):
    keys = _keys(200)
    df = spark.createDataFrame([(k,) for k in keys], "host string")
    moves = shard_moves(df, "host", SHARDS5, SHARDS4).collect()
    assert moves and all(m.old_shard == "crawler-4" for m in moves)


def test_rough_balance(spark):
    keys = _keys(400)
    df = spark.createDataFrame([(k,) for k in keys], "host string")
    counts = [
        r.n
        for r in hrw_assign(df, "host", SHARDS4)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == 4 and min(counts) > 50  # 100 expected each


def test_shard_load_weighted(spark):
    rows = [("a.com", 10), ("a.com", 5), ("b.com", 7), (None, 99)]
    df = spark.createDataFrame(rows, "host string, pages int")
    got = {
        r.shard: (r.n_keys, r.load)
        for r in shard_load(df, "host", SHARDS4, "pages").collect()
    }
    assign = py_assign(["a.com", "b.com"], SHARDS4)
    want = {}
    for k, tot in (("a.com", 15), ("b.com", 7)):
        s = assign[k]
        n, l = want.get(s, (0, 0))
        want[s] = (n + 1, l + tot)
    assert got == want
