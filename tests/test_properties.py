"""Property-style invariants over generated inputs (SURVEY §5 test
plan item 2): each property is checked over hundreds of seeded-random
cases batched into ONE DataFrame pass (not one Spark job per example —
hypothesis's per-example model multiplies JVM round-trips by 100×; a
seeded generator with the same coverage keeps the suite fast)."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.packing import pack_sequences
from metal_history_knowledge_graph_spark.operators.urlnorm import canonicalize_urls


def _random_urls(n, seed):
    rng = random.Random(seed)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp", ""]
    hosts = ["Example.COM", "a.b.c.ORG", "x.io", "SITE7.net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/A/b/", "/x%20y", "//d/"]
    params = ["a=1", "B=2", "utm_source=x", "ref=9", "z", "", "gclid=1", "y=8"]
    frags = ["", "#f", "#a/b?c=1"]
    out = []
    for _ in range(n):
        scheme = rng.choice(schemes)
        if not scheme:
            out.append("".join(rng.choices(string.printable[:70], k=rng.randint(0, 30))))
            continue
        q = "&".join(rng.sample(params, rng.randint(0, 4)))
        out.append(
            scheme + "://" + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + (("?" + q) if q else "") + rng.choice(frags)
        )
    return out


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the canonical form is
    a fixed point, so re-canonicalizing an already-clean crawl log
    (the resume case) changes nothing."""
    urls = _random_urls(500, seed=11)
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    once = canonicalize_urls(df).select("i", F.col("canonical_url").alias("url"))
    twice = canonicalize_urls(once).select("i", "canonical_url")
    bad = (
        once.withColumnRenamed("url", "first")
        .join(twice, "i")
        .filter(F.col("first") != F.col("canonical_url"))
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_pack_sequences_stream_invariants(spark):
    """Within every shard (ordered by key): starts are the running sum
    of token counts (no gaps, no overlap), offsets stay < capacity,
    and spans are exactly ceil-length in sequences."""
    rng = random.Random(7)
    cap = 128
    rows = [(i, rng.randint(1, 300)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, "doc_id", "n_tokens", capacity=cap, n_shards=16)
    got = packed.orderBy("shard", "doc_id").collect()
    running: dict[int, int] = {}
    for r in got:
        start = r["seq_first"] * cap + r["offset_in_seq"]
        assert start == running.get(r["shard"], 0), r
        assert 0 <= r["offset_in_seq"] < cap
        end_excl = start + r["n_tokens"]
        assert r["n_seqs"] == (end_excl - 1) // cap - start // cap + 1
        running[r["shard"]] = end_excl
    # conservation: every token accounted for exactly once
    assert sum(running.values()) == sum(t for _, t in rows)


def _random_corpus(n_docs, seed, vocab=12, max_len=40):
    """Word-salad corpus over a tiny vocabulary — guarantees plenty of
    genuine cross-document span collisions."""
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    return [
        (i, " ".join(rng.choices(words, k=rng.randint(0, max_len))))
        for i in range(n_docs)
    ]


def test_span_scrub_subsequence_and_conservation(spark):
    """remove_duplicate_spans: the scrubbed tokens are an order-
    preserving subsequence of the normalized originals, and
    kept + removed == n_tokens — over 200 random docs in one pass."""
    from metal_history_knowledge_graph_spark.operators.spans import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        _random_corpus(200, seed=23), "doc_id int, text string"
    )
    out = remove_duplicate_spans(df, n=3, min_docs=2).collect()
    assert len(out) == 200
    for r in out:
        orig = r.text.lower().split()
        kept = r.clean_text.split() if r.clean_text else []
        assert r.n_tokens == len(orig)
        assert r.removed_tokens == len(orig) - len(kept)
        it = iter(orig)
        assert all(w in it for w in kept), f"doc {r.doc_id} not a subsequence"


def test_boilerplate_removal_subsequence_and_bounds(spark):
    """remove_boilerplate_segments: cleaned tokens are an order-
    preserving subsequence; removed_segments ∈ [0, n_segments]; and
    raising min_docs can only DECREASE the removed count."""
    from metal_history_knowledge_graph_spark.operators.spans import (
        remove_boilerplate_segments,
    )

    df = spark.createDataFrame(
        _random_corpus(200, seed=31), "doc_id int, text string"
    )
    low = {
        r.doc_id: r
        for r in remove_boilerplate_segments(df, n=3, min_docs=2).collect()
    }
    high = {
        r.doc_id: r
        for r in remove_boilerplate_segments(df, n=3, min_docs=5).collect()
    }
    for d, r in low.items():
        orig = r.text.lower().split()
        kept = r.clean_text.split() if r.clean_text else []
        assert 0 <= r.removed_segments <= r.n_segments
        it = iter(orig)
        assert all(w in it for w in kept)
        assert high[d].removed_segments <= r.removed_segments
