"""SURT keys / CDX index: spec-pinned key shapes, parquet-layout
pruning for prefix lookups, and the NULL lane for non-URLs."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from metal_history_knowledge_graph_spark.operators.cdx import (
    cdx_index,
    cdx_prefix_lookup,
    surt_key,
)

CASES = [
    # canonicalization feeds in: default port + tracking + fragment
    ("HTTP://WWW.Example.COM:80/Blog/Post?b=2&utm_source=x&a=1#f",
     "com,example)/blog/post?a=1&b=2"),
    # explicit non-default port survives, after the reversed host
    ("https://Sub.Shop.Example.CO.uk:8443/Deals",
     "uk,co,example,shop,sub:8443)/deals"),
    # wwwN label stripped; trailing slash trimmed
    ("https://www2.example.com/Shared/Page/",
     "com,example)/shared/page"),
    # empty path -> "/"
    ("https://example.com#top", "com,example)/"),
    # userinfo dropped
    ("http://User:Pw@example.com/x", "com,example)/x"),
    # params sorted bytewise BEFORE the lowercase ('Z' < 'y')
    ("http://example.com/p?y=8&Z=9", "com,example)/p?z=9&y=8"),
    # no scheme -> NULL key
    ("not a url", None),
]


def test_surt_spec(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["s"]
        for r in df.select("i", surt_key(F.col("url")).alias("s")).collect()
    }
    assert got == {i: want for i, (_, want) in enumerate(CASES)}


def test_cdx_index_prunes_prefix_lookup(spark, tmp_path):
    rows = [
        (f"http://host{h}.com/p{i}", 100 * h + i)
        for h in range(8)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long")
    out = str(tmp_path / "cdx")
    cdx_index(df, n_partitions=8).write.parquet(out)
    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 4
    # sorted layout: each file's (min, max) surt range is tight enough
    # that at most ~2 files can contain one host's prefix
    covering = 0
    prefix = "com,host3)"
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = md.row_group(0).column(0)
        lo, hi = col.statistics.min, col.statistics.max
        if not (hi < prefix or lo > prefix + "￿"):
            covering += 1
    assert covering <= 2
    idx = spark.read.parquet(out)
    got = cdx_prefix_lookup(idx, prefix).collect()
    assert len(got) == 50
    assert {r["ts"] for r in got} == {300 + i for i in range(50)}
    keys = [(r["surt"], r["ts"]) for r in got]
    assert keys == sorted(keys)
    plan = cdx_prefix_lookup(idx, prefix)._jdf.queryExecution().toString()
    assert "StartsWith" in plan


def test_null_urls_dropped_from_index(spark):
    df = spark.createDataFrame(
        [("garbage", 1), ("http://a.com/x", 2)], "url string, warc_ts long"
    )
    got = cdx_index(df).collect()
    assert [(r["surt"], r["ts"]) for r in got] == [("com,a)/x", 2)]


def test_cdx_merge_incremental(spark, store):
    import os

    from metal_history_knowledge_graph_spark.operators.cdx import (
        cdx_merge,
        cdx_rows,
    )

    b1 = spark.createDataFrame(
        [(f"http://alpha{i}.com/p{i}", i) for i in range(6)]
        + [(f"http://beta{i}.org/q{i}", 100 + i) for i in range(6)],
        "url string, warc_ts long",
    )
    cdx_merge(store, b1)
    root = store._path("cdx")
    org_dir = [d for d in os.listdir(root) if d.startswith("bucket=org")][0]
    odir = os.path.join(root, org_dir)
    before = {
        f: os.stat(os.path.join(odir, f)).st_ino
        for f in os.listdir(odir) if f.endswith(".parquet")
    }

    # batch 2: only com-bucket hosts + one exact duplicate capture
    b2 = spark.createDataFrame(
        [(f"http://gamma{i}.com/r{i}", 200 + i) for i in range(4)]
        + [("http://alpha0.com/p0", 0)],
        "url string, warc_ts long",
    )
    cdx_merge(store, b2)
    after = {
        f: os.stat(os.path.join(odir, f)).st_ino
        for f in os.listdir(odir) if f.endswith(".parquet")
    }
    assert after == before, "untouched org bucket was rewritten"

    got = {
        (r["bucket"], r["surt"], r["ts"], r["url"])
        for r in store.read("cdx").collect()
    }
    want = {
        (r["bucket"], r["surt"], r["ts"], r["url"])
        for r in cdx_rows(b1.unionByName(b2)).distinct().collect()
    }
    assert got == want  # merge == from-scratch build on the union
    # duplicate capture collapsed, not duplicated
    assert len([1 for _, s, _, _ in got if "alpha0" in s]) == 1
