"""WARC source (sources/warc.py): build → parse round-trip identity,
Content-Length-delimited payloads (adversarial bytes: embedded
CRLFCRLF, embedded 'WARC/1.0', empty, unicode), malformed-record
recovery, and a narrow JVM/Arrow-only plan."""

from metal_history_knowledge_graph_spark.sources.warc import (
    build_warc,
    parse_warc,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_roundtrip_identity(spark):
    rows = [
        (0, "http://a.example/0", "plain text"),
        (1, "http://a.example/1", "embedded\r\n\r\nblank line"),
        (2, "http://a.example/2", "fake magic WARC/1.0\r\nWARC-Type: x"),
        (3, "http://a.example/3", ""),
        (4, "http://a.example/4", "unicode: Motörhead — naïve"),
        (205, "http://b.example/205", "second blob"),
    ]
    blobs = build_warc(_docs(spark, rows), records_per_blob=100)
    assert blobs.count() == 2  # ids 0-4 -> blob 0, 205 -> blob 2
    got = {
        r["target_uri"]: r
        for r in parse_warc(blobs).collect()
    }
    assert len(got) == 6
    for doc_id, url, text in rows:
        r = got[url]
        assert r["parse_error"] is None
        assert r["warc_type"] == "response"
        assert bytes(r["payload"]).decode("utf-8") == text
        assert r["content_length"] == len(text.encode("utf-8"))


def test_record_order_within_blob(spark):
    rows = [(i, f"http://x/{i}", f"doc {i}") for i in (7, 3, 5)]
    blobs = build_warc(_docs(spark, rows), records_per_blob=100)
    recs = sorted(
        parse_warc(blobs).collect(), key=lambda r: r["record_index"]
    )
    # concatenated in id order regardless of input order
    assert [r["target_uri"] for r in recs] == [
        "http://x/3", "http://x/5", "http://x/7"
    ]


def test_malformed_records_reported_not_fatal(spark):
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://ok/1\r\nWARC-Date: d\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    bad_magic = b"NOTWARC\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    missing_len = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad/2\r\n\r\n\r\n\r\n"
    )
    truncated = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad/3\r\nContent-Length: 100\r\n\r\nshort"
    )
    blobs = spark.createDataFrame(
        [
            (0, bad_magic + good),
            (1, missing_len + good),
            (2, good + truncated),
        ],
        "blob_id long, warc binary",
    )
    rows = parse_warc(blobs).collect()
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r["blob_id"], []).append(r)
    # blob 0: bad magic reported, recovery finds the good record
    errs0 = [r for r in by_blob[0] if r["parse_error"]]
    oks0 = [r for r in by_blob[0] if not r["parse_error"]]
    assert errs0 and "bad magic" in errs0[0]["parse_error"]
    assert [r["target_uri"] for r in oks0] == ["http://ok/1"]
    # blob 1: missing Content-Length reported, good record recovered
    errs1 = [r for r in by_blob[1] if r["parse_error"]]
    assert errs1 and "Content-Length" in errs1[0]["parse_error"]
    assert [r["target_uri"] for r in by_blob[1] if not r["parse_error"]] == [
        "http://ok/1"
    ]
    # blob 2: good first, then truncated payload reported
    assert [r["target_uri"] for r in by_blob[2] if not r["parse_error"]] == [
        "http://ok/1"
    ]
    errs2 = [r for r in by_blob[2] if r["parse_error"]]
    assert errs2 and "truncated payload" in errs2[0]["parse_error"]


def test_parse_plan_narrow(spark):
    rows = [(i, f"http://x/{i}", "t") for i in range(10)]
    blobs = build_warc(_docs(spark, rows))
    plan = (
        parse_warc(blobs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python


def test_null_blob_reported_not_fatal(spark):
    from pyspark.sql import functions as F

    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://ok/1\r\nWARC-Date: d\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    blobs = spark.createDataFrame(
        [(0, good), (1, None)], "blob_id long, warc binary"
    )
    rows = parse_warc(blobs).collect()
    errs = [r for r in rows if r["parse_error"]]
    oks = [r for r in rows if not r["parse_error"]]
    assert [r["target_uri"] for r in oks] == ["http://ok/1"]
    assert len(errs) == 1 and errs[0]["parse_error"] == "null blob"
    assert errs[0]["blob_id"] == 1
