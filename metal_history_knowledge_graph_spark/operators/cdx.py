"""SURT keys and a CDX-style capture index — the Common-Crawl /
web-archive URL index primitive (CDXJ: one row per capture, keyed by
the Sort-friendly URI Reordering Transform so that all captures of a
host, domain, or path subtree are CONTIGUOUS in sort order and a
prefix scan answers "everything under example.com/blog/").

SURT here (documented spec, shared verbatim with the DuckDB oracle):
build on :func:`urlnorm.canonical_url` (lowercased scheme/host,
default ports stripped, fragment dropped, tracking params dropped,
remaining params bytewise-sorted, trailing slash trimmed), then
  1. drop userinfo;
  2. split an explicit non-default port off the host;
  3. strip one leading ``www`` / ``www2``-style label;
  4. reverse the remaining host labels, join with commas;
  5. append ``:port`` when present, then ``)``, then the
     LOWERCASED path+query.
``http://WWW.Example.COM:80/Blog/Post?b=2&a=1`` →
``com,example)/blog/post?a=1&b=2``. Non-URL strings (no scheme) get a
NULL key — the caller's garbage lane, not a sortable value.

Scale shape: ``surt_key`` is one native expression tree in whole-stage
codegen (no UDF, no shuffle — it fuses into the scan). ``cdx_index``
range-partitions by the key and sorts within partitions, so the
parquet footers carry tight (surt_min, surt_max) ranges and a
``cdx_prefix_lookup`` prunes to the few files whose range intersects
the prefix — the distributed analogue of the binary-searched .cdx
file, same layout trick as operators/zorder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urlnorm import (
    _AUTHORITY_RE,
    _HOSTPORT_RE,
    _SCHEME_RE,
    canonical_url,
)

_PORT_RE = r":(\d+)$"
_WWW_RE = r"^www\d*\."
_PATHQ_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"


def surt_key(url: Column) -> Column:
    """SURT sort key of ``url`` per the module spec; NULL for strings
    without a scheme."""
    cu = canonical_url(url)
    hostport = F.regexp_extract(
        F.regexp_extract(cu, _AUTHORITY_RE, 1), _HOSTPORT_RE, 1
    )
    port = F.regexp_extract(hostport, _PORT_RE, 1)
    bare = F.regexp_replace(
        F.regexp_replace(hostport, _PORT_RE, ""), _WWW_RE, ""
    )
    rev = F.array_join(F.reverse(F.split(bare, r"\.")), ",")
    pathq = F.lower(F.regexp_extract(cu, _PATHQ_RE, 1))
    return F.when(
        F.regexp_extract(url, _SCHEME_RE, 1) != "",
        F.concat(
            rev,
            F.when(port != "", F.concat(F.lit(":"), port)).otherwise(
                F.lit("")
            ),
            F.lit(")"),
            pathq,
        ),
    )


def cdx_index(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    n_partitions: int | None = None,
) -> DataFrame:
    """(surt, ts, url) capture rows, range-partitioned by surt and
    sorted by (surt, ts) within partitions — write this to parquet and
    footer min/max statistics make every prefix lookup a file-pruned
    scan. Captures with un-keyable URLs (NULL surt) are dropped: they
    cannot land in any range."""
    rows = cdx_rows(df, url_col, ts_col).drop("bucket")
    parts = (
        rows.repartitionByRange(n_partitions, "surt")
        if n_partitions
        else rows.repartitionByRange("surt")
    )
    return parts.sortWithinPartitions("surt", "ts")


#: leading characters of the SURT key used as the hive partition
#: column of a MAINTAINED capture index — four chars of the reversed
#: host groups whole TLD neighborhoods per directory, so an
#: incremental merge touches only the directories its batch lands in.
CDX_BUCKET_LEN = 4


def cdx_rows(
    df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """(bucket, surt, ts, url): the maintained-index row shape —
    ``cdx_index``'s rows plus the coarse surt-prefix partition
    column."""
    rows = df.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(ts_col).alias("ts"),
        F.col(url_col).alias("url"),
    ).filter(F.col("surt").isNotNull())
    return rows.select(
        F.substring("surt", 1, CDX_BUCKET_LEN).alias("bucket"),
        "surt",
        "ts",
        "url",
    )


def cdx_merge(store, captures: DataFrame, name: str = "cdx",
              url_col: str = "url", ts_col: str = "warc_ts") -> None:
    """Growing-crawl maintenance path: fold a capture batch into a
    persisted CDX table WITHOUT rewriting the corpus-scale index.

    The table is hive-partitioned by the surt-prefix ``bucket`` and
    the bucket is part of the dedup key, so ``TableStore.merge_upsert``
    takes its partition-pruned leaf path: only bucket directories the
    batch actually touches are read and swapped — cost ∝ batch
    locality, not index size (inode pin in test_cdx). Identical
    re-observed captures (same surt/ts/url) collapse instead of
    duplicating, so replaying a WARC is idempotent. Merged buckets
    trade the within-file sort for directory-level pruning; run
    ``store.compact(name, sort_by=["surt", "ts"])`` as periodic
    maintenance to restore footer-tight files (the zorder/compact
    discipline). Merge-then-read equals a from-scratch
    ``cdx_rows`` build on the union — decision-identity pinned in
    test_cdx and replayed by the q_cdx_merge oracle."""
    store.merge_upsert(
        cdx_rows(captures, url_col, ts_col),
        name,
        keys=["bucket", "surt", "ts", "url"],
        partition_by=["bucket"],
    )


def cdx_prefix_lookup(index: DataFrame, prefix: str) -> DataFrame:
    """All captures under a SURT prefix (a host, a registrable domain
    written in SURT form, or a path subtree), in capture order. The
    predicate is a plain ``startswith`` → Catalyst pushes a
    StartsWith/range filter into the parquet scan and partition
    pruning does the rest."""
    return index.filter(F.col("surt").startswith(F.lit(prefix))).orderBy(
        "surt", "ts"
    )
