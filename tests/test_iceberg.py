"""Iceberg-mode integration smoke (VERDICT r2 next-step #7).

The sandbox has no iceberg-spark-runtime jar, so these tests SKIP
cleanly here; with the jar available they exercise the TableStore
branches the parquet-mode suite cannot reach:

* snapshot write / append via ``writeTo``
* ``merge_upsert`` as a true ``MERGE INTO`` (matched update + insert,
  null-safe ``<=>`` keys)
* the two deliberate refusals (``compact`` → rewrite_data_files
  procedure, ``write_bucketed`` → bucket partition transform) raising
  with the documented DDL

Run with::

    ICEBERG_SPARK_JAR=/path/to/iceberg-spark-runtime-3.5_2.12-<v>.jar \
        python -m pytest tests/test_iceberg.py -q
"""

from __future__ import annotations

import os

import pytest

JAR = os.environ.get("ICEBERG_SPARK_JAR")

pytestmark = pytest.mark.skipif(
    not JAR or not os.path.isfile(JAR or ""),
    reason="iceberg-spark-runtime jar not available (set ICEBERG_SPARK_JAR)",
)


@pytest.fixture(scope="module")
def ice_spark(tmp_path_factory):
    """Dedicated session with a hadoop-catalog Iceberg warehouse named
    ``kg`` (TableStore detects Iceberg mode via spark.sql.catalog.kg).
    Any plain session from other test modules is stopped first — catalog
    confs only apply at JVM-session creation."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    wh = str(tmp_path_factory.mktemp("ice_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kg-iceberg-smoke")
        .config("spark.jars", JAR)
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.kg", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.kg.type", "hadoop")
        .config("spark.sql.catalog.kg.warehouse", wh)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture()
def ice_store(ice_spark, tmp_path):
    from metal_history_knowledge_graph_spark.io import TableStore

    store = TableStore(ice_spark, str(tmp_path / "store"))
    assert store.iceberg, "catalog conf must switch the store to Iceberg mode"
    return store


def test_iceberg_write_read_roundtrip(ice_spark, ice_store):
    df = ice_spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    ice_store.write(df, "t_rt", partition_by=["v"])
    assert ice_store.exists("t_rt")
    assert {(r.k, r.v) for r in ice_store.read("t_rt").collect()} == {(1, "a"), (2, "b")}
    ice_store.append(ice_spark.createDataFrame([(3, "c")], "k long, v string"), "t_rt")
    assert ice_store.read("t_rt").count() == 3


def test_iceberg_merge_upsert_is_merge_into(ice_spark, ice_store):
    df = ice_spark.createDataFrame([(1, "a"), (None, "n")], "k long, v string")
    ice_store.write(df, "t_up")
    ice_store.merge_upsert(
        ice_spark.createDataFrame([(1, "A"), (None, "N"), (2, "b")], "k long, v string"),
        "t_up", keys=["k"],
    )
    rows = {r.k: r.v for r in ice_store.read("t_up").collect()}
    # matched rows updated (incl. the NULL key, <=> semantics), new row inserted
    assert rows == {1: "A", None: "N", 2: "b"}


def test_iceberg_refusals_carry_the_ddl(ice_spark, ice_store):
    df = ice_spark.createDataFrame([(1, "a")], "k long, v string")
    ice_store.write(df, "t_ref")
    with pytest.raises(NotImplementedError, match="rewrite_data_files"):
        ice_store.compact("t_ref")
    with pytest.raises(NotImplementedError, match="bucket"):
        ice_store.write_bucketed(df, "t_ref", bucket_cols=["k"])
