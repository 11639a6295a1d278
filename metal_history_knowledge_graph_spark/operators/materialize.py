"""Graph materialization + lineage/metrics checkpoints.

Entity and edge tables are partitioned by ``entity_type`` / ``pred`` —
the Spark replacement for the reference's per-type Kuzu node/edge
tables (``src/schema/initialize_kuzu.py:26-220``): partition pruning
makes per-type/per-predicate queries scan only their slice.

The lineage table is the resume contract (modeled on the reference's
chunk checkpoint, ``scripts/automation/batch_extraction.py:39-66``):
one row per (run_id, stage) commit with row counts and metrics. A
re-run with the same run_id skips completed stages (their tables are
already committed); an incremental run anti-joins new pages against
the processed-urls record. All writes go through TableStore, so on
Iceberg each commit is a snapshot — exact resume falls out.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import TableStore

LINEAGE_TABLE = "lineage"


def stage_complete(store: TableStore, run_id: str, stage: str) -> bool:
    if not store.exists(LINEAGE_TABLE):
        return False
    n = (
        store.read(LINEAGE_TABLE)
        .filter(
            (F.col("run_id") == run_id)
            & (F.col("stage") == stage)
            & (F.col("status") == "complete")
        )
        .limit(1)
        .count()
    )
    return n > 0


def commit_stage(
    store: TableStore,
    run_id: str,
    stage: str,
    row_count: int,
    metrics: dict[str, float] | None = None,
) -> None:
    spark = store.spark
    metrics = {k: float(v) for k, v in (metrics or {}).items()}
    row = [(run_id, stage, "complete", int(row_count), metrics, float(time.time()))]
    df = spark.createDataFrame(
        row,
        "run_id string, stage string, status string, row_count long, "
        "metrics map<string,double>, committed_ts double",
    )
    store.append(df, LINEAGE_TABLE)


def write_entities(store: TableStore, entities: DataFrame) -> None:
    store.write(entities, "entities", partition_by=["entity_type"])


def write_edges(store: TableStore, edges: DataFrame) -> None:
    store.write(edges, "edges", partition_by=["pred"])


def verify_counts(store: TableStore) -> DataFrame:
    """Post-load verification counts (load_to_kuzu.py:863-907)."""
    ents = store.read("entities").groupBy("entity_type").agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("table", F.lit("entities"))
    edges = store.read("edges").groupBy(F.col("pred").alias("entity_type")).agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("table", F.lit("edges"))
    return ents.unionByName(edges)
