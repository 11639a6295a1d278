"""SparkSession factory with the configuration this engine assumes.

Tuned for correctness-at-scale defaults: AQE on (runtime re-planning +
skew-join splitting), Arrow on (every UDF in this engine is pandas/Arrow
batched), explicit shuffle partitioning.

On a real cluster these confs ride along unchanged via
``spark-submit --py-files``; only master/executor sizing differs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that matter for this engine regardless of deployment.
ENGINE_CONFS: dict[str, str] = {
    # Adaptive execution: runtime shuffle-partition coalescing and
    # skew-join splitting — the famous-band hot key relies on this
    # plus our explicit salting (operators/canonicalize.py).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Every UDF in the engine is a pandas UDF / mapInPandas — Arrow is
    # the data plane between JVM and Python.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    # Dimension tables (alias dict, canonical-name map, predicate
    # whitelist) are small; keep the broadcast threshold generous so
    # Catalyst picks broadcast joins for id resolution.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Deterministic timezone/locale behaviour.
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: the reference semantics are permissive (nulls on bad
    # casts), and we never want a job-killing overflow at 100 TB.
    "spark.sql.ansi.enabled": "false",
    # collect_set/collect_list aggregations (triple provenance pooling,
    # variation tracking) run on ObjectHashAggregate, which silently
    # degrades to a per-partition SORT of the full mention stream once
    # the hash map passes 128 keys (the Spark default). Our grouping
    # keys are vocabulary-sized (10^3..10^5 facts), far past 128 but
    # trivially memory-safe, so keep the hash path.
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "131072",
}


def get_spark(
    app_name: str = "metal-history-kg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    on a cluster leave it unset and let spark-submit supply it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and os.environ.get("SPARK_MASTER") is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    confs = dict(ENGINE_CONFS)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    confs.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
