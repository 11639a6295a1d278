#!/usr/bin/env python3
"""Streaming crawl-scheduler end-to-end bench (VERDICT r3 #6):
``streaming/incremental.stream_crawl_scheduler`` over a 3-batch
synthetic crawl — per-batch wall, schedule size, and seen-set growth.
Each batch re-discovers ~30% of the previous batch's URLs (the real
frontier pattern), so the persistent seen anti-join must both GROW
and keep later batches exactly-once.

Usage: python scripts/bench_stream_crawl.py [--urls-per-batch 200000]
       [--cpus from $SPARK_GRAFT_CPUS]
Prints one JSON line and writes STREAM_CRAWL_RECORDED.json (embedded
by bench.py under ``stream_crawl``).
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_HOSTS = 997


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls-per-batch", type=int, default=200_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--batches", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from metal_history_knowledge_graph_spark.operators.robots import parse_robots
    from metal_history_knowledge_graph_spark.session import get_spark
    from metal_history_knowledge_graph_spark.streaming.incremental import (
        stream_crawl_scheduler,
    )

    spark = get_spark(app_name="stream-crawl-bench",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    root = f"/tmp/stream_crawl_bench_{args.urls_per_batch}"
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "cand")
    out = os.path.join(root, "out")
    cp = os.path.join(root, "cp")

    host = F.concat(
        F.lit("h"), (F.pmod(F.xxhash64("id"), N_HOSTS) + 1).cast("string"),
        F.lit(".example"),
    )
    robots = spark.range(N_HOSTS + 1).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".example")).alias("domain"),
        F.lit("User-agent: *\nDisallow: /private/\n").alias("robots_txt"),
    )
    rules = parse_robots(robots).localCheckpoint(eager=True)
    scores = spark.range(N_HOSTS + 1).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".example")).alias("host"),
        (F.pmod(F.xxhash64("id"), 1000000) + 1).cast("long")
        .alias("rank_fixed"),
    ).localCheckpoint(eager=True)

    def batch_urls(b: int):
        """Batch b: 70% fresh URLs + 30% re-discoveries of batch b-1
        (plus ~5% robots-blocked /private/ paths)."""
        n = args.urls_per_batch
        fresh = spark.range(n * 7 // 10).select(
            (F.col("id") + b * n).alias("id"))
        redisc = spark.range(n * 3 // 10).select(
            (F.col("id") + max(b - 1, 0) * n).alias("id"))
        ids = fresh.unionByName(redisc)
        path = F.when(F.pmod(F.col("id"), 20) == 0, F.lit("/private/x"))\
            .otherwise(F.concat(F.lit("/p/"), F.col("id").cast("string")))
        return ids.select(F.concat(F.lit("http://"), host, path).alias("url"))

    walls, sched_rows, seen_rows = [], [], []
    for b in range(args.batches):
        batch_urls(b).repartition(8).write.mode("append").parquet(src)
        t0 = time.time()
        cand = spark.readStream.schema("url string").parquet(src)
        q = stream_crawl_scheduler(
            spark, cand, rules, scores, out, cp, per_host_budget=50,
        )
        q.awaitTermination(600)
        walls.append(round(time.time() - t0, 3))
        sched_rows.append(
            spark.read.parquet(os.path.join(out, "schedule")).count())
        seen_rows.append(
            spark.read.parquet(os.path.join(out, "seen"))
            .select("url").distinct().count())

    # exactly-once across batches: no url scheduled twice
    dup = (
        spark.read.parquet(os.path.join(out, "schedule"))
        .groupBy("url").count().filter(F.col("count") > 1).count()
    )
    spark.stop()

    result = {
        "metric": "stream_crawl_scheduler_batch_walls",
        "value": round(min(walls), 3), "unit": "sec",
        "queries": {f"batch{i}_wall": w for i, w in enumerate(walls)},
        "urls_per_batch": args.urls_per_batch,
        "cpus": args.cpus,
        "schedule_rows_cum": sched_rows,
        "seen_distinct_cum": seen_rows,
        "duplicate_scheduled_urls": dup,
    }
    with open(os.path.join(REPO, "STREAM_CRAWL_RECORDED.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
