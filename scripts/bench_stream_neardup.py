#!/usr/bin/env python3
"""Streaming near-dup ingest end-to-end bench:
``streaming/incremental.stream_neardup_ingest`` over a 3-batch
synthetic corpus — per-batch wall, admitted rows, and index growth.
Each batch carries ~20% exact re-crawls of the previous batch and
~10% within-batch duplicates (the real snapshot-ingest pattern), so
the persisted index must both GROW and keep admission exactly-once.

Usage: python scripts/bench_stream_neardup.py [--docs-per-batch 100000]
       [--cpus from $SPARK_GRAFT_CPUS]
Prints one JSON line and writes NEARDUP_STREAM_RECORDED.json
(embedded by bench.py under ``neardup_stream``).
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: word vocabulary for the salads — big enough that distinct docs
#: share no 3-shingles at the tested sizes.
VOCAB = 2000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-per-batch", type=int, default=100_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--batches", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from metal_history_knowledge_graph_spark.session import get_spark
    from metal_history_knowledge_graph_spark.streaming.incremental import (
        stream_neardup_ingest,
    )

    spark = get_spark(app_name="stream-neardup-bench",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    root = f"/tmp/stream_neardup_bench_{args.docs_per_batch}"
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    out = os.path.join(root, "out")
    cp = os.path.join(root, "cp")

    def salad(seed_col):
        """Deterministic 24-word salad keyed by an id column."""
        return F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(24)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(seed_col * 31 + i), VOCAB)
                    .cast("string"),
                ),
            ),
            " ",
        )

    def batch_docs(b: int):
        """Batch b: 70% fresh + 20% re-crawls of batch b-1 + 10%
        within-batch exact duplicates of this batch's fresh docs."""
        n = args.docs_per_batch
        fresh = spark.range(n * 7 // 10).select(
            (F.col("id") + b * n).alias("seed"),
            (F.col("id") + b * n).alias("doc_id"))
        recrawl = spark.range(n * 2 // 10).select(
            (F.col("id") + max(b - 1, 0) * n).alias("seed"),
            (F.col("id") + b * n + n).alias("doc_id"))
        within = spark.range(n * 1 // 10).select(
            (F.col("id") + b * n).alias("seed"),
            (F.col("id") + b * n + 2 * n).alias("doc_id"))
        return (
            fresh.unionByName(recrawl).unionByName(within)
            .select("doc_id", salad(F.col("seed")).alias("text"))
        )

    walls, admitted, index_rows = [], [], []
    for b in range(args.batches):
        batch_docs(b).repartition(8).write.mode("append").parquet(src)
        t0 = time.time()
        stream = spark.readStream.schema(
            "doc_id long, text string").parquet(src)
        q = stream_neardup_ingest(spark, stream, out, cp, threshold=0.9)
        q.awaitTermination(1200)
        walls.append(round(time.time() - t0, 3))
        admitted.append(
            spark.read.parquet(os.path.join(out, "accepted")).count())
        index_rows.append(
            spark.read.parquet(os.path.join(out, "index"))
            .select("doc").distinct().count())

    # the admitted corpus must be exactly the distinct fresh docs and
    # contain no near-dup pair at the threshold
    from metal_history_knowledge_graph_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    acc = spark.read.parquet(os.path.join(out, "accepted"))
    dup_admissions = acc.groupBy("doc_id").count() \
        .filter(F.col("count") > 1).count()
    residual_pairs = minhash_lsh_pairs(
        acc.select("doc_id", "text"), threshold=0.9).count()
    spark.stop()

    result = {
        "metric": "stream_neardup_ingest_batch_walls",
        "value": round(min(walls), 3), "unit": "sec",
        "queries": {f"batch{i}_wall": w for i, w in enumerate(walls)},
        "docs_per_batch": args.docs_per_batch,
        "cpus": args.cpus,
        "admitted_cum": admitted,
        "index_docs_cum": index_rows,
        "duplicate_admissions": dup_admissions,
        "residual_neardup_pairs": residual_pairs,
    }
    with open(os.path.join(REPO, "NEARDUP_STREAM_RECORDED.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
