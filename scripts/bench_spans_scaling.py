#!/usr/bin/env python3
"""Two-parallelism-level scaling evidence for the round-3 span-dedup
family (north-rule methodology: same job, same input, N vs 4N cores on
one host; see BENCH.md for the steal-noise caveat and why 3-vs-12 is
the faithful analogue on this 32-core box).

Measures the composed webtext_prep chain (boilerplate strip → span
scrub → Gopher gate → exact dedup) over a seeded synthetic corpus.
Each level runs in a FRESH interpreter/JVM (subprocess) so executor
pools don't leak across levels.

Usage: python scripts/bench_spans_scaling.py [--docs 200000]
       [--low 3 --high 12 --repeats 2]
Prints one JSON line.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import json, sys, time
cpus = int(sys.argv[1]); n_docs = int(sys.argv[2])
corpus_path = sys.argv[3]
sys.path.insert(0, %(repo)r)
from metal_history_knowledge_graph_spark.session import get_spark
spark = get_spark(app_name=f"spans-scale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus,
                  extra_confs={"spark.driver.memory": f"{max(8, 2 * cpus)}g"})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(corpus_path)
docs.count()  # warm the scan
from metal_history_knowledge_graph_spark.plans.webtext import webtext_prep
t0 = time.time()
out = webtext_prep(docs, gopher_kwargs={"min_words": 10})
n = out.select("doc_id").count()
wall = time.time() - t0
print(json.dumps({"cpus": cpus, "rows": n, "wall": round(wall, 3)}))
spark.stop()
"""


def gen_corpus(path: str, n_docs: int) -> None:
    """Seeded word-salad corpus with genuine cross-doc span overlap
    (tiny vocabulary), written once as 96 even files (BENCH.md: even
    input splits → integral task waves at every tested core count)."""
    from metal_history_knowledge_graph_spark.session import get_spark

    spark = get_spark(app_name="spans-scale-gen", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    words = [f"w{i}" for i in range(40)]
    vocab = F.array(*[F.lit(w) for w in words])
    df = (
        spark.range(n_docs)
        .select(
            F.col("id").cast("int").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(1), (F.xxhash64("id") % 40 + 41).cast("int")
                    ),
                    lambda i: F.element_at(
                        vocab,
                        (F.pmod(F.xxhash64(F.col("id") * 1000 + i), 40) + 1
                         ).cast("int"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(96)
    )
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--low", type=int, default=3)
    ap.add_argument("--high", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    corpus = f"/tmp/spans_scale_{args.docs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        gen_corpus(corpus, args.docs)

    worker_src = WORKER % {"repo": REPO}
    walls: dict[int, list[float]] = {args.low: [], args.high: []}
    for _ in range(args.repeats):
        for cpus in (args.low, args.high):
            out = subprocess.run(
                [sys.executable, "-c", worker_src, str(cpus),
                 str(args.docs), corpus],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            walls[cpus].append(json.loads(line)["wall"])

    lo, hi = min(walls[args.low]), min(walls[args.high])
    speedup = lo / hi
    eff = speedup / (args.high / args.low)
    print(json.dumps({
        "metric": "spans_webtext_prep_scaling_efficiency",
        "value": round(eff, 4), "unit": "ratio",
        "queries": {
            f"wall_local{args.low}": lo, f"wall_local{args.high}": hi,
            "speedup": round(speedup, 3),
        },
        "docs": args.docs,
        "walls": walls,
    }))


if __name__ == "__main__":
    main()
