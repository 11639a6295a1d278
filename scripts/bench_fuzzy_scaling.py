#!/usr/bin/env python3
"""Two-parallelism-level scaling evidence for the FastSS fuzzy-join
family (north-rule methodology: same job, same input, N vs 4N cores
on one host; see BENCH.md for the steal-noise caveat and why 3-vs-12
is the faithful analogue on this 32-core box).

Measures ``operators/fuzzy_join.fuzzy_pairs`` end to end — the
deletion-variant explode (narrow array-HOF Project), the inverted
equi-join on 8-byte variant hashes, and the Levenshtein verify — over
a seeded synthetic name corpus with realistic duplicate structure
(two-word names drawn from a bounded vocabulary, one in four typo'd,
so both dist-0 and dist-1 pairs occur at controlled density). The
variant-hash shuffle join is the dominant cost shape of
short-string entity canonicalization at 10^9 names.

Each level runs in a FRESH interpreter/JVM (subprocess) so executor
pools don't leak across levels. The corpus is written as 96 even
parquet files with a 2MB maxPartitionBytes split so task waves are
integral at every tested core count (the frontier-bench lesson,
CLAUDE.md).

Usage: python scripts/bench_fuzzy_scaling.py [--names 4000000]
       [--low 3 --high 12 --repeats 2]
Prints one JSON line and writes FUZZY_SCALING.json (embedded by
bench.py when present).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GEN = r"""
import sys
n = int(sys.argv[1]); path = sys.argv[2]
sys.path.insert(0, __REPO__)
from metal_history_knowledge_graph_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="fuzzy-gen", master="local[16]",
                  shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
# two-word names over a V*V base vocabulary sized to ~2 rows per base
# (V = sqrt(n/2)), so dist-0 collisions occur at O(n) density; every
# 4th row gets a deterministic single-char deletion so dist-1 pairs
# occur. Words are 6-hex md5 slices, NOT numeric labels: dense
# numerals ("x45"/"x4"/"x46") sit within edit distance 1 of dozens of
# neighbours and make the TRUE pair set quadratic-ish (measured 55
# pairs/name) — hash words keep cross-base distances ≥ 2 so output
# stays O(n), the realistic entity-name density. The two words must
# also be INDEPENDENT functions of id (id mod V and id div V) —
# deriving both from id mod V collapses the base space to V.
V = max(2, int((n / 2) ** 0.5))
base = spark.range(n).select(
    F.col("id"),
    F.concat(
        F.substring(F.md5(F.concat(F.lit("a"),
                                   (F.col("id") % V).cast("string"))), 1, 6),
        F.lit(" "),
        F.substring(F.md5(F.concat(
            F.lit("b"),
            ((F.col("id") / V).cast("long") % V).cast("string"))), 1, 6),
    ).alias("base"),
)
name = F.when(
    F.col("id") % 4 == 0,
    F.concat(
        F.expr("substring(base, 1, cast(id % (length(base) - 2) + 1 as int))"),
        F.expr("substring(base, cast(id % (length(base) - 2) + 3 as int))"),
    ),
).otherwise(F.col("base"))
base.select("id", name.alias("name")).repartition(96).write.mode(
    "overwrite").parquet(path)
spark.stop()
"""

WORKER = r"""
import json, sys, time
cpus = int(sys.argv[1])
corpus_path = sys.argv[2]
sys.path.insert(0, __REPO__)
from metal_history_knowledge_graph_spark.session import get_spark
spark = get_spark(app_name=f"fuzzy-scale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=4 * cpus,
                  extra_confs={
                      "spark.driver.memory": f"{max(8, 2 * cpus)}g",
                      # one split per corpus file (96 even files):
                      # the default 128MB packs them into ~4 input
                      # splits, capping the variant explode fan-in
                      "spark.sql.files.maxPartitionBytes":
                          str(2 * 1024 * 1024),
                      "spark.sql.files.openCostInBytes": str(128 * 1024),
                  })
spark.sparkContext.setLogLevel("ERROR")
names = spark.read.parquet(corpus_path)
names.count()  # warm the scan
from metal_history_knowledge_graph_spark.operators.fuzzy_join import fuzzy_pairs
# one untimed warm-up pass: codegen/JIT warmup is a large fraction of
# a short high-core wall (the KN-bench lesson, CLAUDE.md) — the
# artifact measures steady-state throughput
fuzzy_pairs(names, "id", "name").count()
t0 = time.time()
n_pairs = fuzzy_pairs(names, "id", "name").count()
wall = time.time() - t0
print(json.dumps({"cpus": cpus, "pairs": n_pairs, "wall": round(wall, 3)}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", type=int, default=4_000_000)
    ap.add_argument("--low", type=int, default=3)
    ap.add_argument("--high", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    corpus = f"/tmp/fuzzy_scale_{args.names}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        subprocess.run(
            [sys.executable, "-c", GEN.replace("__REPO__", repr(REPO)),
             str(args.names), corpus],
            check=True,
        )

    worker_src = WORKER.replace("__REPO__", repr(REPO))
    walls: dict[int, list[float]] = {args.low: [], args.high: []}
    pairs = None
    for _ in range(args.repeats):
        for cpus in (args.low, args.high):
            out = subprocess.run(
                [sys.executable, "-c", worker_src, str(cpus), corpus],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            rec = json.loads(line)
            walls[cpus].append(rec["wall"])
            pairs = rec["pairs"]

    lo, hi = min(walls[args.low]), min(walls[args.high])
    speedup = lo / hi
    eff = speedup / (args.high / args.low)
    result = {
        "metric": "fuzzy_join_scaling_efficiency",
        "value": round(eff, 4), "unit": "ratio",
        "queries": {
            f"wall_local{args.low}": lo, f"wall_local{args.high}": hi,
            "speedup": round(speedup, 3),
        },
        "names": args.names,
        "pairs": pairs,
        "walls": walls,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "FUZZY_SCALING.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
