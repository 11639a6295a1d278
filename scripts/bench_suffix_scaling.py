#!/usr/bin/env python3
"""North-rule datapoint for the generalized suffix array
(operators/suffix.py — prefix doubling): build suffix ranks for a
deterministic synthetic corpus at local[LOW] vs local[HIGH] (fresh
JVM per level, repeats+min, steal logged — the BENCH.md protocol)
and record throughput + scaling efficiency to SUFFIX_SCALING.json.

Usage: python scripts/bench_suffix_scaling.py [--docs 8000]
         [--chars 150] [--low 3] [--high 12] [--repeats 2]

The corpus is seeded repeat-heavy text (32-char alphabet with shared
phrase fragments) so the doubling loop runs a realistic number of
rounds; positions = docs × chars. Wall time covers suffix_ranks + a
count() action. Efficiency = (wall_low / wall_high) / (high / low).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from metal_history_knowledge_graph_spark.operators.suffix import suffix_ranks

spark = (
    SparkSession.builder.master("local[{cores}]")
    .appName("suffix-scaling")
    .config("spark.sql.shuffle.partitions", "{parts}")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = (
    spark.range({docs})
    .select(
        F.col("id").alias("doc_id"),
        F.substring(
            F.repeat(
                F.concat(
                    F.md5(F.concat(F.lit("sx:"), (F.col("id") % 97).cast("string"))),
                    F.lit(" the quick brown fox "),
                    F.md5(F.concat(F.lit("sy:"), (F.col("id") % 13).cast("string"))),
                ),
                4,
            ),
            1,
            {chars},
        ).alias("text"),
    )
    .repartition({parts})
)
docs = docs.localCheckpoint(eager=True)  # corpus build excluded from timing
t0 = time.time()
n = suffix_ranks(docs).count()
wall = time.time() - t0
print("RESULT", n, round(wall, 3))
spark.stop()
"""


def steal_pct():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return vals, (100.0 * vals[7] / max(1, sum(vals)))


def run_level(cores, docs, chars, repeats):
    walls = []
    for _ in range(repeats):
        before, _ = steal_pct()
        code = WORKER.format(
            repo=REPO, cores=cores, parts=cores * 4, docs=docs, chars=chars
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        after, _ = steal_pct()
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
        if not line:
            # surface the ROOT error, not just the shutdown cascade:
            # the first ERROR lines usually name the real cause
            # (e.g. "Total size of serialized results ... bigger than
            # spark.driver.maxResultSize")
            errs = [l for l in (out.stdout + out.stderr).splitlines()
                    if "ERROR" in l][:10]
            sys.stderr.write("\n".join(errs) + "\n")
            sys.stderr.write(out.stdout[-4000:] + out.stderr[-8000:])
            raise SystemExit(f"worker failed at local[{cores}]")
        _, n, wall = line[0].split()
        d_tot = sum(a - b for a, b in zip(after, before))
        d_steal = after[7] - before[7]
        walls.append(
            {
                "wall": float(wall),
                "rows": int(n),
                "steal_pct": round(100.0 * d_steal / max(1, d_tot), 2),
            }
        )
    return walls


def measure(docs, chars, low, high, repeats):
    lo = run_level(low, docs, chars, repeats)
    hi = run_level(high, docs, chars, repeats)
    wl = min(r["wall"] for r in lo)
    wh = min(r["wall"] for r in hi)
    speedup = wl / wh
    eff = speedup / (high / low)
    return {
        "docs": docs,
        "chars": chars,
        "positions": docs * chars,
        "value": round(eff, 4),
        "queries": {
            f"wall_local{low}": round(wl, 3),
            f"wall_local{high}": round(wh, 3),
            "speedup": round(speedup, 3),
        },
        "runs": {str(low): lo, str(high): hi},
    }


def main():
    ap = argparse.ArgumentParser()
    # default sized so per-round compute dominates the ~9 synchronous
    # round barriers' fixed job latency (at 1.2M positions the walls
    # are latency-bound and 3-core == 12-core; see BENCH.md)
    ap.add_argument("--docs", type=int, default=135_000)
    ap.add_argument(
        "--docs-list", type=str, default=None,
        help="comma-separated docs sizes — records one efficiency row "
             "per size (the VERDICT r4 #3 size-scaling evidence: does "
             "the barrier tax amortize as per-round work grows?); the "
             "headline value is the LARGEST size's efficiency",
    )
    ap.add_argument("--chars", type=int, default=300)
    ap.add_argument("--low", type=int, default=3)
    ap.add_argument("--high", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    sizes = (
        [int(x) for x in args.docs_list.split(",")]
        if args.docs_list
        else [args.docs]
    )
    rows = [
        measure(d, args.chars, args.low, args.high, args.repeats)
        for d in sorted(sizes)
    ]
    head = rows[-1]
    res = {
        "metric": "suffix_array_scaling_efficiency",
        "value": head["value"],
        "unit": "ratio",
        "queries": head["queries"],
        "docs": head["docs"],
        "chars": head["chars"],
        "positions": head["positions"],
        "runs": head["runs"],
    }
    if len(rows) > 1:
        res["size_rows"] = [
            {k: r[k] for k in ("docs", "chars", "positions", "value",
                               "queries")}
            for r in rows
        ]
    with open(os.path.join(REPO, "SUFFIX_SCALING.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
