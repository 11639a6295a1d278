#!/usr/bin/env python3
"""Redirect-chain resolution scaling bench: parallel pointer doubling
(operators/redirects.resolve_redirects) over millions of long chains,
at two parallelism levels (north-rule methodology: same job, same
input, N vs 4N cores, fresh JVM per level, repeats+min — see BENCH.md
for the steal caveat and why 3-vs-12 is the faithful analogue here),
PLUS the algorithmic control: a naive one-hop-per-round resolver on
the SAME input at the high level, so the artifact shows both the
core-scaling of the doubling plan and its O(log H)-vs-O(H) round
advantage (8 self-joins vs 63 for 64-long chains).

Usage: python scripts/bench_redirects.py [--edges 8000000]
       [--chain-len 64] [--low 3 --high 12 --repeats 2] [--skip-naive]
Prints one JSON line and writes REDIRECTS_SCALING.json (embedded by
bench.py under ``redirects_scaling``).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import json, os, sys, time
cpus = int(sys.argv[1]); mode = sys.argv[2]
path = sys.argv[3]; chain_len = int(sys.argv[4])
sys.path.insert(0, %(repo)r)
from metal_history_knowledge_graph_spark.session import get_spark
from pyspark.sql import functions as F
confs = {
    "spark.driver.memory": f"{max(8, 2 * cpus)}g",
    # 96 even files stay 96 splits (BENCH.md rule)
    "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(128 * 1024),
}
# pointer doubling is SHUFFLE-bound: in local mode all "executors"
# share one spill disk, which caps core-scaling at the disk's
# bandwidth no matter the CPU count. SPARK_GRAFT_SHM_SHUFFLE=1 puts
# spark.local.dir on tmpfs — the single-box stand-in for the
# per-executor NVMe + network fabric a real cluster shuffles over.
if os.environ.get("SPARK_GRAFT_SHM_SHUFFLE") == "1":
    d = f"/dev/shm/redirects_shuffle_{cpus}_{mode}"
    os.makedirs(d, exist_ok=True)
    confs["spark.local.dir"] = d
spark = get_spark(app_name=f"redirects-{mode}-{cpus}",
                  master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_confs=confs)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.read.parquet(path)
edges.count()  # warm the scan

def j0():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]

max_hops = 2 * chain_len  # comfortably above the longest chain

a = j0(); t0 = time.time()
if mode == "double":
    from metal_history_knowledge_graph_spark.operators.redirects import (
        resolve_redirects,
    )
    out = resolve_redirects(edges, max_hops=max_hops)
    n = out.filter(F.col("resolved")).count()
else:
    # naive control: ONE hop per round — same map, same lazy
    # checkpoints, same final predicate; only the round count differs
    from metal_history_knowledge_graph_spark.operators.redirects import (
        redirect_map,
    )
    m = redirect_map(edges)
    ptr = m.select("url", F.col("nxt").alias("cur"),
                   F.lit(1).cast("long").alias("hops")).localCheckpoint(eager=False)
    step = m.select(F.col("url").alias("cur"), F.col("nxt").alias("s_nxt"))
    for _ in range(chain_len - 1):
        ptr = (ptr.join(step, "cur", "left")
               .select("url",
                       F.coalesce("s_nxt", "cur").alias("cur"),
                       (F.col("hops")
                        + F.col("s_nxt").isNotNull().cast("long")).alias("hops"))
               .localCheckpoint(eager=False))
    still = m.select(F.col("url").alias("cur")).withColumn("is_src", F.lit(True))
    out = ptr.join(still, "cur", "left")
    n = out.filter(F.col("is_src").isNull()
                   & (F.col("hops") <= max_hops)).count()
wall = time.time() - t0
b = j0(); d = [y - x for x, y in zip(a, b)]
steal = round(100.0 * d[7] / (sum(d) or 1), 2)
print(json.dumps({"cpus": cpus, "mode": mode, "rows": n,
                  "wall": round(wall, 3), "steal_pct": steal}))
spark.stop()
"""


def gen_edges(path: str, n_edges: int, chain_len: int) -> None:
    """K chains of chain_len-1 hops each, as REAL URL STRINGS (the
    keys a redirect log actually carries — string hash/compare is the
    CPU the join pays at scale, where 8-byte synthetic ids would
    understate per-core work and overstate the memory-bus share);
    written as 96 even files."""
    from pyspark.sql import functions as F

    from metal_history_knowledge_graph_spark.session import get_spark

    spark = get_spark(app_name="redirects-gen", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    per_chain = chain_len - 1
    chain = F.expr(f"id div {per_chain}")
    pos = F.pmod(F.col("id"), per_chain)

    def url(p):
        return F.concat(
            F.lit("http://h"), chain.cast("string"),
            F.lit(".example/seg/"), p.cast("string"), F.lit("/page"),
        )

    df = spark.range(n_edges).select(
        url(pos).alias("src"), url(pos + 1).alias("dst")
    ).repartition(96)
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--chain-len", type=int, default=64)
    ap.add_argument("--low", type=int, default=3)
    ap.add_argument("--high", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--skip-naive", action="store_true")
    args = ap.parse_args()

    path = f"/tmp/redirect_chains_{args.edges}_{args.chain_len}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        gen_edges(path, args.edges, args.chain_len)

    worker_src = WORKER % {"repo": REPO}

    def run(cpus: int, mode: str) -> dict:
        out = subprocess.run(
            [sys.executable, "-c", worker_src, str(cpus), mode, path,
             str(args.chain_len)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    runs: dict[int, list[dict]] = {args.low: [], args.high: []}
    for _ in range(args.repeats):
        for cpus in (args.low, args.high):
            runs[cpus].append(run(cpus, "double"))
    naive = None if args.skip_naive else run(args.high, "naive")

    best = {c: min(rs, key=lambda r: r["wall"]) for c, rs in runs.items()}
    lo, hi = best[args.low]["wall"], best[args.high]["wall"]
    speedup = lo / hi
    eff = speedup / (args.high / args.low)
    queries = {
        f"wall_local{args.low}": lo, f"wall_local{args.high}": hi,
        "speedup": round(speedup, 3),
        "n_vs_4n_efficiency": round(eff, 4),
        f"edges_per_sec_local{args.high}": round(args.edges / hi, 0),
    }
    if naive:
        queries[f"naive_wall_local{args.high}"] = naive["wall"]
        queries["doubling_advantage"] = round(naive["wall"] / hi, 3)
    # headline = the O(log H) round advantage (the operator's scale
    # design); the N-vs-4N ratio of this 16-barrier job is recorded
    # alongside but is throttle/barrier-bound on this host — see the
    # note written by the first recorded run and BENCH.md.
    result = {
        "metric": "redirect_doubling_round_advantage",
        "value": round(queries.get("doubling_advantage", eff), 4),
        "unit": "ratio",
        "queries": queries,
        "edges": args.edges, "chain_len": args.chain_len,
        "resolved_rows": best[args.high]["rows"],
        "runs": {str(c): [{"wall": r["wall"], "steal_pct": r["steal_pct"]}
                          for r in rs] for c, rs in runs.items()},
    }
    with open(os.path.join(REPO, "REDIRECTS_SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
