#!/usr/bin/env python3
"""Per-stage job/gap profiler: runs the pipeline on an existing corpus
and reports, for every stage, wall vs job-covered time vs driver-side
gap (planning/scheduling), plus the slowest jobs. The gap component is
the serial driver cost that does not shrink with cores — the scaling
bench's Amdahl tail.

Usage: python scripts/profile_stages.py <pages_parquet> [cpus]
"""

import datetime
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ts(s: str) -> float:
    return datetime.datetime.strptime(
        s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
    ).timestamp()


def _jobs(ui: str, app: str) -> list[dict]:
    # the REST endpoint lists newest-first; slice-by-count attribution
    # needs chronological (jobId ascending) order
    js = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs"))
    return sorted(js, key=lambda j: j["jobId"])


def main():
    pages_path = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from metal_history_knowledge_graph_spark.io import TableStore
    from metal_history_knowledge_graph_spark.plans import pipeline as P
    from metal_history_knowledge_graph_spark.session import get_spark

    spark = get_spark(
        app_name="profile", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_confs={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(128 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    root = "/tmp/kg_profile_stages"
    shutil.rmtree(root, ignore_errors=True)
    store = TableStore(spark, root)
    pages = spark.read.parquet(pages_path)

    marks: list[tuple[str, float, int]] = []  # (stage, t_end, n_jobs_done)

    def mark(stage):
        marks.append((stage, time.time(), len(_jobs(ui, app))))

    mark("start")
    t0 = time.time()
    m = P.run(spark, pages, store, run_id="prof", resume=False,
              until_stage="chunks")
    mark("chunks")
    m.update(P.run(spark, pages, store, run_id="prof", resume=True,
                   until_stage="extracted"))
    mark("extracted")
    m.update(P.run(spark, pages, store, run_id="prof", resume=True,
                   until_stage="entities"))
    mark("entities")
    m.update(P.run(spark, pages, store, run_id="prof", resume=True))
    mark("edges")
    wall = time.time() - t0

    jobs = _jobs(ui, app)
    done = [j for j in jobs if "completionTime" in j]
    print(f"\nWALL {wall:.1f}s cpus={cpus} "
          f"stage_secs={{{', '.join(f'{k}={v:.1f}' for k, v in m.items() if k.endswith('_secs'))}}}")
    for (s0, t_a, n_a), (s1, t_b, n_b) in zip(marks, marks[1:]):
        seg = [j for j in done[n_a:n_b]]
        iv = sorted((_ts(j["submissionTime"]), _ts(j["completionTime"])) for j in seg)
        busy, cur = 0.0, None
        for a, b in iv:
            if cur is None or a > cur[1]:
                if cur:
                    busy += cur[1] - cur[0]
                cur = [a, b]
            else:
                cur[1] = max(cur[1], b)
        if cur:
            busy += cur[1] - cur[0]
        stage_wall = t_b - t_a
        print(f"\n== {s1}: wall {stage_wall:.1f}s, jobs {len(seg)}, "
              f"job-covered {busy:.1f}s, driver-gap {stage_wall - busy:.1f}s")
        for j in sorted(seg, key=lambda j: _ts(j["completionTime"]) - _ts(j["submissionTime"]), reverse=True)[:6]:
            d = _ts(j["completionTime"]) - _ts(j["submissionTime"])
            print(f"   {d:6.2f}s job {j['jobId']:>4} tasks={j.get('numTasks', '?'):>4} {j['name'][:70]}")
    spark.stop()


if __name__ == "__main__":
    main()
