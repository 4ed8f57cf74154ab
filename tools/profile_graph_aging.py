"""Attribute the graph family's in-sweep overhead (VERDICT r9 item 4).

Driver benches show harmonic/community at 3.2-3.7 s in the 240-query sweep
while isolated-warm runs cost 0.2-0.8 s.  This tool reproduces the sweep
shape in ONE session and attributes the gap:

  phase A: fresh session — warm each graph query once, then time N reps
  phase B: age the session with the first K bench queries (one run each)
  phase C: re-time the graph queries, same protocol
  each rep also records a pure-CPU calib sample (host-noise control) and,
  via the local UI REST API, the per-query sum of task executorRunTime and
  the job count — so wall inflation separates into (a) host noise
  [calib up], (b) more task work [runTime up], (c) driver/scheduler
  latency [wall up, runTime flat].

Usage: python tools/profile_graph_aging.py [K_aging_queries] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRAPH = [
    "harmonic_centrality_seeds",
    "community_modularity",
    "k_core_decomposition",
    "copurchase_communities",
    "copurchase_triangles",
]


def calib() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(1_000_000):
        x = (x * 1103515245 + 12345 + i) & 0xFFFFFFFF
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    k_age = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_CACHE_DERIVED", "1")

    from bench import BENCH_QUERIES

    from stellar_etl_spark.queries import QUERIES
    from stellar_etl_spark.session import get_spark

    # UI on for REST stage attribution (the bench session runs UI-off;
    # phase walls are still comparable — attribution, not certification)
    spark = get_spark(
        "graph-aging-profile", cpus=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    ui = sc.uiWebUrl

    def rest(path: str):
        app = sc.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
            return json.loads(r.read())

    def run(name: str) -> dict:
        """One timed noop run with REST-attributed task time."""
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        stage_ids = {s for j in jobs for s in j.get("stageIds", [])}
        run_ms = 0
        sched_ms = 0
        for s in rest("/stages?status=COMPLETE"):
            if s["stageId"] in stage_ids:
                run_ms += s.get("executorRunTime", 0)
                sched_ms += s.get("schedulerDelay", 0) or 0
        return {
            "wall": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stage_ids),
            "task_run_sec": round(run_ms / 1000.0, 3),
            "sched_delay_sec": round(sched_ms / 1000.0, 3),
            "calib": calib(),
        }

    out: dict = {"cpus": cpus, "sf_dir": sf_dir, "k_age": k_age}

    # phase A: fresh
    fresh: dict[str, list] = {}
    for name in GRAPH:
        run(name)  # warm (janino compile for this plan shape)
        fresh[name] = [run(name) for _ in range(reps)]
    out["fresh"] = fresh
    print(json.dumps({"phase": "fresh", "data": fresh}), flush=True)

    # phase B: age with the bench prefix (skip the graph family itself)
    t0 = time.time()
    for name in BENCH_QUERIES[:k_age]:
        if name in GRAPH:
            continue
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out["age_wall"] = round(time.time() - t0, 1)
    print(json.dumps({"phase": "aged", "wall": out["age_wall"]}), flush=True)

    # phase C: aged re-time (no extra warm: plans identical, codegen cached)
    aged: dict[str, list] = {}
    for name in GRAPH:
        aged[name] = [run(name) for _ in range(reps)]
    out["aged"] = aged
    print(json.dumps({"phase": "aged_times", "data": aged}), flush=True)

    with open("/tmp/graph_aging_profile.json", "w") as fh:
        json.dump(out, fh, indent=1)
    for name in GRAPH:
        fw = min(r["wall"] for r in fresh[name])
        aw = min(r["wall"] for r in aged[name])
        fr = min(r["task_run_sec"] for r in fresh[name])
        ar = min(r["task_run_sec"] for r in aged[name])
        print(
            f"{name}: fresh {fw:.2f}s (tasks {fr:.2f}) -> aged {aw:.2f}s "
            f"(tasks {ar:.2f})  jobs {fresh[name][0]['n_jobs']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
