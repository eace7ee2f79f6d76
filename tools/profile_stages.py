"""Stage-level profiler: per-job / per-stage shuffle bytes, task counts
and walls for registered queries (guide §1/§2.3: find where the bytes
cross the exchange; guide-§7.1 UI evidence, captured headlessly).

Runs each query against a UI-enabled session, then reads the UI REST
API (localhost only) for every job/stage the query submitted. This is
the measurement tool for loop-shaped operators (dup_components,
greedy_over_edges, profile_tables) whose work happens in driver-side
jobs that never appear in the final ``explain`` output — and for
auditing how many bytes each SMJ stage of the band-join machinery
actually shuffles.

Usage: python tools/profile_stages.py [--sf DIR] [--out FILE] name [name...]
Prints a per-query summary; --out writes the full JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakerulegeneration_spark import queries as Q
from datalakerulegeneration_spark.session import get_spark

_IMPLS = {name: impl for name, (impl, _) in Q.REGISTRY.items()}


def _api(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_file = None
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_file = args[i + 1]
        del args[i : i + 2]
    names = args
    spark = get_spark(
        "stage-profile",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "10000",
            "spark.ui.retainedStages": "10000",
        },
    )
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1])
    app_id = spark.sparkContext.applicationId
    # warmup (JIT) — its jobs are excluded by the job-id watermark below
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()

    report = {}
    for name in names:
        jobs_before = {j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"stageprof:{name}")
        t0 = time.time()
        df = _IMPLS[name](spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.time() - t0
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

        jobs = [
            j
            for j in _api(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(port, f"applications/{app_id}/stages/{sid}"):
                    stages.append(
                        {
                            "stage": sid,
                            "name": att["name"].split("\n")[0][:80],
                            "status": att["status"],
                            "tasks": att["numCompleteTasks"],
                            "wall_ms": (att.get("executorRunTime") or 0),
                            "input_mb": round((att.get("inputBytes") or 0) / 1e6, 2),
                            "sh_read_mb": round(
                                (att.get("shuffleReadBytes") or 0) / 1e6, 2
                            ),
                            "sh_write_mb": round(
                                (att.get("shuffleWriteBytes") or 0) / 1e6, 2
                            ),
                            "sh_write_recs": att.get("shuffleWriteRecords") or 0,
                        }
                    )
            except Exception:
                pass  # skipped stages 404
        done = [s for s in stages if s["status"] == "COMPLETE"]
        report[name] = {
            "build_s": round(t_build, 2),
            "exec_s": round(t_exec, 2),
            "n_jobs": len(jobs),
            "n_stages_complete": len(done),
            "n_tasks": sum(s["tasks"] for s in done),
            "sh_write_mb_total": round(sum(s["sh_write_mb"] for s in done), 2),
            "stages": stages,
        }
        r = report[name]
        print(
            f"{name}: build {r['build_s']}s exec {r['exec_s']}s | "
            f"{r['n_jobs']} jobs, {r['n_stages_complete']} stages, "
            f"{r['n_tasks']} tasks, shuffle-write {r['sh_write_mb_total']} MB"
        )
        for s in sorted(done, key=lambda x: -x["sh_write_mb"])[:8]:
            print(
                f"   stage {s['stage']:>4} {s['tasks']:>4}t "
                f"run {s['wall_ms']:>7}ms in {s['input_mb']:>8} "
                f"sr {s['sh_read_mb']:>8} sw {s['sh_write_mb']:>8} MB "
                f"({s['sh_write_recs']} recs) {s['name']}"
            )
    if out_file:
        with open(out_file, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"full report -> {out_file}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
