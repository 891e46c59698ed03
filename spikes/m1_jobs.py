"""Dump the per-job timeline of one m1 run (UI REST) for a given variant.

Usage: SPARK_GRAFT_CPUS=32 python spikes/m1_jobs.py [variant]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from entropy_balance_weighting_spark.queries import QUERIES  # noqa: E402
from entropy_balance_weighting_spark.session import get_spark  # noqa: E402
from spikes.m1_bisect import apply_variant  # noqa: E402


def rest(port: int, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="m1_jobs", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1])
    app_id = sc.applicationId
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    q = QUERIES["m1_problem_table_stats"]
    apply_variant(variant, spark)
    # warmup
    df = q.fn(spark, sf_dir)
    df.persist(); df.count(); df.collect(); df.unpersist()
    jobs_before = {j["jobId"] for j in rest(port, f"applications/{app_id}/jobs")}
    t0 = time.perf_counter()
    df = q.fn(spark, sf_dir)
    df.persist()
    df.count()
    df.collect()
    df.unpersist()
    wall = time.perf_counter() - t0
    jobs = [
        j
        for j in rest(port, f"applications/{app_id}/jobs")
        if j["jobId"] not in jobs_before
    ]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"variant={variant} wall={wall:.3f}s jobs={len(jobs)}")
    prev_end = None
    fmt = "%H:%M:%S"
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s.split(".")[0].split("T")[1], fmt)

    for j in jobs:
        st, en = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = (st - prev_end).total_seconds() if prev_end else 0.0
        prev_end = en
        print(
            f"  job {j['jobId']:3d} dur={(en-st).total_seconds():5.2f}s "
            f"gap={gap:5.2f}s tasks={j['numTasks']:4d} "
            f"stages={len(j['stageIds'])} desc={j.get('description','')[:60]!r}"
        )
    stages = rest(port, f"applications/{app_id}/stages?status=complete")
    sid2 = {s["stageId"]: s for s in stages}
    for j in jobs:
        for sid in sorted(j["stageIds"]):
            s = sid2.get(sid)
            if not s:
                continue
            print(
                f"    stage {sid:4d} job={j['jobId']:3d} "
                f"tasks={s['numCompleteTasks']:4d} "
                f"exec_ms={s.get('executorRunTime',0):6d} "
                f"cpu_ms={s.get('executorCpuTime',0)//1_000_000:6d} "
                f"sh_r={s.get('shuffleReadBytes',0):9d} "
                f"sh_w={s.get('shuffleWriteBytes',0):9d} {s['name'][:50]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
