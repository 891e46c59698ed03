"""Per-query profiling harness (optimization round r13).

For each named bench query at $SPARK_GRAFT_SF_DIR (default sf0.1):

- writes ``plans/r13/<name>_<tag>.txt`` with ``explain("formatted")``
- times the query with the noop sink (guide §1.4) after one warmup run
- counts Spark jobs/stages/tasks and shuffle bytes for the timed run via
  the UI REST API (the profiling session enables the UI; bench.py's
  session does not)

Usage: python spikes/profile_queries.py [--tag before] [names...]
(no names -> all bench-flagged queries)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def rest(app_port: int, path: str):
    url = f"http://localhost:{app_port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = "before"
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from entropy_balance_weighting_spark.queries import QUERIES
    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(app_name="ebw_profile", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1]) if sc.uiWebUrl else 4040
    app_id = sc.applicationId

    names = args or [n for n, q in QUERIES.items() if q.bench]
    plans_dir = Path(__file__).resolve().parents[1] / "plans" / "r13"
    plans_dir.mkdir(parents=True, exist_ok=True)

    # warm page cache / JVM once
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    out = {}
    for name in names:
        q = QUERIES[name]
        # plan capture (fresh build, no execution)
        df = q.fn(spark, sf_dir)
        if df.isStreaming:
            continue
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (plans_dir / f"{name}_{tag}.txt").write_text(plan)

        # warmup
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        jobs_before = {j["jobId"] for j in rest(port, f"applications/{app_id}/jobs")}
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)

        jobs = [
            j
            for j in rest(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        n_stages = sum(len(j["stageIds"]) for j in jobs)
        n_tasks = sum(j["numTasks"] for j in jobs)
        # shuffle bytes from the stage endpoint
        stage_ids = {s for j in jobs for s in j["stageIds"]}
        sh_read = sh_write = 0
        for s in rest(port, f"applications/{app_id}/stages"):
            if s["stageId"] in stage_ids and s["status"] != "SKIPPED":
                sh_read += s.get("shuffleReadBytes", 0)
                sh_write += s.get("shuffleWriteBytes", 0)
        out[name] = {
            "noop_sec": round(wall, 3),
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
            "shuffle_read_mb": round(sh_read / 1e6, 2),
            "shuffle_write_mb": round(sh_write / 1e6, 2),
        }
        print(f"{name:40s} {json.dumps(out[name])}", flush=True)

    Path(f"/tmp/profile_{tag}.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
