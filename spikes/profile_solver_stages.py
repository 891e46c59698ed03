"""Stage/task-level profile of one solver end-to-end run (optimization r13).

Extends profile_solver.py's job timeline down to stages: for every job in
the measured run, dump each stage's executorRunTime, task count, launch
overhead (stage duration vs max task duration), and shuffle/IO bytes —
pinpoints whether a 0.3 s iteration job is compute, dispatch, or fetch.

Usage: python spikes/profile_solver_stages.py [bounded|distributed|grouped|bounded_grouped|localpath]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"


def rest(port, app_id, path):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/applications/{app_id}/{path}",
        timeout=10,
    ) as r:
        return json.loads(r.read())


def ts(s):
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "bounded"
    from entropy_balance_weighting_spark.queries.solver import (
        solve_lineitem_problem,
    )
    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(
        app_name="ebw_profile_solver_stages",
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1])
    app_id = sc.applicationId

    kwargs = {
        "bounded": dict(force_distributed=True, bounds=(0.2, 5.0)),
        "distributed": dict(force_distributed=True),
        "localpath": dict(local_threshold=10**10),
    }.get(which)

    def run():
        if kwargs is not None:
            _, _, r = solve_lineitem_problem(spark, SF_DIR, **kwargs)
            if r.converged:
                r.new_weights.count()
            return r
        from entropy_balance_weighting_spark import entropy_balance
        from entropy_balance_weighting_spark.plans import (
            MomentSpec,
            build_problem_tables,
            targets_from_problem,
        )
        from entropy_balance_weighting_spark.session import load_table

        li = load_table(spark, SF_DIR, "lineitem")
        spec = MomentSpec(
            weight_col="l_quantity",
            numeric=("l_discount", "l_tax"),
            group=("l_suppkey",),
        )
        pt = build_problem_tables(li, spec)
        opts = {"force_distributed": True}
        if which == "bounded_grouped":
            opts["bounds"] = (0.2, 5.0)
        res = entropy_balance(
            mean_population_moments=targets_from_problem(pt, perturb=0.01),
            x_sample=pt,
            options=opts,
        )
        if res.converged:
            res.new_weights.count()
        return res

    run()  # warmup
    jobs_before = {j["jobId"] for j in rest(port, app_id, "jobs")}
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0

    jobs = sorted(
        (j for j in rest(port, app_id, "jobs") if j["jobId"] not in jobs_before),
        key=lambda j: j["jobId"],
    )
    stages_by_id = {}
    for st in rest(port, app_id, "stages"):
        stages_by_id[(st["stageId"], st["attemptId"])] = st

    print(f"=== {which}: wall {wall:.3f}s, {len(jobs)} jobs ===")
    prev_end = None
    for j in jobs:
        sub, comp = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = sub - prev_end if prev_end else 0.0
        desc = (j.get("description") or j["name"])[:60]
        print(
            f"job {j['jobId']:4d} dur={comp - sub:6.3f}s gap={gap:6.3f}s "
            f"tasks={j['numTasks']:4d} {desc}"
        )
        for sid in sorted(j.get("stageIds", [])):
            st = stages_by_id.get((sid, 0))
            if st is None or st["status"] == "SKIPPED":
                continue
            sdur = None
            if st.get("firstTaskLaunchedTime") and st.get("completionTime"):
                sdur = ts(st["completionTime"]) - ts(
                    st["firstTaskLaunchedTime"]
                )
            print(
                f"    stage {sid:4d} {st['status']:9s} "
                f"tasks={st['numCompleteTasks']:4d} "
                f"dur={sdur if sdur is not None else -1:6.3f}s "
                f"runTime={st['executorRunTime'] / 1e3:6.3f}s "
                f"cpuTime={st.get('executorCpuTime', 0) / 1e9:6.3f}s "
                f"deserTime={st.get('executorDeserializeTime', 0) / 1e3:6.3f}s "
                f"shufR={st['shuffleReadBytes'] / 1e6:7.2f}MB "
                f"shufW={st['shuffleWriteBytes'] / 1e6:7.2f}MB "
                f"in={st['inputBytes'] / 1e6:7.2f}MB "
                f"{st['name'][:48]}"
            )
        prev_end = comp
    spark.stop()


if __name__ == "__main__":
    main()
