"""Per-job timeline of one solver end-to-end run (optimization r13).

Runs one solve with the UI enabled, then dumps every Spark job's
description, duration, and the driver-side gap since the previous job
completed — the gaps are pack/driver linalg/Python overhead that no
stage metric shows.

Usage: python spikes/profile_solver.py [bounded|distributed|grouped|bounded_grouped|localpath]
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
        f"http://localhost:{port}/api/v1/applications/{app_id}/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def ts(s):
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "bounded"
    from entropy_balance_weighting_spark.queries.solver import solve_lineitem_problem
    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(app_name="ebw_profile_solver",
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1])
    app_id = sc.applicationId

    kwargs = {
        "bounded": dict(force_distributed=True, bounds=(0.2, 5.0)),
        "distributed": dict(force_distributed=True),
        "localpath": dict(local_threshold=10**10),
    }[which] if which in ("bounded", "distributed", "localpath") else None

    def run():
        if kwargs is not None:
            _, _, r = solve_lineitem_problem(spark, SF_DIR, **kwargs)
            if r.converged:
                r.new_weights.count()
            return r
        # grouped variants
        from entropy_balance_weighting_spark import entropy_balance
        from entropy_balance_weighting_spark.plans import (
            MomentSpec, build_problem_tables, targets_from_problem,
        )
        from entropy_balance_weighting_spark.session import load_table

        li = load_table(spark, SF_DIR, "lineitem")
        spec = MomentSpec(weight_col="l_quantity",
                          numeric=("l_discount", "l_tax"), group=("l_suppkey",))
        pt = build_problem_tables(li, spec)
        opts = {"force_distributed": True}
        if which == "bounded_grouped":
            opts["bounds"] = (0.2, 5.0)
        res = entropy_balance(
            mean_population_moments=targets_from_problem(pt, perturb=0.01),
            x_sample=pt, options=opts,
        )
        if res.converged:
            res.new_weights.count()
        return res

    run()  # warmup (codegen, page cache, JVM)
    jobs_before = {j["jobId"] for j in rest(port, app_id, "jobs")}
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0

    jobs = sorted(
        (j for j in rest(port, app_id, "jobs") if j["jobId"] not in jobs_before),
        key=lambda j: j["jobId"],
    )
    print(f"=== {which}: wall {wall:.3f}s, {len(jobs)} jobs ===")
    prev_end = None
    total_job = total_gap = 0.0
    for j in jobs:
        sub, comp = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = sub - prev_end if prev_end else 0.0
        dur = comp - sub
        total_job += dur
        total_gap += max(gap, 0)
        desc = (j.get("description") or j["name"])[:70]
        print(f"job {j['jobId']:4d} dur={dur:6.3f}s gap={gap:6.3f}s "
              f"tasks={j['numTasks']:4d} {desc}")
        prev_end = comp
    print(f"sum(job dur)={total_job:.3f}s sum(gaps)={total_gap:.3f}s wall={wall:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
