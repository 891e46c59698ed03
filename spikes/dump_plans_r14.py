"""Dump before/after explain("formatted") plans for r14-touched queries.

"before" = spark.ebw.spreadPartitionBytes=0 (the r13 full-width spread);
"after" = the default size-derived width.  Usage:

    python spikes/dump_plans_r14.py [names...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TOUCHED = [
    "m1_problem_table_stats",
    "m1_interaction_moments",
    "m1_group_block_moments",
    "m1_feasible_targets",
    "a2_broadcast_matvec",
    "a3_gram_selfjoin",
    "ebw_solver_moment_match",
    "ebw_bounded_solver_match",
    "ebw_penalty_gap_reduction",
    "txt_domain_reweight",
]


def main() -> None:
    names = sys.argv[1:] or TOUCHED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from entropy_balance_weighting_spark.queries import QUERIES
    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r14")
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    for tag, conf in (("before", "0"), ("after", None)):
        if conf is None:
            spark.conf.unset("spark.ebw.spreadPartitionBytes")
        else:
            spark.conf.set("spark.ebw.spreadPartitionBytes", conf)
        for name in names:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out_dir / f"{name}_{tag}.txt").write_text(plan)
            print(f"{name}_{tag}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
