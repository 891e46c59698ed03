"""Dump explain('formatted') for named queries to plans/<outdir>/<q>_<tag>.txt.

Usage: python spikes/dump_plans.py <repo_root> <out_dir> <tag> q1 q2 ...

``repo_root`` lets the same script dump BEFORE plans from an extracted
historical tree (git archive) and AFTER plans from the working tree —
same Spark session config, same SF.
"""

from __future__ import annotations

import sys
from pathlib import Path

repo_root, out_dir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, repo_root)

from entropy_balance_weighting_spark.queries import QUERIES  # noqa: E402
from entropy_balance_weighting_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

spark = get_spark(app_name=f"dump_plans_{tag}")
Path(out_dir).mkdir(parents=True, exist_ok=True)
for name in names:
    df = QUERIES[name].fn(spark, SF_DIR)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    p = Path(out_dir) / f"{name}_{tag}.txt"
    p.write_text(txt)
    print(f"wrote {p} ({len(txt)} bytes)")
spark.stop()
