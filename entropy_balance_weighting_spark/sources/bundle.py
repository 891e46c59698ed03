"""Problem-bundle sink/source (S2/S3) — the Spark-native rendering of the
reference's zip-of-npy problem serialization (ref: shared.py:136-154 dump,
shared.py:157-170 load, dump-on-failure call sites ebw_routines.py:312-319).

Layout — one parquet directory with three tables:

- ``<path>/x_long.parquet``   (row_id BIGINT, moment_id INT, value DOUBLE)
- ``<path>/w0.parquet``       (row_id BIGINT, w0 DOUBLE)
- ``<path>/moments.parquet``  (moment_id INT, moment_name STRING, target DOUBLE)

Parquet directories are partitioned, schema'd, and scan-parallel — a bundle
written from a 1000-executor job reloads with full parallelism, unlike the
reference's single-file zip.  Dense/sparse duality is implicit: the long
table only stores present entries; absent (row, moment) pairs are zero.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _is_problem_tables(x: Any) -> bool:
    from entropy_balance_weighting_spark.plans.moment_spec import ProblemTables

    return isinstance(x, ProblemTables)


def dump_problem(
    path: str,
    x_sample: Any,
    weights0: Any,
    mean_population_moments: np.ndarray,
    moment_names: list[str] | None = None,
) -> None:
    """Write a problem bundle.  ``x_sample`` may be a ProblemTables (written
    distributed via DataFrame sinks) or a dense numpy array (written locally
    via pyarrow — no session required, mirroring the reference's in-memory
    dump)."""
    m = np.asarray(mean_population_moments, dtype=np.float64).ravel()
    if _is_problem_tables(x_sample):
        pt = x_sample
        from pyspark.sql import functions as F

        spark = pt.w0.sparkSession
        pt.x_long.write.mode("overwrite").parquet(
            os.path.join(path, "x_long.parquet")
        )
        pt.w0.write.mode("overwrite").parquet(os.path.join(path, "w0.parquet"))
        tgt = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(m)], "moment_id int, target double"
        )
        pt.moments.join(F.broadcast(tgt), "moment_id").select(
            "moment_id", "moment_name", "target"
        ).write.mode("overwrite").parquet(os.path.join(path, "moments.parquet"))
        return

    import pyarrow as pa
    import pyarrow.parquet as pq

    x = np.asarray(x_sample, dtype=np.float64)
    w0 = np.asarray(weights0, dtype=np.float64).ravel()
    n, k = x.shape
    if moment_names is None:
        moment_names = [f"m{j}" for j in range(k)]
    rows, cols = np.nonzero(x)
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "row_id": rows.astype(np.int64),
                "moment_id": cols.astype(np.int32),
                "value": x[rows, cols],
            }
        ),
        os.path.join(path, "x_long.parquet"),
    )
    pq.write_table(
        pa.table({"row_id": np.arange(n, dtype=np.int64), "w0": w0}),
        os.path.join(path, "w0.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "moment_id": np.arange(k, dtype=np.int32),
                "moment_name": moment_names,
                "target": m,
            }
        ),
        os.path.join(path, "moments.parquet"),
    )


def load_problem(spark, path: str):
    """Read a bundle back → ``(ProblemTables, target_vector)``.

    The returned tables feed :func:`entropy_balance` directly; the target
    vector is id-ordered (K-dim, driver-scale)."""
    from entropy_balance_weighting_spark.plans.moment_spec import ProblemTables

    x_long = spark.read.parquet(os.path.join(path, "x_long.parquet"))
    w0 = spark.read.parquet(os.path.join(path, "w0.parquet"))
    moments = spark.read.parquet(os.path.join(path, "moments.parquet"))
    mrows = sorted(moments.collect(), key=lambda r: r["moment_id"])
    names = [r["moment_name"] for r in mrows]
    targets = np.array([r["target"] for r in mrows], dtype=np.float64)
    groups = [nm.split("|", 1)[0] if nm.startswith("grp=") else "" for nm in names]
    pt = ProblemTables(
        x_long=x_long,
        w0=w0,
        moments=moments.select("moment_id", "moment_name"),
        moment_names=names,
        moment_groups=groups,
    )
    return pt, targets
