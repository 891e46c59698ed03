"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`entropy_balance_weighting_spark.queries` — the engine's
SQL-checkable query registry.  Each registered query is the rendering of one
operator from SURVEY.md §2 with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from entropy_balance_weighting_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §2 A1: weighted moment totals) on sf0.001."""
    return _q.QUERIES["a1_weighted_moment_totals"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return _q.oracle_map()
