"""Shared pytest fixtures: one local SparkSession per test run."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(app_name="ebw_tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """Bare DuckDB connection; tests register the views they need via
    :func:`register_duck_views` (mirroring the driver's oracle harness)."""
    import duckdb

    return duckdb.connect()


def register_duck_views(con, sf_dir: str) -> None:
    tables = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
