"""Sources & sinks: problem-bundle serialization (SURVEY §2.1 S2/S3),
storage layout (partitioned/bucketed parquet), and deterministic
train/val/test split writing with an audit manifest."""

from entropy_balance_weighting_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)
from entropy_balance_weighting_spark.sources.splits import (
    split_column,
    write_splits,
)

__all__ = [
    "split_column",
    "write_bucketed",
    "write_partitioned",
    "write_splits",
]
