"""Parquet problem bundles (S2/S3) — lands in M5."""

from __future__ import annotations


def dump_problem(path, x_sample, weights0, moments):
    raise NotImplementedError("problem bundles land in M5")


def load_problem(spark, path):
    raise NotImplementedError("problem bundles land in M5")
