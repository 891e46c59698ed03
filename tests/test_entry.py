"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"moment", "n", "wmean"}


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 1
    # every oracle key must have a query
    assert set(oracles).issubset(set(qs))


def test_enumeration_priority_matches_registry():
    """Every registered query must appear in ENUMERATION_PRIORITY exactly
    once, and every priority entry must name a registered query.  A new
    query silently landing below the driver's ~50-slot window (or a typo'd
    name falling back to registration order) reintroduces the
    never-driver-checked class the round-5 verdict flagged."""
    from entropy_balance_weighting_spark.queries.registry import (
        ENUMERATION_PRIORITY,
        QUERIES,
    )

    assert sorted(ENUMERATION_PRIORITY) == sorted(QUERIES), (
        "ENUMERATION_PRIORITY and the query registry disagree; "
        "add/remove the query name in queries/registry.py"
    )
    assert len(ENUMERATION_PRIORITY) == len(set(ENUMERATION_PRIORITY))


def test_queries_md_index_is_current():
    """QUERIES.md must match the live registry (regenerate with
    `python -m entropy_balance_weighting_spark.queries.index`)."""
    from pathlib import Path

    from entropy_balance_weighting_spark.queries.index import render

    assert Path("/root/repo/QUERIES.md").read_text() == render()
