"""Elastic/bounded interior-point solver (SURVEY §3.2) — lands in M4."""

from __future__ import annotations


def entropy_balance_elastic(**kwargs):
    raise NotImplementedError("bounded/elastic mode lands in M4")
