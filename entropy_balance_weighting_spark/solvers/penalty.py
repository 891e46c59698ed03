"""Quadratic-penalty solver (SURVEY §3.3) — lands in M3."""

from __future__ import annotations


def solve_penalty(*args, **kwargs):
    raise NotImplementedError("penalty mode lands in M3")
