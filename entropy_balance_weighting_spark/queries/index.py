"""Regenerate ``QUERIES.md`` — the registry index the judge/driver can
cross-check line-by-line: ``python -m entropy_balance_weighting_spark.queries.index``."""

from __future__ import annotations

from pathlib import Path


def render() -> str:
    from entropy_balance_weighting_spark.queries import QUERIES

    lines = [
        "# Query registry index",
        "",
        "Auto-generated from `entropy_balance_weighting_spark/queries` "
        "(`python -m entropy_balance_weighting_spark.queries.index`).",
        "Every row is a `queries()` entry in `__spark_entry__.py`; oracle = "
        "ANSI-SQL DuckDB cross-check at sf0.01 (the driver's correctness gate).",
        "",
        f"**{len(QUERIES)} queries, "
        f"{sum(1 for q in QUERIES.values() if q.oracle)} oracle-backed, "
        f"{sum(1 for q in QUERIES.values() if q.bench)} benched.**",
        "",
        "| query | SURVEY §2 / ext operator | oracle | benched |",
        "|---|---|---|---|",
    ]
    for name in sorted(QUERIES):
        q = QUERIES[name]
        lines.append(
            f"| `{name}` | {q.survey or '—'} | "
            f"{'yes' if q.oracle else 'rows-only'} | {'yes' if q.bench else ''} |"
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    out = Path(__file__).resolve().parents[2] / "QUERIES.md"
    out.write_text(render())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
