"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - platform without getloadavg
        return [-1.0, -1.0, -1.0]


START_LOADAVG = _loadavg()

# Loaded-box guard (round-6 verdict item #3): two consecutive driver
# benches recorded 2-11x inflated timings because the box was already
# under load when the bench started (r5 loadavg 4.2, r6 6.85 -> 19.8;
# solo idle reruns showed zero real regression both times).  If the 1-min
# loadavg exceeds the gate at start, wait for the box to drain; if it
# never does, stamp the JSON "contaminated" so no reader mistakes load
# for a plan regression.
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "2.0"))
# 5-min gate (r8 verdict watch item #2 + r9 observation: a decaying
# 32-core burst leaves the 1-min average low while the box is still
# draining — r9 measured two bench_scale configs reading 1.5-2× high
# with 1-min loadavg < 2 but 5-min > 4).  The gate matches that
# measured noise model: 4.0, the level at which contamination was
# actually observed (r10 verdict item #1 — the old 8.0 admitted the
# documented contamination regime).  The retry budget is deeper than
# the 1-min gate needs, because a 5-min average takes minutes to
# decay below 4 after a burst.
LOAD_GATE_5MIN = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE5", "4.0"))
LOAD_RETRIES = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_RETRIES", "12"))
LOAD_RETRY_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_RETRY_SEC", "60"))


def _wait_for_idle() -> tuple[bool, list[float]]:
    """Sleep-retry until the 1-min loadavg < LOAD_GATE AND the 5-min
    loadavg < LOAD_GATE_5MIN; returns (contaminated, loadavg at the
    moment the bench actually starts)."""
    load = _loadavg()
    for _ in range(LOAD_RETRIES):
        if load[0] < 0 or (
            load[0] <= LOAD_GATE and load[1] <= LOAD_GATE_5MIN
        ):
            return False, load
        print(
            f"bench: loadavg {load[0]}/{load[1]} > gate "
            f"{LOAD_GATE}/{LOAD_GATE_5MIN}; "
            f"waiting {LOAD_RETRY_SEC:.0f}s for the box to drain",
            file=sys.stderr,
        )
        time.sleep(LOAD_RETRY_SEC)
        load = _loadavg()
    return load[0] > LOAD_GATE or load[1] > LOAD_GATE_5MIN, load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf")) if "sf" in Path(sf_dir).name else 0.0

    contaminated, start_load = _wait_for_idle()

    from entropy_balance_weighting_spark.queries import QUERIES
    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(app_name="ebw_bench")

    # Warm the JVM/parquet footers once so timings measure the queries.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    bench_queries = {n: q for n, q in QUERIES.items() if q.bench}
    # SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the benched set — used for
    # the sf1 scaling point, where only the compute-bound entries (and
    # tables whose sf1 replication is distribution-faithful) run; the
    # full set remains the default so driver rounds are unaffected.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        unknown = keep - set(bench_queries)
        if unknown:
            print(f"bench: unknown SPARK_GRAFT_BENCH_ONLY entries {sorted(unknown)}",
                  file=sys.stderr)
        bench_queries = {n: q for n, q in bench_queries.items() if n in keep}

    # Steady-state discipline: run each query once at the smoke SF first so
    # whole-stage codegen compiles outside the timed region (the 64-dim
    # embedding folds alone cost seconds of one-time JIT), then time at the
    # target SF.  Standard warm-measurement practice; the warmup itself is
    # excluded from the reported numbers.
    warmup_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warmup_dir) and warmup_dir != sf_dir:
        for name, q in bench_queries.items():
            try:
                q.fn(spark, warmup_dir).count()
            except Exception as exc:
                # a query broken at warmup must surface, not silently report
                # a cold (or masked-failing) timed run
                print(f"warmup failed for {name}: {exc!r}", file=sys.stderr)

    # Best-of-2 per query: the first timed run can absorb one-time costs the
    # smoke-SF warmup cannot reach (target-SF parquet footers/page-cache,
    # codegen specializations for the larger splits); the min is the
    # steady-state number the query plan actually earns.
    for name, q in bench_queries.items():
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            if df.isStreaming:
                pass  # streaming plans can be neither persisted nor collected
            else:
                # persist so the row-count guard and the collect share one
                # execution of the plan instead of running it twice
                df.persist()
                try:
                    n_rows = df.count()
                    _ = df.collect() if n_rows < 1_000_000 else None
                finally:
                    df.unpersist()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    extra, solver_stamps = _solver_bench(spark, sf_dir)
    timings.update(extra)

    duck_proxy, duck_queries, duck_per_query = _duck_proxy(sf_dir, bench_queries)

    # metadata entries (iteration counts, K sizes, converged flags, and
    # the first-run _cold diagnostics) are reported per query but are not
    # part of the steady-state wall total — exclude from the total
    meta_suffixes = ("_iterations", "_converged", "_k", "_cold")
    wall = {k: v for k, v in timings.items() if not k.endswith(meta_suffixes)}
    total = round(sum(wall.values()), 4)
    gate_ratio_cb, gate_cb_entries = _compute_bound_ratio(wall, duck_per_query)
    diagnostics = {
        "metric": "headline_queries_diagnostics",
        "value": total,
        "unit": "sec",
        # the benched set GROWS round over round — cross-round
        # totals are only comparable per-entry (see PLANS.md §8
        # for measured ±2x machine variance on this box); the
        # loadavg fields make a loaded-box run machine-detectable
        # (loadavg ≫ n_cpus at start/end ⇒ timings are contended)
        "n_wall_entries": len(wall),
        "repeats_per_query": 2,
        # solver entries run 3× (bench_solver._best_of): headline = min,
        # first run reported as the *_cold diagnostic (r9 verdict #1)
        "solver_repeats": 3,
        "timing": "best_of_repeats_after_warmup",
        "loadavg_at_launch": START_LOADAVG,
        "loadavg_start": start_load,
        "loadavg_end": _loadavg(),
        # (1-min, 5-min) loadavg at each solver entry's start — outlier
        # attribution without a re-run (r10 verdict item #1)
        "loadavg_at_entry": solver_stamps,
        "n_cpus": os.cpu_count(),
        # True iff the box never drained below the load gate before
        # the timed region started — timings are contended and must
        # not be read as plan regressions (PLANS.md §8 variance).
        "contaminated": contaminated,
        "load_gate": LOAD_GATE,
        # DuckDB executing the oracle SQL of the oracle-benched
        # queries on the same parquet — the bench-vs-baseline proxy
        # the judge derives each round, self-reported (r5 item #8).
        # Spark's per-query job-launch overhead (~0.4-0.8 s)
        # dominates at sub-second DuckDB times; the ratio is only
        # meaningful on compute-bound entries.
        "duck_proxy_sec": duck_proxy,
        "duck_proxy_n_queries": duck_queries,
        # per-query DuckDB times so per-query Spark/DuckDB ratios
        # are machine-trackable round over round (r6 item #3)
        "duck_proxy": duck_per_query,
        "spark_same_queries_sec": round(
            sum(
                wall[n]
                for n in bench_queries
                if bench_queries[n].oracle is not None and n in wall
            ),
            4,
        ),
        # Spark/DuckDB ratio restricted to COMPUTE-BOUND entries (DuckDB
        # > 1 s), where Spark's fixed ~0.3-0.8 s job-launch overhead no
        # longer dominates — the honest baseline comparison as one field
        # instead of a per-round re-derivation from raw numbers (r11
        # verdict item #8).  -1.0 = no compute-bound entry at this SF.
        "gate_ratio_compute_bound": gate_ratio_cb,
        "gate_compute_bound_entries": gate_cb_entries,
        "queries": timings,
        "sf": sf,
    }
    for line in render_output_lines(diagnostics):
        print(line)
    spark.stop()


# The driver captures only the LAST ~2000 chars of stdout and parses the
# final JSON line.  Round 7's single fat line outgrew that budget and the
# best-ever headline was recorded as "parsed": null (r7 verdict item #1).
# Contract: emit the full diagnostics object first (for humans / solo
# re-runs), then a short final line under this budget that the driver can
# always parse.  `tests/test_bench_output.py` pins the budget.
#
# r14 (verdict item 3): 1000 was tight enough that the 32-entry wall map
# truncated to the top 20, and the driver's round-over-round comparator
# mislabeled the clipped entries "dropped_from_bench" (3 false alarms in
# PERF_r13).  The capture window is ~2000 chars; 1900 leaves headroom for
# the trailing newline while fitting every current entry (the 32-entry
# line measures ~1450 chars).  Truncation biggest-first remains as the
# guard for pathological registry growth.
FINAL_LINE_BUDGET = 1900


def render_output_lines(diagnostics: dict) -> list[str]:
    """Render bench stdout: one fat diagnostics line, then a short final
    headline line guaranteed to fit the driver's tail-capture budget.

    The final line always carries the headline fields (metric/value/unit/
    sf/loadavg/contaminated) plus as many per-query timings as fit,
    largest wall-clock first, so the most expensive entries stay
    driver-visible even when the full map does not fit.
    """
    fat_line = json.dumps(diagnostics)
    short = {
        "metric": "headline_queries_total_wall",
        "value": diagnostics["value"],
        "unit": "sec",
        "sf": diagnostics["sf"],
        "n_wall_entries": diagnostics["n_wall_entries"],
        "loadavg_start": diagnostics["loadavg_start"],
        "loadavg_end": diagnostics["loadavg_end"],
        "contaminated": diagnostics["contaminated"],
        "duck_proxy_sec": diagnostics["duck_proxy_sec"],
        "spark_same_queries_sec": diagnostics["spark_same_queries_sec"],
        "gate_ratio_compute_bound": diagnostics.get(
            "gate_ratio_compute_bound", -1.0
        ),
        "queries": {},
        "queries_truncated": False,
    }
    # Fill the queries map biggest-first until the budget would overflow.
    # Meta entries (_k/_iterations/_converged/_cold) are not steady-state
    # wall-clock; they stay on the fat line only so the short line spends
    # its budget on real timings.
    meta_suffixes = ("_iterations", "_converged", "_k", "_cold")
    by_cost = sorted(
        (
            kv
            for kv in diagnostics["queries"].items()
            if not kv[0].endswith(meta_suffixes)
        ),
        key=lambda kv: -abs(kv[1]),
    )
    for name, sec in by_cost:
        candidate = dict(short)
        candidate["queries"] = {**short["queries"], name: sec}
        if len(json.dumps(candidate)) > FINAL_LINE_BUDGET - 50:
            short["queries_truncated"] = True
            break
        short["queries"] = candidate["queries"]
    short_line = json.dumps(short)
    assert len(short_line) <= FINAL_LINE_BUDGET, len(short_line)
    return [fat_line, short_line]


def _compute_bound_ratio(
    wall: dict[str, float], duck_per_query: dict[str, float]
) -> tuple[float, dict[str, float]]:
    """Spark/DuckDB wall ratio over entries whose DuckDB oracle time
    exceeds 1 s — the regime where fixed Spark job-launch overhead is
    amortized and the ratio measures the PLAN, not the launch.  Returns
    (ratio, {entry: duck_sec}); ratio -1.0 when no entry qualifies."""
    qualifying = {
        n: d
        for n, d in duck_per_query.items()
        if d > 1.0 and n in wall
    }
    if not qualifying:
        return -1.0, {}
    spark_sec = sum(wall[n] for n in qualifying)
    duck_sec = sum(qualifying.values())
    return round(spark_sec / duck_sec, 3), {
        n: round(d, 3) for n, d in qualifying.items()
    }


def _duck_proxy(
    sf_dir: str, bench_queries
) -> tuple[float, int, dict[str, float]]:
    """Per-query + total DuckDB wall time over the oracle SQL of the
    oracle-benched queries (views over the same parquet), best-of-2 per
    query after one warmup — the same discipline as the Spark timings."""
    try:
        import duckdb
    except ImportError:  # pragma: no cover
        return -1.0, 0, {}
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark writes a DIRECTORY of part files; DuckDB needs a glob
            # (the driver's testdata are single files — this is for
            # engine-written SFs like the sf1 scaling point)
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}/*.parquet'"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    total, n, per_query = 0.0, 0, {}
    for name, q in bench_queries.items():
        if q.oracle is None:
            continue
        try:
            con.execute(q.oracle).fetchall()  # warmup (page cache, plan)
            best = float("inf")
            for _rep in range(2):
                t0 = time.perf_counter()
                con.execute(q.oracle).fetchall()
                best = min(best, time.perf_counter() - t0)
            total += best
            n += 1
            per_query[name] = round(best, 4)
        except Exception as exc:  # pragma: no cover
            print(f"duck proxy failed for {name}: {exc}", file=sys.stderr)
    return round(total, 4), n, per_query


def _solver_bench(spark, sf_dir: str) -> tuple[dict[str, float], dict]:
    """Solver end-to-end bench entries; populated as solvers land (M2+).
    Also returns per-entry (1-min, 5-min) loadavg stamps taken at the
    moment each solver entry STARTED, so any single outlier timing is
    attributable to host load post hoc (r10 verdict item #1)."""
    timings: dict[str, float] = {}
    stamps: dict = {}
    try:
        from entropy_balance_weighting_spark.bench_solver import run_solver_bench
    except ImportError:
        return timings, stamps
    try:
        timings.update(run_solver_bench(spark, sf_dir, stamps=stamps))
    except Exception as exc:  # pragma: no cover - bench must always print JSON
        print(f"solver bench failed: {exc}", file=sys.stderr)
    return timings, stamps


if __name__ == "__main__":
    main()
