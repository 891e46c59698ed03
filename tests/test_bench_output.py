"""Pin bench.py's driver-parseable output contract.

Round 7's best-ever headline (54.4 s) was recorded as ``"parsed": null``
because the single fat JSON line outgrew the driver's ~2000-char stdout
tail capture (r7 verdict item #1).  The fix: bench.py now emits the fat
diagnostics line first, then a SHORT final line.  These tests pin that
the final line stays under budget for any realistic (and unrealistic)
query-map size, and that it still carries the headline fields.
"""

import json

import bench


def _diag(n_queries: int) -> dict:
    return {
        "metric": "headline_queries_diagnostics",
        "value": 54.4,
        "unit": "sec",
        "n_wall_entries": n_queries,
        "repeats_per_query": 2,
        "timing": "best_of_repeats_after_warmup",
        "loadavg_at_launch": [1.08, 2.3, 3.4],
        "loadavg_start": [1.08, 2.3, 3.4],
        "loadavg_end": [25.1, 14.2, 8.9],
        "n_cpus": 32,
        "contaminated": False,
        "load_gate": 2.0,
        "duck_proxy_sec": 2.79,
        "duck_proxy_n_queries": 23,
        "duck_proxy": {
            f"some_quite_long_query_name_{i:03d}": round(0.01 * i, 4)
            for i in range(n_queries)
        },
        "spark_same_queries_sec": 15.87,
        "gate_ratio_compute_bound": 0.79,
        "gate_compute_bound_entries": {"m1_problem_table_stats": 2.98},
        "queries": {
            f"some_quite_long_query_name_{i:03d}": round(0.123 * (i + 1), 4)
            for i in range(n_queries)
        },
        "sf": 0.1,
    }


def test_final_line_under_budget_even_with_200_queries():
    # 200 long-named queries is ~4x the current bench set — the final
    # line must stay under the 1 KB budget regardless.
    for n in (0, 1, 23, 60, 200):
        lines = bench.render_output_lines(_diag(n))
        assert len(lines) == 2
        final = lines[-1]
        assert len(final) <= bench.FINAL_LINE_BUDGET, (n, len(final))
        parsed = json.loads(final)
        assert parsed["metric"] == "headline_queries_total_wall"
        assert parsed["value"] == 54.4
        assert parsed["unit"] == "sec"
        assert parsed["sf"] == 0.1
        assert parsed["contaminated"] is False
        assert parsed["loadavg_start"] == [1.08, 2.3, 3.4]
        assert parsed["loadavg_end"] == [25.1, 14.2, 8.9]
        # the one-field honest baseline comparison rides the final line
        assert parsed["gate_ratio_compute_bound"] == 0.79


def test_compute_bound_ratio_filters_sub_second_entries():
    wall = {"fast": 0.6, "slow": 2.4, "other": 1.0}
    duck = {"fast": 0.05, "slow": 3.0, "missing_in_wall": 5.0}
    ratio, entries = bench._compute_bound_ratio(wall, duck)
    assert entries == {"slow": 3.0}
    assert ratio == 0.8
    assert bench._compute_bound_ratio({}, {}) == (-1.0, {})
    # nothing over 1 s → sentinel
    assert bench._compute_bound_ratio(wall, {"fast": 0.05}) == (-1.0, {})


def test_final_line_keeps_most_expensive_queries_when_truncating():
    lines = bench.render_output_lines(_diag(200))
    parsed = json.loads(lines[-1])
    assert parsed["queries_truncated"] is True
    # biggest-first fill: the single most expensive query must survive
    assert "some_quite_long_query_name_199" in parsed["queries"]


def test_small_query_map_not_truncated():
    lines = bench.render_output_lines(_diag(5))
    parsed = json.loads(lines[-1])
    assert parsed["queries_truncated"] is False
    assert len(parsed["queries"]) == 5


def test_fat_line_is_complete_diagnostics():
    diag = _diag(23)
    lines = bench.render_output_lines(diag)
    assert json.loads(lines[0]) == diag


def test_meta_and_cold_entries_stay_off_the_short_line():
    """_iterations/_converged/_k metadata and the r10 *_cold first-run
    diagnostics are not steady-state wall-clock: the short line must
    spend its budget on real timings only (the fat line keeps them)."""
    diag = _diag(5)
    diag["queries"].update(
        {
            "ebw_solve_distributed": 6.5,
            "ebw_solve_distributed_cold": 12.1,
            "ebw_solve_iterations": 4.0,
            "ebw_solve_converged": 1.0,
            "ebw_solve_grouped_k": 2000.0,
        }
    )
    parsed = json.loads(bench.render_output_lines(diag)[-1])
    assert "ebw_solve_distributed" in parsed["queries"]
    for banned in (
        "ebw_solve_distributed_cold",
        "ebw_solve_iterations",
        "ebw_solve_converged",
        "ebw_solve_grouped_k",
    ):
        assert banned not in parsed["queries"]
