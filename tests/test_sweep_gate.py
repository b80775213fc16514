"""The sweep regression gate: SWEEP_BUDGET.json must cover the registry
and check_budget must catch the measured 8-10x regression class
(lambda-scope retokenize, all-pairs fallback) automatically."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_sweep


def _budget() -> dict[str, float]:
    with open(bench_sweep.BUDGET_FILE) as f:
        return json.load(f)["budget_sec"]


def test_budget_covers_registry():
    from mapreduce_4_spark.plans import REGISTRY

    missing = set(REGISTRY) - set(_budget())
    assert not missing, (
        f"queries without a sweep budget: {sorted(missing)} — regenerate "
        "SWEEP_BUDGET.json from the latest sweep"
    )


def test_gate_catches_regression_class():
    budget = _budget()
    name = next(iter(budget))
    # a deliberate 8x blowup on any budgeted query must breach
    breaches = bench_sweep.check_budget({name: budget[name] * 8})
    assert breaches and name in breaches[0]


def test_gate_passes_within_budget_and_warns_on_new():
    budget = _budget()
    name = next(iter(budget))
    ok = {name: budget[name] * 0.5, "brand_new_query_xyz": 99.0}
    # new queries warn (stderr) but never fail the gate
    assert bench_sweep.check_budget(ok) == []


def test_bench_stdout_summary_survives_driver_tail_capture():
    """The driver records only a ~2 KB stdout tail; BENCH_r09/r10 both
    came back parsed:null because one giant line (raw_runs included)
    overflowed it. Contract (round-10 ask #2): the summary record —
    the LAST stdout line — must be self-contained, raw_runs-free, and
    compact enough to survive the tail capture even with a large ab_*
    arm population; the full record carries everything."""
    import json

    import bench

    # a worst-case round: every headline + calib + 40 ab_* arms, all
    # with long names and retry entries
    timings = {n: 1.234 for n in bench.HEADLINE}
    timings.update({bench.CALIB: 0.274, "calib_scan_lineitem": 0.301})
    timings.update({f"ab_some_experiment_arm_with_long_name_{i:02d}": 12.345
                    for i in range(40)})
    raw = {n: [round(v + 0.1 * k, 3) for k in range(3)]
           for n, v in timings.items()}
    raw[bench.HEADLINE[0] + ":retry"] = [1.0, 1.1, 1.2]
    first_pass = {bench.HEADLINE[0]: 9.999}

    full, summary = bench.build_records(timings, first_pass, "0.1", raw)

    line = json.dumps(summary, separators=(",", ":"))
    assert len(line) < 1900, f"summary line {len(line)}B outgrows the tail"
    assert "raw_runs" not in summary
    assert set(summary["queries"]) == set(
        bench.HEADLINE + [bench.CALIB, "calib_scan_lineitem"])
    assert set(summary["normalized"]) == set(bench.HEADLINE)
    assert summary["value"] == round(1.234 * len(bench.HEADLINE), 3)
    assert summary["calib_sec"] == 0.274
    assert summary["first_pass"] == first_pass
    # the full record keeps every arm and the raws
    assert set(full["queries"]) == set(timings)
    assert full["raw_runs"] is raw
    # both lines parse back as JSON
    assert json.loads(line)["sf"] == 0.1
    assert json.loads(json.dumps(full, separators=(",", ":")))
