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
