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
    timings.update({bench.CALIB: 0.274, "calib_scan_lineitem": 0.301,
                    "calib_fact_scaleup": 0.412})
    timings.update({f"ab_some_experiment_arm_with_long_name_{i:02d}": 12.345
                    for i in range(40)})
    raw = {n: [round(v + 0.1 * k, 3) for k in range(3)]
           for n, v in timings.items()}
    raw[bench.HEADLINE[0] + ":retry"] = [1.0, 1.1, 1.2]
    first_pass = {bench.HEADLINE[0]: 9.999}

    host = bench.host_telemetry(bench.host_snapshot(),
                                bench.host_snapshot(),
                                [0.31, 0.274, 0.29, 0.3, 0.28])
    engine = {"master": "local[32]", "default_parallelism": 32,
              "shuffle_partitions": 32}
    full, summary = bench.build_records(timings, first_pass, "0.1", raw,
                                        host=host, engine=engine)

    line = json.dumps(summary, separators=(",", ":"))
    assert len(line) < 1900, f"summary line {len(line)}B outgrows the tail"
    # r13 ask #1: the artifact carries its own host evidence — the
    # contention fields and the calibration arm's scatter — so a
    # driver-vs-builder normalized delta is explained by data
    assert summary["host"]["calib_scatter"] == [0.274, 0.29, 0.31]
    assert summary["host"]["ncpu"] == bench.os.cpu_count()
    assert "load_start" in summary["host"]
    assert "span_sec" in summary["host"]
    assert summary["fast_extra"] == bench.FAST_EXTRA_RUNS
    assert "raw_runs" not in summary
    assert set(summary["queries"]) == set(
        bench.HEADLINE + [bench.CALIB, "calib_scan_lineitem",
                          "calib_fact_scaleup"])
    # round-15: the artifact is self-describing about its execution
    # shape — a local[8] run must not masquerade as a 32-core one
    assert summary["engine"] == engine
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


def test_bench_fast_queries_get_extra_runs():
    """r13 verdict ask #1 (timing de-noise): a headline arm whose min
    is under FAST_FLOOR_SEC collects N_RUNS + FAST_EXTRA_RUNS samples
    (min-of-5 by default); a slow arm stays at N_RUNS; arms that don't
    opt in (ab_*) are untouched. Per-run loadavg rides _LOAD1."""
    import bench

    class _FakeWrite:
        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self):
            pass

    class _FakeDF:
        write = _FakeWrite()

    timings = {}
    bench._RAW.clear()
    bench._LOAD1.clear()
    try:
        # sub-second (~0s fake): opts in -> N_RUNS + extra samples
        bench._timed(timings, "fast_arm", _FakeDF(),
                     fast_extra=bench.FAST_EXTRA_RUNS)
        assert len(bench._RAW["fast_arm"]) == \
            bench.N_RUNS + bench.FAST_EXTRA_RUNS
        assert len(bench._LOAD1["fast_arm"]) == \
            len(bench._RAW["fast_arm"])
        # no opt-in (the ab_* path): plain min-of-N
        bench._timed(timings, "ab_arm", _FakeDF())
        assert len(bench._RAW["ab_arm"]) == bench.N_RUNS
        # a slow arm (floor forced below any sample): no extra runs
        prev = bench.FAST_FLOOR_SEC
        bench.FAST_FLOOR_SEC = -1.0
        try:
            bench._timed(timings, "slow_arm", _FakeDF(),
                         fast_extra=bench.FAST_EXTRA_RUNS)
        finally:
            bench.FAST_FLOOR_SEC = prev
        assert len(bench._RAW["slow_arm"]) == bench.N_RUNS
        # _timed_fn (driver-callable arms) keeps the same invariant —
        # load1_runs must stay keyed like raw_runs across BOTH timers
        bench._timed_fn(timings, "fn_arm", lambda: None)
        assert set(bench._LOAD1) == set(bench._RAW)
    finally:
        bench._RAW.clear()
        bench._LOAD1.clear()
