"""SCD2 merge operator properties beyond the oracle-checked plan:
no-op behavior, null-safe change detection, and merge idempotence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mapreduce_4_spark.operators.maintenance import scd2_merge

T0 = dt.datetime(1995, 1, 1)
T1 = dt.datetime(2000, 6, 15)
T2 = dt.datetime(2001, 1, 1)

DIM_SCHEMA = "k long, seg string, valid_from timestamp_ntz, valid_to timestamp_ntz, is_current boolean"
CHG_SCHEMA = "k long, seg string, change_ts timestamp_ntz"


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _chg(spark, rows):
    return spark.createDataFrame(rows, CHG_SCHEMA)


def _merge(dim, chg):
    return scd2_merge(dim, chg, key="k", tracked=["seg"])


def test_empty_changes_is_identity(spark):
    dim = _dim(spark, [(1, "A", T0, None, True), (1, "Z", T0, T1, False)])
    out = _merge(dim, _chg(spark, []))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, dim.collect()))


def test_same_value_change_does_not_close(spark):
    dim = _dim(spark, [(1, "A", T0, None, True)])
    out = _merge(dim, _chg(spark, [(1, "A", T1)]))
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["is_current"] and rows[0]["valid_to"] is None


def test_null_to_value_counts_as_change(spark):
    dim = _dim(spark, [(1, None, T0, None, True)])
    out = _merge(dim, _chg(spark, [(1, "A", T1)]))
    by_cur = {r["is_current"]: r for r in out.collect()}
    assert by_cur[False]["valid_to"] == T1
    assert by_cur[True]["seg"] == "A" and by_cur[True]["valid_from"] == T1


def test_change_closes_and_reopens_history_untouched(spark):
    dim = _dim(spark, [
        (1, "B", T0, None, True),
        (1, "A", dt.datetime(1990, 1, 1), T0, False),
        (2, "C", T0, None, True),
    ])
    out = _merge(dim, _chg(spark, [(1, "D", T1), (3, "E", T1)]))
    rows = sorted(map(tuple, out.collect()))
    assert rows == sorted([
        (1, "A", dt.datetime(1990, 1, 1), T0, False),  # history untouched
        (1, "B", T0, T1, False),                       # closed
        (1, "D", T1, None, True),                      # reopened
        (2, "C", T0, None, True),                      # untouched current
        (3, "E", T1, None, True),                      # inserted
    ])


def test_replaying_applied_changes_is_noop(spark):
    dim = _dim(spark, [(1, "A", T0, None, True), (2, "B", T0, None, True)])
    chg = _chg(spark, [(1, "X", T1), (3, "Y", T1)])
    once = _merge(dim, chg)
    # the same change set again: every tracked value now already matches,
    # so nothing closes and nothing inserts (exactly-once replay safety)
    twice = _merge(once, _chg(spark, [(1, "X", T2), (3, "Y", T2)]))
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))
