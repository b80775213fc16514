"""Property-based fuzzing (hypothesis) of the mr4ver front door's
pruning surfaces: for ARBITRARY where/probe bounds and column
projections, planning-time pruning (manifest stats windows, hive
partition values) plus the Arrow residual must equal a plain
filter over the full table — pruning may only skip work, never
change results.

The fuzz runs at the READER level (partitions() + read() are pure
Python/pyarrow — no Spark job per example), so hypothesis gets real
example counts; the end-to-end Spark path of the same options is
pinned by tests/test_pyds_versioned.py.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_4_spark.sources.pyds import Mr4VersionedReader
from mapreduce_4_spark.sources.versioned import (
    _scan_schema,
    latest_version,
    read_manifest,
    write_version,
)

N_ROWS = 200
N_PART = 5


@pytest.fixture(scope="module")
def chain(spark, tmp_path_factory):
    """One hive-partitioned, stats-carrying 2-append chain; returns
    (table_dir, manifest, schema, rows) with rows the full expected
    table as python tuples (k, p, s)."""
    tdir = str(tmp_path_factory.mktemp("fuzz") / "t")
    df = spark.range(N_ROWS).select(
        F.col("id").alias("k"),
        (F.col("id") % N_PART).cast("int").alias("p"),
        F.md5(F.col("id").cast("string")).alias("s"),
    )
    write_version(df.filter(f"k < {N_ROWS // 2}"), tdir, append=True,
                  partition_by=["p"], stats_for=["k"])
    write_version(df.filter(f"k >= {N_ROWS // 2}"), tdir, append=True,
                  partition_by=["p"], stats_for=["k"])
    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    rows = sorted(tuple(r) for r in df.collect())
    return tdir, m, schema, rows


def _reader_rows(reader) -> list[tuple]:
    out = []
    for part in reader.partitions():
        batches = list(reader.read(part))
        if batches:
            t = pa.Table.from_batches(batches)
            out.extend(zip(*(t.column(n).to_pylist()
                             for n in t.column_names)))
    return sorted(out)


_bound = st.integers(min_value=-5, max_value=N_ROWS + 5)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(
    k_lo=_bound, k_hi=_bound,
    p_eq=st.integers(min_value=-1, max_value=N_PART),
    probe_ks=st.lists(_bound, min_size=0, max_size=4),
    project=st.sampled_from([None, "k,s", "k", "s,p"]),
)
def test_pruned_read_equals_plain_filter(chain, k_lo, k_hi, p_eq,
                                         probe_ks, project):
    tdir, m, schema, rows = chain
    opts = {"where": f"k:{k_lo}:{k_hi};p:{p_eq}:{p_eq}"}
    expected = [r for r in rows
                if k_lo <= r[0] <= k_hi and r[1] == p_eq]
    if probe_ks:
        opts["probe"] = "k:" + ",".join(str(v) for v in probe_ks)
        expected = [r for r in expected if r[0] in set(probe_ks)]
    cols = None
    if project:
        cols = project.split(",")
        opts["columns"] = project
        idx = {"k": 0, "p": 1, "s": 2}
        expected = [tuple(r[idx[c]] for c in cols) for r in expected]
        from pyspark.sql.types import StructType

        fields = {f.name: f for f in schema.fields}
        schema = StructType([fields[c] for c in cols])
    reader = Mr4VersionedReader(tdir, m, schema, opts)
    assert _reader_rows(reader) == sorted(expected)


# --- decimal bounds (r13 verdict ask #8) ------------------------------
#
# The r13 advice fix parses where/probe bounds on DECIMAL columns as
# decimal.Decimal and casts them to the column's Arrow type; this arm
# fuzzes that grammar — arbitrary two-dp bounds against a stats-carrying
# chain must equal the plain Decimal filter, pruning or no pruning.

import decimal  # noqa: E402

N_DEC = 120


N_DEC_PART = 4


@pytest.fixture(scope="module")
def dec_chain(spark, tmp_path_factory):
    """(table_dir, manifest, schema, rows): a 2-append chain
    hive-partitioned on a decimal(6,2) column (path values like
    dp=0.25 — the string-parsed-vs-Decimal comparison surface the r13
    advice fix hardened) with a decimal(12,2) payload column for
    where/probe bounds. Decimal columns have no order-preserving JSON
    stats form, so dir-level pruning rides the hive values here."""
    tdir = str(tmp_path_factory.mktemp("fuzz_dec") / "t")
    df = spark.range(N_DEC).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7 + 13) / 100).cast("decimal(12,2)").alias("d"),
        ((F.col("id") % N_DEC_PART) / 4).cast("decimal(6,2)").alias("dp"),
    )
    write_version(df.filter(f"k < {N_DEC // 2}"), tdir, append=True,
                  partition_by=["dp"])
    write_version(df.filter(f"k >= {N_DEC // 2}"), tdir, append=True,
                  partition_by=["dp"])
    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    rows = sorted(tuple(r) for r in df.collect())
    return tdir, m, schema, rows


_dec_cents = st.integers(min_value=-50, max_value=(N_DEC * 7 + 13) + 50)


def _cents(c: int) -> decimal.Decimal:
    return decimal.Decimal(c) / 100


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(
    lo_c=_dec_cents, hi_c=_dec_cents,
    dp_q=st.integers(min_value=-1, max_value=N_DEC_PART),
    probe_cs=st.lists(_dec_cents, min_size=0, max_size=4),
)
def test_decimal_pruned_read_equals_plain_filter(dec_chain, lo_c, hi_c,
                                                 dp_q, probe_cs):
    tdir, m, schema, rows = dec_chain
    lo, hi = _cents(lo_c), _cents(hi_c)
    dp = decimal.Decimal(dp_q) / 4  # hits and misses the 4 hive values
    opts = {"where": f"d:{lo}:{hi};dp:{dp}:{dp}"}
    expected = [r for r in rows if lo <= r[1] <= hi and r[2] == dp]
    if probe_cs:
        probe_vals = {_cents(c) for c in probe_cs}
        opts["probe"] = "d:" + ",".join(str(_cents(c)) for c in probe_cs)
        expected = [r for r in expected if r[1] in probe_vals]
    reader = Mr4VersionedReader(tdir, m, schema, opts)
    assert _reader_rows(reader) == sorted(expected)

    # planning-time evidence: a decimal hive value OUTSIDE the
    # partition domain plans zero real partitions (subtree-pruned)
    if dp_q < 0 or dp_q >= N_DEC_PART:
        parts = reader.partitions()
        assert [p for p in parts if getattr(p, "path", None)] == []
