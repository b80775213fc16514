"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All three functions delegate to the engine's query registry
(``mapreduce_4_spark.registry``), which every plan module populates on
import — see ``mapreduce_4_spark/plans/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_4_spark import plans as _plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"

#: name -> reason for every query WITHOUT an oracle_sql() entry — the
#: documented exceptions. A driver correctness row with `err: no_oracle`
#: for one of these names is the known weaker rows-only check, not a
#: regression; anything else erroring IS a regression.
ROWS_ONLY: dict[str, str] = _plans.rows_only()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _plans.REGISTRY["wordcount_per_doc"].builder(spark, SMOKE_SF_DIR)


def _coverage_rotation(names, correctness_dir: str | None = None,
                       rows_only: dict | None = None,
                       requires: dict | None = None) -> list[str]:
    """Order queries by ascending driver-GREEN-coverage count.

    The driver's correctness pass samples the FIRST 50 entries of
    ``queries()`` (verified against CORRECTNESS_r01..r06: every sample
    equals the registry's first 50 in dict order, plus nothing else).
    Dict order is therefore the rotation knob: sorting by how many past
    rounds have produced a GREEN row for a query (parsed from the repo's
    own CORRECTNESS_r*.json files) puts never-green queries first, so
    each round's sample automatically sweeps the least-confirmed 50
    until the whole registry has independent driver-side evidence.

    GREEN means rows+schema+hash all matched — a sampled-but-errored row
    counts zero, so a query fixed after a red sample regains priority
    and self-heals on the next round (round-9 verdict ask #1; the old
    sampled-row count left 4 locally-fixed queries driver-red forever).
    For declared rows-only queries (no oracle, see ``ROWS_ONLY``) the
    expected driver row is ``err: no_oracle`` with a row count — that IS
    its green. Deterministic: ties break by name; with no CORRECTNESS
    files present this is plain name order. Content is untouched — only
    ordering changes. ``correctness_dir``/``rows_only`` exist for the
    ordering unit test (tests/test_cli.py); production callers use the
    defaults (repo root, the registry's rows-only map).

    Shared-component discount (round-12 verdict ask #2): queries may
    declare ``requires=("mr4ver-read",)`` in the registry. When ANY
    query requiring a component is RED in the LATEST correctness round,
    every query requiring that component counts zero greens — the whole
    family re-enters the head-50 sample, so a regression in shared
    plumbing can never hide behind a sibling's stale green
    (versioned_datasource_orders broke after earning its green in r11
    and the rotation kept the break out of the r12 sample).
    """
    counts = _green_counts(correctness_dir, rows_only)
    if requires is None:
        requires = _plans.requires_map()
    tainted = _tainted_components(correctness_dir, rows_only, requires)
    return sorted(
        names,
        key=lambda n: (0 if set(requires.get(n, ())) & tainted
                       else counts.get(n, 0), n))


def _is_green(name: str, row: dict, rows_only: dict) -> bool:
    """The single definition of a GREEN driver correctness row, shared
    by the rotation's green counter and the red-component taint scan."""
    if name in rows_only:
        return (row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None)
    return bool(row.get("rows_match")) and bool(row.get("schema_match")) \
        and bool(row.get("hash_match"))


def _tainted_components(correctness_dir: str | None = None,
                        rows_only: dict | None = None,
                        requires: dict | None = None) -> set[str]:
    """Components (registry ``requires`` names) with a RED query in the
    LATEST CORRECTNESS_r*.json — only the newest round taints, so a
    family self-heals the round after its component goes green again."""
    import glob
    import json
    import os

    if correctness_dir is None:
        correctness_dir = os.path.dirname(os.path.abspath(__file__))
    if rows_only is None:
        rows_only = ROWS_ONLY
    if requires is None:
        requires = _plans.requires_map()
    paths = sorted(glob.glob(
        os.path.join(correctness_dir, "CORRECTNESS_r*.json")))
    if not paths:
        return set()
    try:
        with open(paths[-1]) as fh:
            rows = json.load(fh)
    except (OSError, ValueError):
        return set()
    tainted: set[str] = set()
    for name, row in rows.items():
        if not isinstance(row, dict) or name not in requires:
            continue
        if not _is_green(name, row, rows_only):
            tainted.update(requires[name])
    return tainted


def _green_counts(correctness_dir: str | None = None,
                  rows_only: dict | None = None) -> dict[str, int]:
    """Per-query count of GREEN driver rows across CORRECTNESS_r*.json.

    Shared by the rotation and the permanent invariant test
    (tests/test_cli.py): every registered name with zero greens must fit
    in the driver's head-50 sample, which caps how many brand-new
    queries a round may add.
    """
    import glob
    import json
    import os

    if correctness_dir is None:
        correctness_dir = os.path.dirname(os.path.abspath(__file__))
    if rows_only is None:
        rows_only = ROWS_ONLY
    counts: dict[str, int] = {}
    pattern = os.path.join(correctness_dir, "CORRECTNESS_r*.json")
    for path in sorted(glob.glob(pattern)):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if _is_green(name, row, rows_only):
                counts[name] = counts.get(name, 0) + 1
    return counts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query sample hits the least-driver-covered first."""
    qs = _plans.queries()
    return {name: qs[name] for name in _coverage_rotation(qs)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return _plans.oracle_sql()
