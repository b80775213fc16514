#!/usr/bin/env python
"""Batch-CDF data-path probe (SCALE.md round 14): measure the Arrow
fast path for one-sided change versions against the keyed tuple diff
it replaced, plus the end-to-end front-door read.

The table is ONE append version of N rows built from sf0.1 lineitem
(4 columns, a synthetic unique key) — the pure-insert shape that
dominates real change feeds (append versions + the initial load). A
pure append's delta plan proves the old side empty from manifest
arithmetic alone, so `_CdcDiffer.arrow_batches_for_version` re-shapes
the conformed Arrow tables columnar (zero per-row Python), where
`changes_for_version` pays to_pylist + per-row tuples.

Usage:
    python scripts/cdc_arrow_probe.py [--rows 600000] [--runs 3]

Output: one JSON line {"rows": N, "arrow_sec": a, "tuple_sec": t,
"speedup": t/a, "end_to_end_sec": e}. The round-14 reading on this
sandbox: 600k rows -> arrow 0.16 s vs tuple 1.55 s (9.7x),
front-door count 0.95 s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=600_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import to_arrow_schema

    from mapreduce_4_spark.session import get_spark
    from mapreduce_4_spark.sources.pyds import (
        _cdc_schema,
        _CdcDiffer,
        register_versioned_source,
    )
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
        write_version,
    )

    spark = get_spark("cdc_arrow_probe")
    li = (spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
          .limit(args.rows)
          .select(F.monotonically_increasing_id().alias("k"),
                  "l_orderkey", "l_quantity", "l_extendedprice"))
    td = tempfile.mkdtemp(prefix="cdc_arrow_probe_")
    tdir = f"{td}/chain"
    write_version(li.coalesce(1), tdir, append=True)
    m = read_manifest(tdir, latest_version(tdir))
    differ = _CdcDiffer(tdir, m, "k")
    arrow = to_arrow_schema(_cdc_schema(m, "k", "pairs"))

    def timed(fn):
        fn()  # warm
        best = min(
            (lambda t0=time.perf_counter(): (fn(), time.perf_counter() - t0)[1])()
            for _ in range(args.runs))
        return round(best, 3)

    n_arrow = sum(b.num_rows
                  for b in differ.arrow_batches_for_version(1, "pairs", arrow))
    n_tuple = sum(1 for _ in differ.changes_for_version(1))
    assert n_arrow == n_tuple == li.count()

    arrow_sec = timed(lambda: sum(
        b.num_rows for b in differ.arrow_batches_for_version(1, "pairs", arrow)))
    tuple_sec = timed(lambda: sum(1 for _ in differ.changes_for_version(1)))

    register_versioned_source(spark)
    feed = (spark.read.format("mr4ver")
            .option("readChangeFeed", "true").option("key", "k"))
    e2e_sec = timed(lambda: feed.load(tdir).count())

    print(json.dumps({
        "rows": n_arrow,
        "arrow_sec": arrow_sec,
        "tuple_sec": tuple_sec,
        "speedup": round(tuple_sec / arrow_sec, 2),
        "end_to_end_sec": e2e_sec,
    }))


if __name__ == "__main__":
    main()
