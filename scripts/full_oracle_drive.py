"""Drive the FULL query registry against the DuckDB oracle under a
DRIVER-EQUIVALENT session — round-12 verdict ask #4.

The per-round driver samples only the head-50 of ``queries()``, and the
repo's own pytest oracle gate runs under the tuned builder session
(``mapreduce_4_spark.session.get_spark`` sets engine confs the driver's
stock session does not — that mismatch is exactly how the r12 mr4ver
pushFilters regression stayed invisible locally while red in the
driver). This script closes both gaps: it builds a STOCK SparkSession
(``local[N]`` + nothing else — no filterPushdown conf, no shuffle
tuning, Spark defaults only, like the driver), runs every registered
query at sf0.01, compares each against its oracle with the same
canonicalization the driver uses, and writes one JSON artifact.

Usage:
    python scripts/full_oracle_drive.py [--sf-dir /root/testdata/sf0.01]
        [--out FULL_ORACLE_DRIVE_r13.json] [--only name1,name2]

Exit code 0 iff every oracled query MATCHes and every declared
rows-only query runs (rows >= 0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def stock_session(cpus: int):
    """The driver-shaped session: master + app name ONLY. No engine
    confs — if a query needs a conf, the query (or the code path it
    exercises) must set it itself, exactly like under the driver."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mr4s-full-oracle-drive")
        .getOrCreate()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from mapreduce_4_spark.plans import REGISTRY
    from oracle import _rows_canonical, duckdb_connection

    spark = stock_session(args.cpus)
    names = sorted(REGISTRY)
    if args.only:
        names = [n for n in args.only.split(",") if n]
        unknown = [n for n in names if n not in REGISTRY]
        if unknown:
            # a typo must not produce a vacuous 0-query green artifact
            print(f"unknown query names in --only: {unknown}",
                  file=sys.stderr)
            return 2

    results: dict[str, dict] = {}
    n_match = n_rows_only = n_fail = 0
    t0 = time.time()
    for i, name in enumerate(names, 1):
        spec = REGISTRY[name]
        row: dict = {"match": None, "err": None}
        try:
            df = spec.builder(spark, args.sf_dir)
            spark_cols = list(df.columns)
            spark_rows = [tuple(r) for r in df.collect()]
            row["spark_rows"] = len(spark_rows)
            if spec.oracle is None:
                row["match"] = "rows_only"
                n_rows_only += 1
            else:
                con = duckdb_connection(args.sf_dir)
                try:
                    cur = con.execute(spec.oracle)
                    o_cols = [d[0] for d in cur.description]
                    o_rows = cur.fetchall()
                finally:
                    con.close()
                row["oracle_rows"] = len(o_rows)
                if sorted(spark_cols) != sorted(o_cols):
                    row["match"] = "SCHEMA_MISMATCH"
                    row["err"] = f"cols {sorted(spark_cols)} != {sorted(o_cols)}"
                elif _rows_canonical(spark_cols, spark_rows) != \
                        _rows_canonical(o_cols, o_rows):
                    row["match"] = "VALUE_MISMATCH"
                else:
                    row["match"] = "MATCH"
                    n_match += 1
        except Exception:
            row["err"] = traceback.format_exc(limit=5)
            row["match"] = "ERROR"
        if row["match"] not in ("MATCH", "rows_only"):
            n_fail += 1
            print(f"[{i}/{len(names)}] {name}: {row['match']}",
                  file=sys.stderr)
            if row["err"]:
                print(row["err"], file=sys.stderr)
        elif i % 25 == 0:
            print(f"[{i}/{len(names)}] ... {n_match} MATCH, "
                  f"{n_rows_only} rows-only, {n_fail} FAIL", file=sys.stderr)
        results[name] = row

    summary = {
        "total": len(names),
        "match": n_match,
        "rows_only": n_rows_only,
        "fail": n_fail,
        "sf_dir": args.sf_dir,
        "session": "stock (driver-equivalent: master + appName only)",
        "wall_sec": round(time.time() - t0, 1),
    }
    out = args.out or os.path.join(REPO, "FULL_ORACLE_DRIVE.json")
    with open(out, "w") as fh:
        json.dump({"summary": summary, "queries": results}, fh, indent=1)
    print(json.dumps(summary))
    spark.stop()
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
