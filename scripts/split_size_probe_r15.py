#!/usr/bin/env python
"""Round-15 probe: does raising spark.sql.files.maxPartitionBytes
(128 MB pinned since r13) buy anything on the scan tier (guide §6.1)?

Method: build the 10x/30x replicated fact arms (relational_scale_probe's
layout), then time a pure-scan aggregate and q1 over each arm at
maxPartitionBytes in {128m, 256m, 512m} (runtime SQL conf — takes
effect per plan), recording the actual scan partition count each time.

The expected null result, written down BEFORE running (guide §1):
FilePartition sizing is min(maxPartitionBytes, max(openCostInBytes,
totalBytes/defaultParallelism)) — with 32 cores the bytes/cores floor
governs until the input exceeds 32 x 128 MB = 4 GB, far above the 30x
arm (~330 MB). The conf can only matter at cluster scale; this probe
measures whether that arithmetic holds on the real reader.

Usage: python scripts/split_size_probe_r15.py [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONFS = ["134217728", "268435456", "536870912"]


def timed(df, runs):
    df.write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    return min(ts), ts


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import bench
    from pyspark.sql import functions as F

    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.session import get_spark
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from relational_scale_probe import _build_arm

    spark = get_spark("split-size-probe-r15")
    td = tempfile.mkdtemp(prefix="split_probe_")
    out: dict = {"runs": runs, "sf_dir": SF_DIR, "arms": {}}
    snap0 = bench.host_snapshot()
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for factor in (10, 30):
            arm = _build_arm(spark, td, factor)
            li_bytes = sum(
                os.path.getsize(os.path.join(f"{arm}/lineitem.parquet", f))
                for f in os.listdir(f"{arm}/lineitem.parquet")
                if f.endswith(".parquet"))
            rec: dict = {"lineitem_bytes": li_bytes, "confs": {}}
            for conf in CONFS:
                spark.conf.set("spark.sql.files.maxPartitionBytes", conf)
                scan = spark.read.parquet(f"{arm}/lineitem.parquet")
                n_parts = scan.rdd.getNumPartitions()
                t_scan, raw_scan = timed(
                    scan.agg(F.sum("l_quantity").alias("s")), runs)
                t_q1, raw_q1 = timed(
                    REGISTRY["q1_pricing_summary"].builder(spark, arm), runs)
                rec["confs"][f"{int(conf) >> 20}m"] = {
                    "scan_partitions": n_parts,
                    "scan_agg_sec": t_scan, "scan_raw": raw_scan,
                    "q1_sec": t_q1, "q1_raw": raw_q1,
                }
            out["arms"][f"x{factor}"] = rec
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        shutil.rmtree(td, ignore_errors=True)
    out["host"] = bench.host_telemetry(snap0, bench.host_snapshot(), None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
