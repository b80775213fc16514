"""Command-line front door: run any registered query from a shell.

The reference engine is a CLI program (asio_deep/main.cpp — scan a
directory, run the pipeline, write results); this module is its
generalized counterpart over the whole registry:

    python -m mapreduce_4_spark list [--tag dedup]
    python -m mapreduce_4_spark run q1_pricing_summary [--sf DIR] [-n 20]
    python -m mapreduce_4_spark explain minhash_lsh_neardup
    python -m mapreduce_4_spark oracle q1_pricing_summary
    python -m mapreduce_4_spark bench q5_revenue_by_nation [--runs 3]
    python -m mapreduce_4_spark table history DIR
    python -m mapreduce_4_spark table compact DIR [--target-files 1]
    python -m mapreduce_4_spark table compact-tail DIR [--keep-base 1]
    python -m mapreduce_4_spark table vacuum DIR [--keep-last 1]
    python -m mapreduce_4_spark table delete DIR --col k --values 1,2 [--dv]
    python -m mapreduce_4_spark table delete DIR --col k --lower 0 --upper 9
    python -m mapreduce_4_spark table restore DIR --version N
    python -m mapreduce_4_spark table tag DIR --name train-v1 [--version N]
    python -m mapreduce_4_spark table tags DIR
    python -m mapreduce_4_spark table cluster DIR --zorder a,b
    python -m mapreduce_4_spark table fsck DIR [--deep]

``--sf`` defaults to $SPARK_GRAFT_SF_DIR, else /root/testdata/sf0.1 —
the same contract as bench.py. ``table`` is the maintenance front door
for versioned table dirs (sources/versioned.py) — the OPTIMIZE/VACUUM
verbs a lakehouse CLI exposes, over this repo's table format.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _default_sf() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _bound(s):
    """CLI range bound: int, else float, else the raw string."""
    if s is None:
        return None
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    return s


def _ts(s):
    """CLI as-of value: epoch float if numeric, else the ISO string
    (versioned._as_of_epoch parses it)."""
    if s is None:
        return None
    try:
        return float(s)
    except ValueError:
        return s


def _meta_first(fn, *args, **kwargs):
    """Call a metadata-first versioned-table aggregate with spark=None;
    only when it reports dirs needing a scan does a session spin up.
    Any other ValueError (bad arguments) propagates."""
    try:
        return fn(None, *args, **kwargs)
    except ValueError as e:
        if "pass a SparkSession" not in str(e):
            raise
        from mapreduce_4_spark.session import get_spark

        return fn(get_spark("mapreduce_4_spark-cli-table"),
                  *args, **kwargs)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mapreduce_4_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("list", help="list registered queries")
    sp.add_argument("--tag", help="filter by tag substring")
    sp.add_argument("--markdown", action="store_true",
                    help="emit the full registry as a markdown table "
                         "(QUERIES.md is generated from this)")

    sp = sub.add_parser(
        "sql", help="run ad-hoc Spark SQL over the fixture tables "
                    "(region/nation/.../documents/embeddings as views)")
    sp.add_argument("statement")
    sp.add_argument("--sf", default=_default_sf())
    sp.add_argument("-n", "--rows", type=int, default=20)

    for cmd, hlp in [("run", "run a query and show rows"),
                     ("explain", "print the optimized physical plan"),
                     ("oracle", "print the DuckDB oracle SQL"),
                     ("bench", "time a query (min of N runs)")]:
        sp = sub.add_parser(cmd, help=hlp)
        sp.add_argument("name")
        sp.add_argument("--sf", default=_default_sf())
        if cmd == "run":
            sp.add_argument("-n", "--rows", type=int, default=20)
        if cmd == "bench":
            sp.add_argument("--runs", type=int, default=3)

    sp = sub.add_parser(
        "table", help="versioned-table maintenance (history/compact/"
                      "compact-tail/vacuum/stats/count/minmax/sum/agg/"
                      "lookup/restore/delete/update/merge/tag/tags/"
                      "cluster/changes)")
    sp.add_argument("verb", choices=["history", "compact", "compact-tail",
                                     "vacuum", "stats", "count", "minmax",
                                     "sum", "agg", "lookup", "restore",
                                     "delete", "update", "merge", "tag",
                                     "tags", "cluster", "fsck", "analyze",
                                     "changes"])
    sp.add_argument("table_dir")
    sp.add_argument("--target-files", type=int, default=None,
                    help="files per fold; unset = 1 (compact) or the "
                         "clustered-fold shuffle default (compact-tail)")
    sp.add_argument("--keep-base", type=int, default=1)
    sp.add_argument("--keep-last", type=int, default=1)
    sp.add_argument("--staged-ttl", type=float, default=24 * 3600.0,
                    help="seconds before an unreferenced _staged/ dir "
                         "(crashed concurrent writer) is swept by vacuum")
    sp.add_argument("--col", help="count/minmax: the column")
    sp.add_argument("--lower", help="count: inclusive lower bound")
    sp.add_argument("--upper", help="count: inclusive upper bound")
    sp.add_argument("--version", type=int, default=None,
                    help="time travel: integer version (count/sum/"
                         "minmax/agg)")
    sp.add_argument("--as-of", dest="as_of", default=None,
                    help="time travel: timestamp — epoch seconds or "
                         "ISO-8601, UTC when tz-naive (count/sum/"
                         "minmax/agg)")
    sp.add_argument("--values", default=None,
                    help="lookup/delete/update: comma-separated values "
                         "for col IN (...)")
    sp.add_argument("--set", default=None,
                    help="update: comma-separated col=value assignments "
                         "applied to matching rows")
    sp.add_argument("--source", default=None,
                    help="merge: parquet path holding the update rows "
                         "(upserted on --col); delete: parquet path of "
                         "keys for the join-classified wide delete")
    sp.add_argument("--bloom-for", dest="bloom_for", default=None,
                    help="analyze: comma-separated columns to backfill "
                         "bloom filters for (defaults to the chain's "
                         "recorded bloom_for)")
    sp.add_argument("--wide", action="store_true",
                    help="merge: classify dirs by one-scan join "
                         "instead of collecting the update keys "
                         "(unbounded update sets)")
    sp.add_argument("--zorder", default=None,
                    help="cluster: comma-separated columns for the "
                         "Morton-interleave layout (2+); one column "
                         "re-clusters with a plain sort; omit to "
                         "re-apply the table's recorded discipline")
    sp.add_argument("--name", default=None,
                    help="tag: the tag name to create (with --delete: "
                         "to drop)")
    sp.add_argument("--delete", action="store_true",
                    help="tag: drop --name instead of creating it")
    sp.add_argument("--deep", action="store_true",
                    help="fsck: also recompute per-dir stats from the "
                         "data (one scan per statted dir)")
    sp.add_argument("--dv", action="store_true",
                    help="delete: merge-on-read (deletion-vector "
                         "sidecar, zero rewrites) instead of the "
                         "copy-on-write default")
    sp.add_argument("--key", default=None,
                    help="changes: the diff key column (required — the "
                         "change feed is a keyed diff)")
    sp.add_argument("--from", dest="from_version", default=None,
                    help="changes: first version of the window "
                         "(startingVersion; default 1)")
    sp.add_argument("--to", dest="to_version", default=None,
                    help="changes: last version of the window "
                         "(endingVersion; default latest)")
    sp.add_argument("--from-ts", dest="from_ts", default=None,
                    help="changes: startingTimestamp (epoch seconds or "
                         "ISO-8601, at-or-after resolution) — instead "
                         "of --from")
    sp.add_argument("--to-ts", dest="to_ts", default=None,
                    help="changes: endingTimestamp (latest commit "
                         "at-or-before) — instead of --to")
    sp.add_argument("--cdc-format", dest="cdc_format", default=None,
                    choices=["pairs", "delta"],
                    help="changes: row shape — 'pairs' (op/key/old_*/"
                         "new_*, default) or 'delta' (Delta CDF's "
                         "_change_type row images)")
    sp.add_argument("-n", "--rows", type=int, default=20,
                    help="changes: rows to show")

    args = p.parse_args(argv)

    if args.cmd == "table":
        from mapreduce_4_spark.sources import versioned as vt

        if args.verb == "vacuum":
            # driver-side (no Spark jobs), but scheme'd paths route
            # their manifest I/O through an active session's Hadoop
            # FileSystem — spin one up for those
            if "://" in args.table_dir:
                from mapreduce_4_spark.session import get_spark

                get_spark("mapreduce_4_spark-cli-table")
            removed = vt.vacuum(args.table_dir, keep_last=args.keep_last,
                                staged_ttl_s=args.staged_ttl)
            print(f"removed versions: {removed or 'none'}")
            return 0
        if args.verb == "stats":
            # metadata-only: the skipping decision a stats-pruned read
            # makes, shown as the manifest records it
            if "://" in args.table_dir:
                from mapreduce_4_spark.session import get_spark

                get_spark("mapreduce_4_spark-cli-table")
            v = vt.latest_version(args.table_dir)
            if v is None:
                print("no published versions")
                return 1
            m = vt.read_manifest(args.table_dir, v)
            print(f"version {v}  stats_for={m.get('stats_for')}")
            dir_rows = m.get("dir_rows") or {}
            for d, cols in sorted((m.get("col_stats") or {}).items()):
                spans = ", ".join(
                    f"{c}=[{s[0]!r}, {s[1]!r}]"
                    + (f" nulls={s[2]}" if len(s) > 2 else "")
                    + (f" sum={s[3]}" if len(s) > 3 else "")
                    for c, s in sorted(cols.items())
                )
                rows = dir_rows.get(d)
                rows_note = f"rows={rows} " if rows is not None else ""
                print(f"  {d}: {rows_note}{spans}")
            return 0
        if args.verb == "lookup":
            # bloom-pruned point lookup: col IN (values) touching only
            # the chain dirs whose bloom filter hits a probe value
            if not args.col or not args.values:
                p.error("lookup needs --col and --values")
            from mapreduce_4_spark.session import get_spark

            spark = get_spark("mapreduce_4_spark-cli-table")
            vals = [_bound(v) for v in args.values.split(",")]
            df, info = vt.read_version_bloom_pruned(
                spark, args.table_dir, args.col, vals,
                version=args.version, as_of=_ts(args.as_of), detail=True)
            rows = df.collect()
            for r in rows[:50]:
                print("|".join(str(x) for x in r))
            print(f"{len(rows)} row(s)  (dirs: {info['missed']} bloom-"
                  f"skipped, {info['scanned']} scanned, "
                  f"{info['unknown']} no-bloom)")
            return 0
        if args.verb == "agg":
            # the whole metadata-aggregate set over one column in one
            # verb: COUNT(*), COUNT(col), MIN, MAX, SUM, AVG — each
            # answered from the manifest wherever provable, scanning
            # only boundary-straddling dirs (the Iceberg/Delta move)
            if not args.col:
                p.error("agg needs --col")
            if "://" in args.table_dir:
                from mapreduce_4_spark.session import get_spark

                get_spark("mapreduce_4_spark-cli-table")
            lo, hi = _bound(args.lower), _bound(args.upper)
            kw = dict(lower=lo, upper=hi) if (lo is not None
                                              or hi is not None) else {}
            tt = dict(version=args.version, as_of=_ts(args.as_of))
            n_rows, i_rows = _meta_first(
                vt.count_version, args.table_dir, **tt,
                **(dict(col=args.col, **kw) if kw else {}), detail=True)
            n_col, i_col = _meta_first(
                vt.count_version, args.table_dir, count_col=args.col,
                **tt, **(dict(col=args.col, **kw) if kw else {}),
                detail=True)
            s, i_sum = _meta_first(vt.sum_version, args.table_dir,
                                   args.col, **tt, **kw, detail=True)
            avg = (s / n_col) if (s is not None and n_col) else None
            if kw:
                # minmax_version is whole-table; under bounds it would
                # mislead, so the bounded form reports the other five
                rng = f" in [{lo!r}, {hi!r}]"
                minmax = ""
            else:
                mn, mx = _meta_first(vt.minmax_version, args.table_dir,
                                     args.col, **tt)
                rng = ""
                minmax = f"min={mn!r} max={mx!r} "
            print(f"{args.col}{rng}: count(*)={n_rows} "
                  f"count({args.col})={n_col} {minmax}"
                  f"sum={s!r} avg={avg!r}")
            scanned = (i_rows["scanned"] + i_col["scanned"]
                       + i_sum["scanned"])
            print(f"  (dirs scanned: {scanned}; the rest from metadata)")
            return 0
        if args.verb in ("count", "sum", "minmax"):
            if args.verb != "count" and not args.col:
                p.error(f"{args.verb} needs --col")
            if not args.col and (args.lower or args.upper):
                p.error("count bounds need --col (which column "
                        "do --lower/--upper constrain?)")
            if "://" in args.table_dir:
                from mapreduce_4_spark.session import get_spark

                get_spark("mapreduce_4_spark-cli-table")
            tt = dict(version=args.version, as_of=_ts(args.as_of))
            if args.verb == "minmax":
                mn, mx = _meta_first(vt.minmax_version, args.table_dir,
                                     args.col, **tt)
                print(f"min={mn!r} max={mx!r}")
                return 0
            kw = {"detail": True, **tt}
            if args.col:
                kw.update(col=args.col, lower=_bound(args.lower),
                          upper=_bound(args.upper))
            fn = vt.count_version if args.verb == "count" else vt.sum_version
            n, info = _meta_first(fn, args.table_dir, **kw)
            meta = info["counted" if args.verb == "count" else "summed"]
            print(f"{n}  (dirs: {meta} from metadata, "
                  f"{info['missed']} skipped, {info['scanned']} scanned)")
            return 0
        if args.verb == "delete":
            # targeted delete: --col + --values (keyed), --col +
            # --lower/--upper (range), or --col + --source (a parquet
            # path of keys too wide to collect — the join-classified
            # path); CoW by default, --dv for the zero-rewrite
            # deletion-vector commit
            if not args.col:
                p.error("delete needs --col")
            keyed = args.values is not None
            ranged = args.lower is not None or args.upper is not None
            wide = args.source is not None
            if keyed + ranged + wide != 1:
                p.error("delete needs exactly one of --values, "
                        "--lower/--upper, or --source")
            from mapreduce_4_spark.session import get_spark

            spark = get_spark("mapreduce_4_spark-cli-table")
            if wide:
                if args.dv:
                    p.error("--dv takes --values/--lower/--upper "
                            "addressing (bounded); a --source-wide "
                            "delete is the join-classified CoW path")
                v, info = vt.delete_version_joined(
                    spark, args.table_dir,
                    spark.read.parquet(args.source), args.col,
                    detail=True)
                print(f"cow-deleted (joined) -> v{v} (dirs: "
                      f"{info['untouched']} untouched, "
                      f"{info['rewritten']} rewritten)")
                return 0
            if keyed:
                kw = dict(keys=[_bound(v) for v in args.values.split(",")],
                          key=args.col)
            else:
                kw = dict(where={args.col: (_bound(args.lower),
                                            _bound(args.upper))})
            if args.dv:
                v, info = vt.delete_version_dv(spark, args.table_dir,
                                               detail=True, **kw)
                print(f"dv-deleted {info['deleted']} row(s) -> v{v} "
                      f"(sidecar rows: {info['dv_rows']}, zero rewrites)")
            else:
                v, info = vt.delete_version_pruned(spark, args.table_dir,
                                                   detail=True, **kw)
                print(f"cow-deleted -> v{v} (dirs: {info['dropped']} "
                      f"dropped whole, {info['untouched']} untouched, "
                      f"{info['rewritten']} rewritten)")
            return 0
        if args.verb == "update":
            # targeted CoW UPDATE: same --col + --values / --lower/
            # --upper addressing as delete, plus --set col=value[,...]
            # (values typed by the same _bound rule as the predicate);
            # dir classification = the delete rule, so the commit cost
            # is O(dirs that may hold matching rows)
            if not args.col or not args.set:
                p.error("update needs --col and --set col=value[,...]")
            if args.dv:
                p.error("--dv applies to delete only (there is no "
                        "merge-on-read update)")
            keyed = args.values is not None
            ranged = args.lower is not None or args.upper is not None
            wide = args.source is not None
            if keyed + ranged + wide != 1:
                p.error("update needs exactly one of --values, "
                        "--lower/--upper, or --source")
            assignments = {}
            for pair in args.set.split(","):
                col, sep, val = pair.partition("=")
                if not sep or not col.strip():
                    p.error(f"--set entry {pair!r} is not col=value")
                assignments[col.strip()] = _bound(val)
            from mapreduce_4_spark.session import get_spark

            spark = get_spark("mapreduce_4_spark-cli-table")
            if wide:
                # join-classified: keys stay a DataFrame end-to-end
                v, info = vt.update_version_joined(
                    spark, args.table_dir, assignments,
                    spark.read.parquet(args.source), args.col,
                    detail=True)
            else:
                if keyed:
                    kw = dict(
                        keys=[_bound(v) for v in args.values.split(",")],
                        key=args.col)
                else:
                    kw = dict(where={args.col: (_bound(args.lower),
                                                _bound(args.upper))})
                v, info = vt.update_version_pruned(
                    spark, args.table_dir, assignments, detail=True,
                    **kw)
            print(f"cow-updated{' (joined)' if wide else ''} -> v{v} "
                  f"(dirs: {info['untouched']} untouched, "
                  f"{info['rewritten']} rewritten)")
            return 0
        if args.verb == "merge":
            # keyed CoW MERGE (upsert): update rows come from a parquet
            # path; matched keys update, unmatched insert; only dirs
            # provably holding updated keys rewrite
            if not args.col or not args.source:
                p.error("merge needs --col (the key) and --source "
                        "<parquet path of update rows>")
            if args.dv:
                p.error("--dv applies to delete only (merge always "
                        "writes its update rows)")
            from mapreduce_4_spark.session import get_spark

            spark = get_spark("mapreduce_4_spark-cli-table")
            updates = spark.read.parquet(args.source)
            if args.wide:
                # join-classified: one scan, no driver key collect —
                # for update sets past the manifest classifier's
                # max_keys broadcast budget
                v, info = vt.merge_version_joined(
                    spark, args.table_dir, updates, args.col,
                    detail=True)
            else:
                v, info = vt.merge_version_pruned(
                    spark, args.table_dir, updates, args.col,
                    detail=True)
            print(f"cow-merged{' (joined)' if args.wide else ''} -> "
                  f"v{v} (dirs: {info['untouched']} untouched, "
                  f"{info['rewritten']} rewritten)")
            return 0
        if args.verb == "analyze":
            # ANALYZE: backfill col_stats/blooms for chain dirs missing
            # them (mr4ver-writer staged dirs, pre-stats history) as a
            # metadata-only commit — one scan per un-statted dir
            from mapreduce_4_spark.session import get_spark

            spark = get_spark("mapreduce_4_spark-cli-table")
            stats_cols = ([c for c in args.col.split(",") if c]
                          if args.col else None)
            bloom_cols = ([c for c in args.bloom_for.split(",") if c]
                          if args.bloom_for else None)
            v, info = vt.analyze_table(
                spark, args.table_dir, stats_for=stats_cols,
                bloom_for=bloom_cols, detail=True)
            if v is None:
                print("nothing to analyze (all dirs carry stats)")
            else:
                print(f"analyzed {len(info['analyzed'])} dir(s) -> v{v}")
            return 0
        if args.verb in ("tag", "tags"):
            # named snapshots (Iceberg tags): a tag pins a version
            # against vacuum and addresses every reader/aggregate by
            # name (version="train-v1")
            if "://" in args.table_dir:
                from mapreduce_4_spark.session import get_spark

                get_spark("mapreduce_4_spark-cli-table")
            if args.verb == "tags":
                tags = vt.list_tags(args.table_dir)
                for name, v in sorted(tags.items()):
                    print(f"{name}\tv{v}")
                if not tags:
                    print("no tags")
                return 0
            if not args.name:
                p.error("tag needs --name")
            if args.delete:
                v = vt.delete_tag(args.table_dir, args.name)
                print(f"deleted tag {args.name} (was v{v})")
            else:
                v = vt.tag_version(args.table_dir, args.name,
                                   version=args.version)
                print(f"tagged v{v} as {args.name}")
            return 0
        if args.verb == "fsck":
            # consistency audit: manifest vs bytes on disk; report,
            # never repair. Exit 1 when findings exist (scriptable).
            sp_arg = None
            if args.deep or "://" in args.table_dir:
                from mapreduce_4_spark.session import get_spark

                sp_arg = get_spark("mapreduce_4_spark-cli-table")
            findings = vt.fsck_table(
                args.table_dir, version=args.version,
                spark=sp_arg if args.deep else None)
            for f in findings:
                print(f"FINDING: {f}")
            print(f"{len(findings)} finding(s)"
                  + (" (deep)" if args.deep else ""))
            return 1 if findings else 0
        if args.verb == "cluster":
            # OPTIMIZE [ZORDER BY]: republish the latest snapshot under
            # a (new) clustered layout — sort_by for one column,
            # zorder_by for multi-dimensional skipping. With no
            # --zorder, re-apply the table's RECORDED discipline (the
            # OPTIMIZE-with-no-spec repair for a decayed clustered
            # chain, round 12).
            from mapreduce_4_spark.session import get_spark

            spark = get_spark("mapreduce_4_spark-cli-table")
            latest = vt.read_version(spark, args.table_dir)
            # the republish must carry EVERY standing layout contract
            # (partition_by, bucket_by/n_buckets, stats_for, bloom_for)
            # — layout_from_manifest's rule — with only the clustering
            # fields overridden; hand-built kwargs here once silently
            # dropped the partition/bucket/bloom contracts
            kw = vt.layout_from_manifest(vt.read_manifest(
                args.table_dir, vt.latest_version(args.table_dir)))
            if not args.zorder:
                recorded = kw.get("zorder_by") or kw.get("sort_by")
                if not recorded:
                    p.error("cluster needs --zorder col[,col...] (the "
                            "table records no clustering discipline "
                            "to re-apply)")
                cols = list(recorded)
            else:
                cols = [c for c in args.zorder.split(",") if c]
            if len(cols) == 1:
                kw["sort_by"] = cols
                kw["zorder_by"] = None
                kw.pop("zorder_bits", None)
            else:
                blocker = ("bucket_by" if kw.get("bucket_by")
                           else "partition_by" if kw.get("partition_by")
                           else None)
                if blocker:
                    p.error(
                        f"cannot zorder: table has a standing {blocker} "
                        "layout, and zorder_by is a whole-table "
                        "clustered layout that would silently replace "
                        "it — drop the conflicting layout explicitly "
                        "(full rewrite without it) before clustering")
                kw["sort_by"] = None
                kw["zorder_by"] = cols
            v = vt.write_version(
                latest, args.table_dir, n_files=args.target_files,
                manifest_extra={"operation": "cluster"}, **kw)
            print(f"clustered ({'zorder' if len(cols) > 1 else 'sort'}: "
                  f"{','.join(cols)}) -> v{v}")
            return 0
        if args.verb == "restore":
            # zero-copy rollback: publish a new version referencing the
            # target's data dirs — pure manifest arithmetic, no Spark
            if args.version is None:
                p.error("restore needs --version (the target to "
                        "roll back to)")
            if "://" in args.table_dir:
                from mapreduce_4_spark.session import get_spark

                get_spark("mapreduce_4_spark-cli-table")
            v = vt.restore_version(args.table_dir, args.version)
            print(f"restored v{args.version} -> v{v}")
            return 0
        if args.verb == "history":
            from mapreduce_4_spark.session import get_spark

            vt.history(get_spark("mapreduce_4_spark-cli-table"),
                       args.table_dir).show(truncate=False)
            return 0
        if args.verb == "changes":
            # the batch CDF front door, CLI shape: the audit question
            # "what changed between version A and B" answered from the
            # mutation deltas only (one executor task per version)
            if not args.key:
                p.error("table changes requires --key <column> — the "
                        "change feed is a keyed diff")
            from mapreduce_4_spark.session import get_spark
            from mapreduce_4_spark.sources.pyds import (
                register_versioned_source,
            )

            spark = get_spark("mapreduce_4_spark-cli-table")
            register_versioned_source(spark)
            r = (spark.read.format("mr4ver")
                 .option("readChangeFeed", "true")
                 .option("key", args.key))
            if args.from_version is not None:
                r = r.option("startingVersion", args.from_version)
            if args.to_version is not None:
                r = r.option("endingVersion", args.to_version)
            if args.from_ts is not None:
                r = r.option("startingTimestamp", args.from_ts)
            if args.to_ts is not None:
                r = r.option("endingTimestamp", args.to_ts)
            if args.cdc_format is not None:
                r = r.option("cdcFormat", args.cdc_format)
            df = r.load(args.table_dir)
            df.orderBy(df.columns[-1] if args.cdc_format != "delta"
                       else "_commit_version").show(args.rows,
                                                    truncate=False)
            return 0
        from mapreduce_4_spark.session import get_spark

        spark = get_spark("mapreduce_4_spark-cli-table")
        if args.verb == "compact":
            v = vt.compact(spark, args.table_dir,
                           target_files=(args.target_files
                                         if args.target_files is not None
                                         else 1))
            print(f"compacted -> v{v}")
        else:
            v = vt.compact_tail(spark, args.table_dir,
                                keep_base=args.keep_base,
                                target_files=args.target_files)
            print(f"tail-folded -> v{v}" if v is not None
                  else "nothing to fold")
        return 0

    from mapreduce_4_spark.plans import REGISTRY

    if args.cmd == "list":
        items = sorted(
            (n, s) for n, s in REGISTRY.items()
            if not args.tag or any(args.tag in t for t in s.tags)
        )
        if args.markdown:
            n_oracle = sum(1 for _, s in items if s.oracle)
            print("# QUERIES — the registered surface, generated\n")
            print(f"{len(items)} queries; {n_oracle} fully DuckDB-oracled, "
                  f"{len(items) - n_oracle} rows-only. Regenerate with "
                  "`python -m mapreduce_4_spark list --markdown > "
                  "QUERIES.md` (pinned in tests/test_cli.py).\n")
            print("| Query | Correctness | Tags | What it computes |")
            print("|---|---|---|---|")
            for name, spec in items:
                mark = "oracle" if spec.oracle else "rows-only"
                desc = " ".join(spec.description.split())
                if spec.rows_only_reason:
                    desc += (" — WHY rows-only: "
                             + " ".join(spec.rows_only_reason.split()))
                if spec.requires:
                    desc += (" — shared component: "
                             + ", ".join(spec.requires)
                             + " (a red on any query of this component "
                             "re-prioritizes the whole family in the "
                             "driver rotation)")
                print(f"| `{name}` | {mark} | {', '.join(spec.tags)} "
                      f"| {desc} |")
        else:
            for name, spec in items:
                mark = "oracle" if spec.oracle else "rows-only"
                print(f"{name}\t[{mark}]\t{', '.join(spec.tags)}")
        return 0

    if args.cmd == "sql":
        from mapreduce_4_spark.session import get_spark
        from mapreduce_4_spark.sources import register_temp_views

        spark = get_spark("mapreduce_4_spark-cli-sql")
        register_temp_views(spark, args.sf)
        spark.sql(args.statement).show(args.rows, truncate=False)
        return 0

    spec = REGISTRY.get(args.name)
    if spec is None:
        close = [n for n in REGISTRY if args.name in n]
        hint = f" (did you mean: {', '.join(close[:5])}?)" if close else ""
        print(f"unknown query: {args.name}{hint}", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        print(spec.oracle or f"-- {args.name} is rows-only (no SQL oracle)")
        return 0

    from mapreduce_4_spark.session import get_spark

    spark = get_spark(f"mapreduce_4_spark-cli-{args.cmd}")
    df = spec.builder(spark, args.sf)

    if args.cmd == "explain":
        df.explain("formatted")
    elif args.cmd == "run":
        # bounded driver memory: only the head crosses to the driver;
        # the total comes from a count() that never collects rows
        df.show(args.rows, truncate=False)
        print(f"({df.count()} rows total)")
    elif args.cmd == "bench":
        df.count()  # warm: scan caches, broadcast builds, codegen
        best = min(
            (lambda s: (df.count(), time.time() - s)[1])(time.time())
            for _ in range(args.runs)
        )
        print(f"{args.name}: {best:.3f}s (min of {args.runs}, sf={args.sf})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
