"""Command-line runner for the pipeline plans.

The reference triggers its pipelines on Azure timer functions with
``run_on_startup=True`` (`L:24–26`, `S:25–31`); here scheduling is
platform config (cron/Airflow/workflows), and this CLI is the unit
they invoke:

    python -m etl_python_azure_spark.cli latinad \
        --base-url https://api.example.com --sink /data/latinad
    python -m etl_python_azure_spark.cli sercom \
        --base-url https://api.example.com --sink /data/sercom \
        --existing-tasks /data/sercom/tasks_snapshot

Uses the stdlib urllib transport (auth headers via --header k=v,
repeatable). Exit code 0 only when the run completes; per-request
fetch failures are captured as data (T5), not crashes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _headers(pairs: list[str]) -> dict:
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_python_azure_spark")
    sub = ap.add_subparsers(dest="pipeline", required=True)
    for name in ("latinad", "sercom"):
        p = sub.add_parser(name)
        p.add_argument("--base-url", required=True)
        p.add_argument("--sink", required=True)
        p.add_argument("--header", action="append", default=[])
        p.add_argument("--timeout", type=float, default=600.0)
    sub.choices["sercom"].add_argument(
        "--existing-tasks",
        help="parquet path of the current task snapshot (id, updated_at) "
        "for the CDC split; omit for a first full load",
    )

    q = sub.add_parser(
        "query",
        help="run a registered query against a directory of the "
        "standard parquet tables",
    )
    q.add_argument("name", nargs="?", help="query name (see --list)")
    q.add_argument("--list", action="store_true", help="list query names")
    q.add_argument("--data", default="/root/testdata/sf0.01")
    q.add_argument("--out", help="write full result parquet here")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument(
        "--explain", action="store_true",
        help="print the physical plan. NOTE: queries built on eager"
        " checkpoints execute their pipeline at BUILD time and the"
        " printed plan collapses to Scan ExistingRDD — set"
        " SPARK_GRAFT_LAZY_PLANS=1 to keep builders lazy and print"
        " the full logical tree without running it (plan audits"
        " only; never for timed runs)",
    )

    sc = sub.add_parser(
        "sidecars",
        help="maintain the dedup sidecar tables the incremental "
        "curation probes (plans.sidecars): build bootstraps from an "
        "existing base corpus, sync repairs after a crash, compact "
        "dedupes and sorts by probe key",
    )
    sc.add_argument(
        "action", choices=["build", "sync", "compact", "unlock"]
    )
    sc.add_argument("--dir", required=True, help="sidecar directory")
    sc.add_argument(
        "--base", help="base corpus parquet dir (build/sync)"
    )
    sc.add_argument("--span-window", type=int, default=None)
    sc.add_argument("--files-per-table", type=int, default=4)

    args = ap.parse_args(argv)
    from .session import get_spark

    if args.pipeline == "sidecars":
        from .plans import sidecars as sctbl

        if args.action == "unlock":
            # operator action after a compaction crash (follow with
            # `sidecars sync`); a session is only needed when the dir
            # is URI-addressed (Hadoop FS routing)
            sess = (
                get_spark("sidecars-unlock")
                if sctbl._has_scheme(args.dir)
                else None
            )
            removed = sctbl.force_unlock_sidecars(args.dir, sess)
            print(json.dumps(
                {"sidecars": "unlock", "dir": args.dir,
                 "removed_lock": removed}
            ))
            return 0
        spark = get_spark(f"sidecars-{args.action}")
        t0 = time.time()
        if args.action in ("build", "sync") and not args.base:
            print("--base is required for build/sync", file=sys.stderr)
            return 2
        if args.action == "build":
            sctbl.build_sidecars(
                spark, args.base, args.dir, span_window=args.span_window
            )
            detail: dict = {}
        elif args.action == "sync":
            detail = {
                "repaired_docs": sctbl.sync_sidecars(
                    spark, args.base, args.dir,
                    span_window=args.span_window,
                )
            }
        else:
            detail = {
                "rows": sctbl.compact_sidecars(
                    spark, args.dir, files_per_table=args.files_per_table
                )
            }
        print(
            json.dumps(
                {
                    "sidecars": args.action,
                    "dir": args.dir,
                    "elapsed_sec": round(time.time() - t0, 1),
                    **detail,
                }
            )
        )
        return 0

    if args.pipeline == "query":
        from .queries import registry

        reg = registry()
        if args.list or not args.name:
            for n in reg:
                print(n)
            return 0
        if args.name not in reg:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        spark = get_spark(f"query-{args.name}")
        t0 = time.time()
        df = reg[args.name].builder(spark, args.data)
        if args.explain:
            df.explain("formatted")
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
        else:
            df.show(args.limit, truncate=False)
            n = df.count()
        print(
            json.dumps(
                {
                    "query": args.name,
                    "rows": n,
                    "elapsed_sec": round(time.time() - t0, 1),
                }
            )
        )
        return 0

    from .sources.rest import urllib_transport

    spark = get_spark(f"pipeline-{args.pipeline}")
    transport = urllib_transport(args.timeout)
    headers = _headers(args.header)
    t0 = time.time()

    if args.pipeline == "latinad":
        from .plans.latinad import run_latinad

        res = run_latinad(
            spark, transport, args.base_url, headers, sink_root=args.sink
        )
        n_failed = res.failed_requests.count()
        print(
            json.dumps(
                {
                    "pipeline": "latinad",
                    "elapsed_sec": round(time.time() - t0, 1),
                    "failed_requests": n_failed,
                }
            )
        )
    else:
        from .plans.sercom import run_sercom

        existing = (
            spark.read.parquet(args.existing_tasks)
            if args.existing_tasks
            else None
        )
        res = run_sercom(
            spark,
            transport,
            args.base_url,
            headers,
            existing_tasks=existing,
            sink_root=args.sink,
        )
        out = {"pipeline": "sercom", "elapsed_sec": round(time.time() - t0, 1)}
        if res.task_split is not None:
            out["new_tasks"] = res.task_split.new.count()
            out["updated_tasks"] = res.task_split.updated.count()
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
