#!/usr/bin/env python
"""Measure the sidecar-compaction payoff the plans.sidecars
docstring claims (r12 verdict item 2): probe-join cost for a FIXED
delta admitted via `curate_increment(sidecar_dir=...)` against a
~49.8k-doc base, with the sidecars in two states:

- FRAGMENTED: built by N successive delta-sized appends (the state
  an append-only ingest loop accumulates — one small file set per
  batch, rows unsorted w.r.t. the probe keys);
- COMPACTED: after `compact_sidecars` (distinct rows, range-
  partitioned + sorted by probe key, files_per_table data files).

The delta is 200 base documents with their token order REVERSED —
novel at every tier (fp, bands, spans), so the full probe chain
executes against the sidecars and the admitted set is identical in
both cells (asserted). min-of-R wall clock per cell.

Usage: python scripts/sidecar_compact_bench.py
         [--src /root/repo/.scratch/sf1] [--slices 16] [--repeats 3]
         [--scratch /root/repo/.scratch/sidecar_bench]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_python_azure_spark.session import get_spark, load_tables  # noqa: E402

SPAN_W = 8


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/repo/.scratch/sf1")
    ap.add_argument("--slices", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--scratch", default="/root/repo/.scratch/sidecar_bench"
    )
    args = ap.parse_args()

    from etl_python_azure_spark.plans.curation import curate_increment
    from etl_python_azure_spark.plans.sidecars import (
        append_sidecars,
        compact_sidecars,
        sidecar_file_counts,
    )

    spark = get_spark("sidecar-compact-bench")
    shutil.rmtree(args.scratch, ignore_errors=True)
    base_dir = os.path.join(args.scratch, "base")
    sc_dir = os.path.join(args.scratch, "sidecars")

    docs = load_tables(spark, args.src, "documents").select(
        "doc_id", "source", "text"
    )
    n_base = docs.count()
    docs.write.parquet(base_dir)

    # fragmented build: N successive delta-sized appends, the
    # append-only ingest accumulation shape
    t0 = time.time()
    for i in range(args.slices):
        append_sidecars(
            spark,
            docs.filter(F.pmod("doc_id", F.lit(args.slices)) == i),
            sc_dir,
            span_window=SPAN_W,
        )
    build_sec = round(time.time() - t0, 1)
    frag_files = sidecar_file_counts(sc_dir)

    # fixed novel delta: 200 base docs, token order reversed
    delta = (
        docs.filter(F.pmod("doc_id", F.lit(max(1, n_base // 200))) == 0)
        .limit(200)
        .select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
            "source",
            F.concat_ws(
                " ", F.reverse(F.split(F.lower("text"), " "))
            ).alias("text"),
        )
        .localCheckpoint()
    )
    n_delta = delta.count()

    def probe_cell() -> tuple[float, int]:
        best, n_adm = float("inf"), -1
        for _ in range(args.repeats):
            t0 = time.time()
            admitted = curate_increment(
                spark,
                base_dir,
                delta,
                span_window=SPAN_W,
                sidecar_dir=sc_dir,
                compact_max_files=None,  # measuring, not triggering
            )
            n_adm = admitted.count()
            best = min(best, round(time.time() - t0, 2))
            spark.catalog.clearCache()
        return best, n_adm

    frag_sec, frag_adm = probe_cell()

    t0 = time.time()
    stats = compact_sidecars(spark, sc_dir, files_per_table=4)
    compact_sec = round(time.time() - t0, 1)
    comp_files = sidecar_file_counts(sc_dir)

    comp_sec, comp_adm = probe_cell()
    assert comp_adm == frag_adm, (frag_adm, comp_adm)

    print(json.dumps({
        "n_base": n_base,
        "n_delta": n_delta,
        "n_admitted": frag_adm,
        "slices": args.slices,
        "fragmented_files": frag_files,
        "compacted_files": comp_files,
        "fragmented_build_sec": build_sec,
        "compact_sec": compact_sec,
        "probe_fragmented_sec": frag_sec,
        "probe_compacted_sec": comp_sec,
        "rows_folded": {k: v for k, v in stats.items()},
        "repeats": args.repeats,
    }))
    shutil.rmtree(args.scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
