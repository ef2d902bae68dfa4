"""File/lakehouse sinks (parquet-first).

Restates the reference's load patterns on columnar storage:

- K2 full refresh (`eliminar_y_crear_tabla` + append, `L:203–229`,
  `S:229–245`) → ``mode("overwrite")``.
- K3 ranged delete + append of a date window (`L:217–219`) →
  **dynamic partition overwrite**: write the recomputed window into a
  date-partitioned table and only the touched partitions are
  replaced — a metadata-level operation, no delete scan. This is the
  100 TB-correct form of the reference's 27-day window refresh.
- K4 multi-table load (`S:247–282`) → per-table staging-dir swap.
  Spark has no cross-table transaction (SURVEY §7.2): each table is
  atomic (write to staging, then swap), the *set* is not; a
  ``_manifest`` marker records the load so readers can pin a
  consistent set. Weaker than the reference's single DB transaction
  — documented, by design.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame


def full_refresh(df: DataFrame, path: str, partition_by: list[str] | None = None):
    """K2: replace the whole table."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def ranged_overwrite(df: DataFrame, path: str, partition_col: str):
    """K3: replace only the partitions present in *df*.

    Requires the table to be partitioned by *partition_col* (e.g. a
    date). Uses ``partitionOverwriteMode=dynamic`` so untouched
    partitions survive — the sliding-window refresh (T3) becomes a
    partition-pruned overwrite instead of a ranged DELETE.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
):
    """Bucketed (and bucket-sorted) table write for co-located joins.

    Two tables bucketed on the same key with the same bucket count
    join with NO exchange (and with ``sort`` also no sort step) — the
    pre-shuffled layout that pays for itself the first time a big
    fact-fact join repeats. The 100 TB answer to "this join shuffles
    every run".
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def multi_table_load(tables: dict[str, DataFrame], root: str) -> str:
    """K4: load several tables "together" with per-table atomicity.

    Each df is written to ``{root}/_staging/{name}`` then swapped
    into ``{root}/{name}``; a ``_manifest.json`` (written last)
    records the completed set + load timestamp. Readers that resolve
    paths through the manifest see a consistent set; direct readers
    may observe tables from two loads — the documented weaker
    guarantee vs the reference's single SQL transaction (`S:256`).

    Returns the manifest path.
    """
    staging = os.path.join(root, "_staging")
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(staging, name))
    loaded = []
    for name in tables:
        final = os.path.join(root, name)
        tmp_old = final + "._old"
        if os.path.exists(final):
            os.rename(final, tmp_old)
        os.rename(os.path.join(staging, name), final)
        if os.path.exists(tmp_old):
            shutil.rmtree(tmp_old)
        loaded.append(name)
    manifest = {"tables": loaded, "ts": time.time()}
    mpath = os.path.join(root, "_manifest.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(staging, ignore_errors=True)
    return mpath
