"""Maintained dedup sidecar tables for the curated base corpus.

The incremental curation paths (:func:`..plans.curation.curate_increment`,
:mod:`..streaming.corpus_ingest`) probe the base corpus three ways per
delta batch: exact fingerprints (anti-join), LSH band signatures
(near-dup candidates), and span fingerprints (cross-doc span tier).
Re-projecting those probes from the base parquet is correct but costs
a full base text scan per batch — at 100 TB a continuously-running
ingester cannot afford it. This module maintains the three
projections as append-only parquet SIDECAR tables next to the base,
so the per-batch probe is a narrow sidecar read and the base text is
touched exactly once per document (at admission time), never again.

Tables (under *sidecar_dir*):

- ``fp/``    — ``(doc_id, fp)``: md5 of the document text.
- ``bands/`` — ``(doc_id, band, band_sig)``: the MinHash-LSH band
  index (:func:`..operators.dedup.band_assignments`).
- ``spans/`` — ``(doc_id, sfp)``: distinct md5 fingerprints of the
  document's *span_window*-token shingles.

Each row carries ``doc_id`` (not just the fingerprint) so the repair
path can anti-join base ids against sidecar ids and recompute ONLY
the missing documents — the fingerprint-only form would save bytes
but make crash repair a full rebuild.

The ``fp`` table doubles as the COMPLETION LEDGER: every document
has exactly one fp row, while a short document legitimately has
zero band/span rows (no shingles), so "indexed" can only be judged
on fp. :func:`append_sidecars` therefore writes ``fp`` LAST — a
document's fp row exists only once every other table already holds
its rows. A crash mid-append can leave band/span rows without the
fp row; the repair then re-appends all three projections for the
missing ids, which may DUPLICATE band/span rows for the crashed
slice — harmless, every probe is set-semantics (anti/semi-join or
``distinct`` candidates), documented here so nobody "fixes" the
duplicate away with a per-table diff that would loop forever on
shingle-less documents.

Crash ordering contract: writers append the BASE first, the sidecars
second. A crash between the two leaves the sidecars *behind* the
base — safe, because :func:`sync_sidecars` (run at the top of every
batch) repairs the gap from the base before any probe, and a
replayed batch's rows are then rejected by the (repaired)
fingerprint anti-join, preserving the idempotent-admission property.
The reverse order would be UNSAFE: sidecar entries for rows that
never reached the base would make a replayed batch reject its own
rows without them ever being admitted (data loss), so don't flip it.

A ``_meta.json`` written at first append pins the projection
parameters (shingle n, minhash width, band size, span window);
appends and probes with mismatched parameters raise instead of
silently mixing incompatible fingerprints in one table.

Scale shape: appends are delta-sized projections; ``sync_sidecars``
scans only the base's ``doc_id`` column (parquet column pruning)
plus the text of the missing ids (normally zero rows; after a crash,
one batch's worth). No sidecar operation ever re-reads base text for
documents already indexed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fp", T.StringType()),
    ]
)
_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.LongType()),
        T.StructField("band_sig", T.StringType()),
    ]
)
_SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sfp", T.StringType()),
    ]
)
_SCHEMAS = {"fp": _FP_SCHEMA, "bands": _BANDS_SCHEMA, "spans": _SPANS_SCHEMA}


def _meta_path(sidecar_dir: str) -> str:
    return os.path.join(sidecar_dir, "_meta.json")


def _check_meta(
    sidecar_dir: str,
    shingle_n: int,
    num_hashes: int,
    band_size: int,
    span_window: int | None,
) -> None:
    """Pin projection params on first use; raise on a mismatch."""
    meta = {
        "shingle_n": shingle_n,
        "num_hashes": num_hashes,
        "band_size": band_size,
        "span_window": span_window,
    }
    path = _meta_path(sidecar_dir)
    if os.path.exists(path):
        with open(path) as fh:
            existing = json.load(fh)
        if existing != meta:
            raise ValueError(
                f"sidecar params mismatch at {sidecar_dir}: "
                f"table built with {existing}, caller passed {meta}"
            )
        return
    os.makedirs(sidecar_dir, exist_ok=True)
    with open(path, "w") as fh:
        json.dump(meta, fh)


def sidecar_frames(
    docs: DataFrame,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    span_window: int | None = None,
) -> dict[str, DataFrame]:
    """The three sidecar projections of a (doc_id, ..., text) frame
    — lazy; ``spans`` present only when *span_window* is set."""
    from ..operators.dedup import band_assignments, word_shingles

    out = {
        "fp": docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.md5("text").alias("fp"),
        ),
        "bands": band_assignments(
            word_shingles(docs, "doc_id", "text", shingle_n, distinct=False),
            "doc_id",
            num_hashes,
            band_size,
        ).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("band").cast("long").alias("band"),
            "band_sig",
        ),
    }
    if span_window is not None:
        out["spans"] = (
            word_shingles(docs, "doc_id", "text", n=span_window)
            .select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.md5("shingle").alias("sfp"),
            )
            .distinct()
        )
    return out


def read_sidecar(
    spark: SparkSession, sidecar_dir: str, which: str
) -> DataFrame:
    """Read one sidecar table; an empty correctly-typed frame when
    the table doesn't exist yet (first batch against an empty
    base)."""
    schema = _SCHEMAS[which]
    path = os.path.join(sidecar_dir, which)
    if not os.path.isdir(path):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(path)


def append_sidecars(
    spark: SparkSession,
    admitted: DataFrame,
    sidecar_dir: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    span_window: int | None = None,
) -> None:
    """Append the *admitted* rows' projections to every sidecar —
    call AFTER the base append (the crash-ordering contract above).
    Delta-sized work: one text projection per table, no base read.
    ``fp`` is written LAST — it is the completion ledger
    :func:`sync_sidecars` keys on (see the module docstring)."""
    _check_meta(sidecar_dir, shingle_n, num_hashes, band_size, span_window)
    frames = sidecar_frames(
        admitted, shingle_n, num_hashes, band_size, span_window
    )
    for which in sorted(frames, key=lambda w: w == "fp"):
        frames[which].write.mode("append").parquet(
            os.path.join(sidecar_dir, which)
        )


def build_sidecars(
    spark: SparkSession,
    base_dir: str,
    sidecar_dir: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    span_window: int | None = None,
) -> None:
    """Bootstrap: full sidecar build from an existing base corpus
    (one base scan — the LAST full-base projection the ingest ever
    pays; every later batch appends deltas only)."""
    base = spark.read.parquet(base_dir).select("doc_id", "text")
    append_sidecars(
        spark, base, sidecar_dir, shingle_n, num_hashes, band_size,
        span_window,
    )


_PROBE_KEYS = {
    "fp": ["fp"],
    "bands": ["band", "band_sig"],
    "spans": ["sfp"],
}


def compact_sidecars(
    spark: SparkSession,
    sidecar_dir: str,
    files_per_table: int = 4,
) -> dict[str, tuple[int, int]]:
    """Maintenance rewrite of every existing sidecar table:
    ``distinct`` rows (folds the band/span duplicates a crash repair
    may have appended), range-partitioned and sorted by the table's
    PROBE key (fp / (band, band_sig) / sfp) so parquet row-group
    min/max statistics prune the per-batch probe joins, and the
    append-accumulated small files collapse to *files_per_table*
    (size by bytes — ~128 MB row groups — on a real cluster; file
    count is the lever that matters at local scale). Returns
    {table: (rows_before, rows_after)}.

    Swap protocol: write to ``<table>__compact``, rename the live
    table to ``<table>__old``, rename the compact dir in, delete the
    old. A crash between the two renames leaves NO live table — and
    that is SAFE by construction: the fp ledger is then empty, so
    the next batch's :func:`sync_sidecars` re-appends every base
    document's projections (expensive once, never wrong), exactly
    the self-heal path crash repair already exercises. Run
    compaction between batches, not concurrently with one.
    """
    out: dict[str, tuple[int, int]] = {}
    for which, keys in _PROBE_KEYS.items():
        path = os.path.join(sidecar_dir, which)
        if not os.path.isdir(path):
            continue
        df = read_sidecar(spark, sidecar_dir, which)
        before = df.count()
        compact = (
            df.distinct()
            .repartitionByRange(files_per_table, *[F.col(k) for k in keys])
            .sortWithinPartitions(*keys)
        )
        tmp = path + "__compact"
        old = path + "__old"
        compact.write.mode("overwrite").parquet(tmp)
        after = spark.read.schema(_SCHEMAS[which]).parquet(tmp).count()
        import shutil

        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        out[which] = (before, after)
    return out


def sync_sidecars(
    spark: SparkSession,
    base_dir: str,
    sidecar_dir: str,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    span_window: int | None = None,
) -> int:
    """Crash repair: append sidecar rows for base documents missing
    from the ``fp`` completion ledger, so the sidecars catch up to
    the base. Run at the top of every batch; a no-op (zero appended
    rows, an id-column-only base scan) except right after a crash
    between a base append and its sidecar append. Returns the
    number of repaired documents.

    The missing set is ``base ids ∖ fp ids`` — never the reverse:
    fp rows without base rows cannot exist under the
    append-base-first contract, and pruning them here would turn a
    cheap catch-up into a full diff. All three projections are
    re-appended for the missing ids (band/span rows may duplicate
    for the crashed slice — set-semantics probes, see module
    docstring)."""
    _check_meta(sidecar_dir, shingle_n, num_hashes, band_size, span_window)
    if not os.path.isdir(base_dir):
        return 0
    base = spark.read.parquet(base_dir).select("doc_id", "text")
    # a DERIVED table can vanish entirely while the fp ledger
    # survives (a compaction crash between its two renames) — the
    # ledger diff below cannot see that, so snapshot which tables
    # are absent NOW (the ledger append creates their dirs) and
    # rebuild those from the full base afterwards. Full-base work,
    # but only on the compaction-crash path; never on the per-batch
    # fast path. The rebuild may duplicate rows the ledger append
    # just wrote for the same crash window — set-semantics probes,
    # folded by the next compaction.
    derived = ["bands"] + (["spans"] if span_window is not None else [])
    absent = [
        w for w in derived
        if not os.path.isdir(os.path.join(sidecar_dir, w))
        and os.path.isdir(os.path.join(sidecar_dir, "fp"))
    ]
    have = read_sidecar(spark, sidecar_dir, "fp").select("doc_id")
    missing = base.join(have, "doc_id", "left_anti")
    # bounded eager count: the missing set is at most one crashed
    # batch's worth of rows, and the append below needs to know
    # whether there is anything to write at all
    n = missing.count()
    if n:
        append_sidecars(
            spark, missing, sidecar_dir, shingle_n, num_hashes,
            band_size, span_window,
        )
    for which in absent:
        frame = sidecar_frames(
            base, shingle_n, num_hashes, band_size, span_window
        )[which]
        frame.write.mode("append").parquet(
            os.path.join(sidecar_dir, which)
        )
    return n
