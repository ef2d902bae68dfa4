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

Maintenance IO (existence checks, meta guard, lock, compaction
swap) routes through the Hadoop FileSystem API whenever the path
carries a URI scheme (``file://``, ``hdfs://``, ``abfss://``,
``s3a://``...), so the guards operate against the SAME store the
parquet reads/writes use — a remote sidecar dir works instead of
being silently read as empty (r12 ADVICE, implemented in r13; an
unjarred scheme fails loudly at FileSystem resolution). A
``_maintenance.lock`` held for the whole of :func:`compact_sidecars`
makes any probe/append DURING (or after a crashed) compaction raise
instead of reading the swap window's missing table as empty.
:func:`force_unlock_sidecars` (CLI ``sidecars unlock``) clears a
crashed lock; the follow-up ``sync`` self-heals the tables. Rename
atomicity caveat: HDFS/ABFS/local renames are atomic; S3A renames
are copies, so there the lock is the only mutual exclusion and the
swap window is wider — probes still fail loudly while the lock
exists, which is the safety property the protocol needs.

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


# ---------------------------------------------------------------------------
# Filesystem routing: local paths use os/shutil; paths with a URI
# scheme (file://, hdfs://, abfss://, s3a://...) route through the
# Hadoop FileSystem API via the session JVM, so the existence
# checks, meta guard, lock, and compaction swap work against the
# SAME store the parquet reads/writes use (r12 ADVICE: the earlier
# local-only primitives would have silently read remote tables as
# empty, disabling dedup). An unknown/unjarred scheme fails loudly
# at FileSystem resolution. Atomicity notes: the two-rename swap
# and the create-exclusive lock are atomic on HDFS/ABFS and the
# local FS; S3A renames are copies and creates are not exclusive —
# there the lock is best-effort mutual exclusion and the swap
# window is wider, but probes still fail loudly while the lock
# object exists, which is the safety property the protocol needs.
# ---------------------------------------------------------------------------


def _has_scheme(path: str) -> bool:
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*):/", path)
    if not m:
        return False
    # Hadoop Path accepts single-slash URIs ('hdfs:/tmp/sc',
    # 's3a:/bucket/sc') as well as '://' forms, so ANY scheme
    # prefix routes to _HadoopIO — requiring '://' sent legal
    # single-slash URIs to _LocalIO, where isdir() returned False
    # and read_sidecar silently yielded an empty frame (r13 ADVICE:
    # the exact silent-empty dedup-disable this routing exists to
    # prevent). The one carve-out is a Windows drive letter
    # ('C:/...'): single char, while every real Hadoop scheme
    # (file, hdfs, s3a, abfss, wasb, gs, o3fs, viewfs...) has >= 2.
    return len(m.group(1)) >= 2


class _LocalIO:
    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def mkdirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def rename(self, a: str, b: str) -> None:
        os.rename(a, b)

    def rmtree(self, p: str) -> None:
        import shutil

        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)

    def create_excl(self, p: str, text: str) -> None:
        fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as fh:
            fh.write(text)

    def read_text(self, p: str) -> str:
        with open(p) as fh:
            return fh.read()

    def write_text(self, p: str, text: str) -> None:
        with open(p, "w") as fh:
            fh.write(text)

    def list_names(self, p: str) -> list[str]:
        return os.listdir(p)


class _HadoopIO:
    """The same primitives through org.apache.hadoop.fs.FileSystem
    (resolved from the path's scheme + the session Hadoop conf)."""

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._P = jvm.org.apache.hadoop.fs.Path
        try:
            self._fs = self._P(root).getFileSystem(
                spark._jsc.hadoopConfiguration()
            )
        except Exception as e:  # unknown scheme / missing connector jar
            raise ValueError(
                f"cannot resolve a Hadoop FileSystem for {root!r} "
                f"(missing connector jar or bad scheme): {e}"
            ) from e

    def exists(self, p: str) -> bool:
        return self._fs.exists(self._P(p))

    def isdir(self, p: str) -> bool:
        jp = self._P(p)
        return self._fs.exists(jp) and self._fs.getFileStatus(
            jp
        ).isDirectory()

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._P(p))

    def rename(self, a: str, b: str) -> None:
        if not self._fs.rename(self._P(a), self._P(b)):
            raise OSError(f"rename failed: {a} -> {b}")

    def rmtree(self, p: str) -> None:
        jp = self._P(p)
        if self._fs.exists(jp):
            self._fs.delete(jp, True)

    def create_excl(self, p: str, text: str) -> None:
        jp = self._P(p)
        if self._fs.exists(jp):  # fast path; create(False) re-checks
            raise FileExistsError(p)
        try:
            out = self._fs.create(jp, False)
        except Exception as e:
            # map ONLY the already-exists race to FileExistsError —
            # compact_sidecars reports that as "another compaction
            # holds the lock", and steering an operator toward
            # force_unlock on a permission/transient-store error
            # would be wrong (r13 ADVICE). Re-check existence for
            # stores that raise a differently-named wrapper.
            if "FileAlreadyExistsException" in str(e) or self._fs.exists(jp):
                raise FileExistsError(f"{p}: {e}") from e
            raise
        out.write(bytearray(text.encode()))
        out.close()

    def read_text(self, p: str) -> str:
        # byte-at-a-time over py4j — fine for the tiny meta/lock
        # files this module keeps (<200 bytes), nothing else
        stream = self._fs.open(self._P(p))
        try:
            data = []
            while True:
                b = stream.read()
                if b < 0:
                    break
                data.append(b)
            return bytes(data).decode()
        finally:
            stream.close()

    def write_text(self, p: str, text: str) -> None:
        out = self._fs.create(self._P(p), True)
        out.write(bytearray(text.encode()))
        out.close()

    def list_names(self, p: str) -> list[str]:
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._P(p))
        ]


def _io(spark: SparkSession | None, path: str):
    """Pick the IO backend for *path*. URI-scheme paths need a live
    SparkSession for the JVM; local paths never do."""
    if not _has_scheme(path):
        return _LocalIO()
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError(
            f"{path!r} has a URI scheme — a SparkSession is required "
            "to route sidecar maintenance IO through the Hadoop "
            "FileSystem API (pass spark=...)."
        )
    return _HadoopIO(spark, path)


_LOCK_NAME = "_maintenance.lock"


def _lock_path(sidecar_dir: str) -> str:
    return os.path.join(sidecar_dir, _LOCK_NAME)


def _check_unlocked(io, sidecar_dir: str) -> None:
    """Raise while a compaction holds (or died holding) the
    maintenance lock — a batch running inside compaction's two-rename
    swap window would read a missing table as an EMPTY frame and
    silently admit duplicates (r12 ADVICE). After confirming no
    compactor is live, clear with :func:`force_unlock_sidecars` (CLI:
    ``sidecars unlock``) and run ``sync`` — the vanished-table
    rebuild self-heals whatever state the crash left."""
    if io.exists(_lock_path(sidecar_dir)):
        raise RuntimeError(
            f"sidecar maintenance lock present at "
            f"{_lock_path(sidecar_dir)} — a compaction is running or "
            "crashed mid-swap. Probing now could silently read an "
            "empty table. If no compactor is live: force_unlock_"
            "sidecars() / `sidecars unlock`, then `sidecars sync`."
        )


def _sweep_compaction_leftovers(io, sidecar_dir: str) -> None:
    """Clean the ``<table>__compact`` / ``<table>__old`` dirs a
    crashed compaction leaves behind (r13 verdict item 7 — without
    this they double sidecar disk until the NEXT compaction of the
    same table). Crash-window aware: if the crash fell between the
    two swap renames the LIVE table is missing and ``__old`` holds
    the full pre-compaction data — rename it back (restoring the
    exact pre-compaction state, cheaper and strictly safer than the
    full-base rebuild sync would otherwise run) before deleting the
    half-written ``__compact``."""
    for which in _SCHEMAS:
        path = os.path.join(sidecar_dir, which)
        old = path + "__old"
        if io.isdir(old) and not io.isdir(path):
            io.rename(old, path)
        io.rmtree(old)
        io.rmtree(path + "__compact")


def force_unlock_sidecars(
    sidecar_dir: str, spark: SparkSession | None = None
) -> bool:
    """Remove a stale maintenance lock (operator action after a
    compaction crash) and sweep the crash's ``__compact``/``__old``
    leftovers — restoring a mid-swap table from ``__old`` when the
    live dir vanished. Returns whether a lock existed. *spark* is
    only needed for URI-scheme dirs (Hadoop FS routing)."""
    io = _io(spark, sidecar_dir)
    had_lock = io.exists(_lock_path(sidecar_dir))
    if had_lock:
        io.rmtree(_lock_path(sidecar_dir))
    if io.isdir(sidecar_dir):
        _sweep_compaction_leftovers(io, sidecar_dir)
    return had_lock


def _meta_path(sidecar_dir: str) -> str:
    return os.path.join(sidecar_dir, "_meta.json")


def _check_meta(
    io,
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
    if io.exists(path):
        existing = json.loads(io.read_text(path))
        if existing != meta:
            raise ValueError(
                f"sidecar params mismatch at {sidecar_dir}: "
                f"table built with {existing}, caller passed {meta}"
            )
        return
    io.mkdirs(sidecar_dir)
    io.write_text(path, json.dumps(meta))


def sidecar_frames(
    docs: DataFrame,
    shingle_n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    span_window: int | None = None,
) -> dict[str, DataFrame]:
    """The three sidecar projections of a (doc_id, ..., text) frame
    — lazy; ``spans`` present only when *span_window* is set. The
    span projection is :func:`..operators.dedup.span_fingerprints` —
    the SAME definition the batch/streaming span rules probe with,
    so index and rule cannot silently diverge."""
    from ..operators.dedup import (
        band_assignments,
        span_fingerprints,
        word_shingles,
    )

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
        out["spans"] = span_fingerprints(
            docs, "doc_id", "text", span_window
        ).select(F.col("doc_id").cast("long").alias("doc_id"), "sfp")
    return out


def read_sidecar(
    spark: SparkSession, sidecar_dir: str, which: str
) -> DataFrame:
    """Read one sidecar table; an empty correctly-typed frame when
    the table doesn't exist yet (first batch against an empty
    base). Raises while the maintenance lock is held — a state where
    "empty frame" would silently disable dedup."""
    io = _io(spark, sidecar_dir)
    _check_unlocked(io, sidecar_dir)
    return _read(spark, sidecar_dir, which, io)


def _read(
    spark: SparkSession, sidecar_dir: str, which: str, io=None
) -> DataFrame:
    """read_sidecar without the lock guard — for compact_sidecars
    itself, which reads while HOLDING the lock."""
    io = io or _io(spark, sidecar_dir)
    schema = _SCHEMAS[which]
    path = os.path.join(sidecar_dir, which)
    if not io.isdir(path):
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
    io = _io(spark, sidecar_dir)
    _check_unlocked(io, sidecar_dir)
    _check_meta(
        io, sidecar_dir, shingle_n, num_hashes, band_size, span_window
    )
    frames = sidecar_frames(
        admitted, shingle_n, num_hashes, band_size, span_window
    )
    # the non-ledger tables are independent projections of the same
    # (checkpointed) delta — submit them from a small thread pool so
    # one write's task tail back-fills the other's executors
    # (optimization guide §2.6). Their relative order is
    # unconstrained; only ``fp`` must be LAST (it is the completion
    # ledger sync_sidecars keys on), so it stays a sequential write
    # after the pool joins.
    def _append(which: str) -> None:
        frames[which].write.mode("append").parquet(
            os.path.join(sidecar_dir, which)
        )

    rest = sorted(w for w in frames if w != "fp")
    if len(rest) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(rest)) as pool:
            list(pool.map(_append, rest))
    else:
        for which in rest:
            _append(which)
    _append("fp")


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
    pays; every later batch appends deltas only). Refuses when the
    fp ledger already exists — re-building onto a populated sidecar
    dir would append a SECOND full copy of every row (probes stay
    correct via set semantics, but size and probe cost double
    silently until a compaction folds it; r12 ADVICE): use ``sync``
    to catch up or ``compact`` to fold."""
    io = _io(spark, sidecar_dir)
    if io.isdir(os.path.join(sidecar_dir, "fp")):
        raise ValueError(
            f"sidecars already exist at {sidecar_dir} — build would "
            "append a duplicate copy of every row. Use sync_sidecars "
            "to repair/catch up, or compact_sidecars to fold."
        )
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
    PROBE key (fp / (band, band_sig) / sfp), and the
    append-accumulated small files collapse to *files_per_table*
    (size by bytes — ~128 MB row groups — on a real cluster; file
    count is the lever that matters at local scale). Returns
    {table: (rows_before, rows_after)}.

    What the rewrite buys (measured, scripts/sidecar_compact_bench.py
    at a 50k-doc base — SCALING.md r13): bounding file-count growth
    from O(batches) to O(1) — the per-batch probe re-lists and
    re-opens every file, so an append-only ingest degrades without a
    fold (probe 7.9→6.8 s already at 16-batch fragmentation, and the
    listing term keeps growing with batch count) — plus folding
    crash-repair duplicates out of the probe build sides. The
    probe-key sort buys run-length/dictionary compression and scan
    locality; it does NOT row-group-prune the shuffled probe joins
    themselves (min/max pruning applies to pushed filters, not
    shuffle-join keys), so it is a layout nicety, not the headline.

    Swap protocol: write to ``<table>__compact``, rename the live
    table to ``<table>__old``, rename the compact dir in, delete the
    old. A crash between the two renames leaves NO live table — the
    MAINTENANCE LOCK (acquired exclusively for the whole compaction,
    released only on success) keeps that window safe: every probe
    and append raises while the lock is present instead of silently
    reading a missing table as empty (r12 ADVICE), and after an
    operator clears a crashed lock (:func:`force_unlock_sidecars`),
    the next :func:`sync_sidecars` re-appends every base document's
    projections from the surviving fp ledger — or, if the ledger
    itself vanished, from the full base (expensive once, never
    wrong). Raises RuntimeError if another compaction holds the
    lock.
    """
    io = _io(spark, sidecar_dir)
    io.mkdirs(sidecar_dir)
    try:
        io.create_excl(_lock_path(sidecar_dir), f"pid={os.getpid()}\n")
    except FileExistsError:
        raise RuntimeError(
            f"another compaction holds {_lock_path(sidecar_dir)} "
            "(or crashed holding it) — force_unlock_sidecars() / "
            "`sidecars unlock` after confirming no compactor is live."
        )
    from pyspark.sql import Observation

    out: dict[str, tuple[int, int]] = {}
    for which, keys in _PROBE_KEYS.items():
        path = os.path.join(sidecar_dir, which)
        if not io.isdir(path):
            continue
        df = _read(spark, sidecar_dir, which, io)
        # the (before, after) stats ride the WRITE job as
        # Observations — the previous explicit df.count() +
        # written-files re-read cost two extra full-table jobs per
        # table (6 per compaction; measured in the r14 persist
        # audit, see PLANS.md)
        obs_in = Observation()
        obs_out = Observation()
        compact = (
            df.observe(obs_in, F.count(F.lit(1)).alias("n"))
            .distinct()
            .repartitionByRange(files_per_table, *[F.col(k) for k in keys])
            .sortWithinPartitions(*keys)
            .observe(obs_out, F.count(F.lit(1)).alias("n"))
        )
        tmp = path + "__compact"
        old = path + "__old"
        compact.write.mode("overwrite").parquet(tmp)
        before, after = int(obs_in.get["n"]), int(obs_out.get["n"])
        io.rmtree(old)
        io.rename(path, old)
        io.rename(tmp, path)
        io.rmtree(old)
        out[which] = (before, after)
    # released ONLY on success: an exception mid-swap leaves the lock
    # so batches fail loudly instead of probing a missing table
    io.rmtree(_lock_path(sidecar_dir))
    return out


def sidecar_file_counts(
    sidecar_dir: str, spark: SparkSession | None = None
) -> dict[str, int]:
    """Data-file count per existing sidecar table (parquet parts,
    not _SUCCESS/metadata) — the compaction-trigger metric. Append-
    only maintenance grows file count monotonically with batches, so
    it is a cheap, deterministic proxy for accumulated fragmentation
    (row-count would need a Spark job; bytes conflate fragmentation
    with corpus growth). *spark* is only needed for URI-scheme
    dirs."""
    io = _io(spark, sidecar_dir)
    out: dict[str, int] = {}
    for which in _SCHEMAS:
        path = os.path.join(sidecar_dir, which)
        if not io.isdir(path):
            continue
        out[which] = sum(
            1
            for f in io.list_names(path)
            if f.endswith(".parquet") and not f.startswith("_")
        )
    return out


def maybe_compact_sidecars(
    spark: SparkSession,
    sidecar_dir: str,
    max_files_per_table: int = 64,
    files_per_table: int = 4,
) -> dict[str, tuple[int, int]] | None:
    """Size-triggered :func:`compact_sidecars` — compaction as
    POLICY inside the ingest loop, not a manually-run CLI (r12
    verdict item 2): compact when ANY table's data-file count
    exceeds *max_files_per_table*, else no-op (a listdir, no Spark
    job). Callers invoke it BETWEEN batches (the incremental path
    runs it at batch top, before any probe), which is exactly the
    window the compaction lock protocol requires. Returns the
    compaction stats when it fired, None when it didn't."""
    counts = sidecar_file_counts(sidecar_dir, spark)
    if not counts or max(counts.values()) <= max_files_per_table:
        return None
    return compact_sidecars(
        spark, sidecar_dir, files_per_table=files_per_table
    )


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
    io = _io(spark, sidecar_dir)
    base_io = _io(spark, base_dir)
    _check_unlocked(io, sidecar_dir)
    _check_meta(
        io, sidecar_dir, shingle_n, num_hashes, band_size, span_window
    )
    if not base_io.isdir(base_dir):
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
        if not io.isdir(os.path.join(sidecar_dir, w))
        and io.isdir(os.path.join(sidecar_dir, "fp"))
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
